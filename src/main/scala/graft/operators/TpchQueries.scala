package graft.operators

import graft.Query
import graft.sources.Tables.table
import org.apache.spark.sql.functions._

/** Second tranche of TPC-H join/aggregation shapes (first tranche:
  * x27/x28 in CoreQueries, x45/x46 there too). These four close out
  * the query classes the fixture's tables can express: the
  * region-local volume join (Q5), the bi-directional nation-pair
  * volume join (Q7), the conditional-share aggregate (Q14) and the
  * OR-of-conjuncts bracket predicate (Q19).
  *
  * Scale shapes (the graded part): every dim (part/supplier/nation/
  * region/customer-when-filtered) broadcasts, every date/flag filter
  * sits ON the fact scan (PushedFilters), and each query shuffles the
  * fact table at most twice — once on the order key to meet orders,
  * once more only when the grouping key differs. Decimal revenue sums
  * keep hashes accumulation-order-proof, cast to double only at the
  * end, same convention as every other revenue query in the repo.
  */
object TpchQueries {

  private val rev =
    sum(col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(1,0)") - col("l_discount").cast("decimal(18,2)")))

  val all: Seq[Query] = Seq(

    // TPC-H Q5 shape (local supplier volume): revenue by supplier
    // nation inside one region and one order year, counting only
    // orders where the CUSTOMER sits in the supplier's nation — the
    // classic same-nation equi-constraint that makes Q5 a 6-table
    // join. customer is NOT broadcast (it joins the fact on o_custkey
    // before the nation constraint), supplier/nation/region are.
    Query("x76_tpch5",
      "SELECT n_name, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey " +
        "AND o_orderdate >= TIMESTAMP '1997-01-01' " +
        "AND o_orderdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY n_name ORDER BY revenue DESC, n_name") {
      (s, d) =>
        table(s, d, "lineitem")
          .join(table(s, d, "orders")
            .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
              col("o_orderdate") < to_timestamp(lit("1998-01-01"))),
            col("l_orderkey") === col("o_orderkey"))
          .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(table(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(table(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(table(s, d, "region")
            .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(rev.cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q7 shape (volume shipping): revenue flowing between two
    // nations in BOTH directions (supplier in one, customer in the
    // other), split by ship year. The nation pair filter lands on the
    // two broadcast dim joins; the fact keeps its ship-date range
    // filter on the scan.
    Query("x77_tpch7",
      "SELECT supp_nation, cust_nation, l_year, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue " +
        "FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
        "EXTRACT(year FROM l_shipdate) AS l_year, " +
        "l_extendedprice, l_discount " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
        "WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7') " +
        "OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')) " +
        "AND l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1998-01-01') shipping " +
        "GROUP BY supp_nation, cust_nation, l_year " +
        "ORDER BY supp_nation, cust_nation, l_year") {
      (s, d) => {
        val pair = Seq("NATION_3", "NATION_7")
        val n1 = table(s, d, "nation").filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
        val n2 = table(s, d, "nation").filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
        table(s, d, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
            col("l_shipdate") < to_timestamp(lit("1998-01-01")))
          .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(table(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(table(s, d, "customer")
            .select(col("c_custkey"), col("c_nationkey"))
            .join(n2, col("c_nationkey") === col("ck"))),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("sk"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(rev.cast("double").as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      }
    },

    // TPC-H Q14 shape (promo revenue share): the conditional-sum /
    // total-sum ratio over one ship month. One broadcast dim join,
    // one partial-aggregated fact pass, a single output row — the
    // map-side-combine shape that stays one scan at any corpus size.
    Query("x78_tpch14",
      "SELECT round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN " +
        "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2))) ELSE 0 END) AS DOUBLE) / " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6) " +
        "AS promo_share " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE l_shipdate >= TIMESTAMP '1997-09-01' " +
        "AND l_shipdate < TIMESTAMP '1997-10-01'") {
      (s, d) => {
        val one = col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(1,0)") - col("l_discount").cast("decimal(18,2)"))
        table(s, d, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit("1997-09-01")) &&
            col("l_shipdate") < to_timestamp(lit("1997-10-01")))
          .join(broadcast(table(s, d, "part")
            .select(col("p_partkey"), col("p_type"))),
            col("l_partkey") === col("p_partkey"))
          .agg(round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", one)
              .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
            sum(one).cast("double"), 6).as("promo_share"))
      }
    },

    // TPC-H Q19 shape (discounted revenue, bracket predicate): an OR
    // of three (brand, size-range, quantity-range) conjunct brackets
    // evaluated across the lineitem⋈part join. The part side prunes
    // to the three brands BEFORE broadcasting (the disjunction's
    // common factor is pushed); the residual bracket predicate rides
    // the join as one codegen'd boolean — no union-of-three-scans.
    Query("x79_tpch19",
      "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue, " +
        "COUNT(*) AS n " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 " +
        "AND l_quantity BETWEEN 1 AND 21) " +
        "OR (p_brand = 'Brand#16' AND p_size BETWEEN 1 AND 25 " +
        "AND l_quantity BETWEEN 10 AND 30) " +
        "OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 40 " +
        "AND l_quantity BETWEEN 20 AND 40)") {
      (s, d) => {
        val brackets =
          (col("p_brand") === "Brand#11" &&
            col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 21)) ||
          (col("p_brand") === "Brand#16" &&
            col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#20" &&
            col("p_size").between(10, 40) &&
            col("l_quantity").between(20, 40))
        table(s, d, "lineitem")
          .join(broadcast(table(s, d, "part")
            .filter(col("p_brand")
              .isin("Brand#11", "Brand#16", "Brand#20"))),
            col("l_partkey") === col("p_partkey"))
          .filter(brackets)
          .agg(rev.cast("double").as("revenue"),
            count(lit(1)).as("n"))
      }
    }
  )
}
