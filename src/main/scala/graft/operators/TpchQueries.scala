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
  * Third tranche (r13, x101–x107): correlated-EXISTS priority check
  * (Q4), the single-scan forecast aggregate (Q6), the two-way
  * conditional count (Q12), the left-outer count DISTRIBUTION (Q13),
  * the correlated per-group-average filter (Q17), the HAVING-semijoin
  * large-order report (Q18) and the anti-join + population-average
  * screen (Q22). A late r13 pair closes the sweep of everything the
  * fixture can express: the argmax-over-an-aggregated-view report
  * (Q15, x108) and the exists/not-exists waiting-supplier report
  * (Q21, x109).
  * Columns the fixture lacks substitute shape-preserving stand-ins,
  * noted per query (no l_commitdate/receiptdate, l_shipmode,
  * o_comment, c_phone, p_container; no partsupp table, which keeps
  * Q2/Q11/Q16/Q20 permanently out of reach — SURVEY §2.1). Q22's
  * average-balance screen compares `acctbal · n > Σbal` in DECIMAL —
  * exact on both engines — instead of dividing first and gambling a
  * boundary row on a last-ulp AVG difference.
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

  import graft.functions.expressions.DecimalFns.{dcast, dtimes}

  // dcast/dtimes == the built-in cast/`*` value-for-value and
  // type-for-type (DecimalExpressions scaladoc has the equivalence
  // argument); they skip the per-row Double.toString + BigDecimal
  // churn that dominated every decimal aggregate over the
  // double-typed fact columns.
  private val rev =
    graft.functions.expressions.DecimalSumFns.dsum(
      dtimes(dcast(col("l_extendedprice")),
        lit(1).cast("decimal(1,0)") - dcast(col("l_discount"))))

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
        val one = dtimes(dcast(col("l_extendedprice")),
          lit(1).cast("decimal(1,0)") - dcast(col("l_discount")))
        table(s, d, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit("1997-09-01")) &&
            col("l_shipdate") < to_timestamp(lit("1997-10-01")))
          .join(broadcast(table(s, d, "part")
            .select(col("p_partkey"), col("p_type"))),
            col("l_partkey") === col("p_partkey"))
          .agg(round(lit(100.0) *
            graft.functions.expressions.DecimalSumFns.dsum(
              when(col("p_type") === "PROMO", one)
                .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
            graft.functions.expressions.DecimalSumFns.dsum(one)
              .cast("double"), 6).as("promo_share"))
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
    },

    // TPC-H Q4 shape (order priority checking): orders in one quarter
    // with at least one LATE line, counted by priority. The fixture
    // carries no commit/receipt dates, so "late" is shipped > 60 days
    // after the order date — same correlated-EXISTS semi-join, the
    // cross-table date predicate riding the join condition. Plan: the
    // quarter filter is pushed to the orders scan; the semi-join
    // shuffles on the order key once.
    Query("x101_tpch4",
      "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' " +
        "AND o_orderdate < TIMESTAMP '1996-04-01' " +
        "AND EXISTS (SELECT 1 FROM lineitem " +
        "WHERE l_orderkey = o_orderkey " +
        "AND l_shipdate > o_orderdate + INTERVAL 60 DAY) " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority") {
      (s, d) =>
        table(s, d, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1996-04-01")))
          .join(table(s, d, "lineitem").select("l_orderkey", "l_shipdate"),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") >
                col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
    },

    // TPC-H Q6 (forecasting revenue change): the one-scan aggregate —
    // every predicate on the fact scan, zero joins, one partial-agg
    // exchange. Revenue sums in DECIMAL (price 2 dp × discount 2 dp)
    // so the hash is accumulation-order-proof.
    Query("x102_tpch6",
      "SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE), 2) AS revenue, " +
        "COUNT(*) AS n FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24") {
      (s, d) =>
        table(s, d, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
            col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
          .agg(round(graft.functions.expressions.DecimalSumFns.dsum(
            dtimes(dcast(col("l_extendedprice")),
              dcast(col("l_discount"), 3, 2))).cast("double"), 2)
            .as("revenue"),
            count(lit(1)).as("n"))
    },

    // TPC-H Q12 shape (shipping modes / order priority): per "mode",
    // how many lines belong to critical vs non-critical orders. The
    // fixture has no l_shipmode; l_returnflag stands in as the
    // 3-valued line dimension — the shape (fact⋈fact join + two
    // conditional counts per group) is unchanged. orders joins on the
    // order key (no broadcast: both sides are fact-scale), the year
    // filter sits on the lineitem scan.
    Query("x103_tpch12",
      "SELECT l_returnflag, " +
        "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
        "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' " +
        "AND l_shipdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY l_returnflag ORDER BY l_returnflag") {
      (s, d) => {
        val crit = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        table(s, d, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
            col("l_shipdate") < to_timestamp(lit("1998-01-01")))
          .select("l_orderkey", "l_returnflag")
          .join(table(s, d, "orders")
            .select("o_orderkey", "o_orderpriority"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag")
          .agg(sum(when(crit, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!crit, 1L).otherwise(0L)).as("low_line_count"))
          .orderBy("l_returnflag")
      }
    },

    // TPC-H Q13 (customer order distribution): LEFT OUTER join so
    // zero-order customers survive into the c_count=0 bucket (the
    // fixture's customers all have orders, but the URGENT-exclusion
    // join condition — standing in for Q13's comment NOT LIKE —
    // re-creates the zero bucket), then the distribution-of-counts
    // second aggregate. Two shuffles: custkey, then count.
    Query("x104_tpch13",
      "SELECT c_count, COUNT(*) AS custdist FROM (" +
        "SELECT c_custkey, COUNT(o_orderkey) AS c_count " +
        "FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey " +
        "AND o_orderpriority <> '1-URGENT' GROUP BY c_custkey) " +
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC") {
      (s, d) =>
        table(s, d, "customer").select("c_custkey")
          .join(table(s, d, "orders")
            .select("o_custkey", "o_orderkey", "o_orderpriority"),
            col("c_custkey") === col("o_custkey") &&
              col("o_orderpriority") =!= "1-URGENT",
            "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q17 shape (small-quantity-order revenue): lines of one
    // brand's small parts whose quantity is under 20% of that PART's
    // average — the correlated per-group-average filter. The
    // per-part average is a window over the part-pruned join frame
    // (ONE pass — no self-join, the x72 lesson), exact because
    // quantities are integral: avg = intSum/count is bit-identical
    // across engines, and ×0.2 is one deterministic double op. part
    // is pruned THEN broadcast; p_container doesn't exist, p_size
    // stands in.
    Query("x105_tpch17",
      "WITH li AS (SELECT l_partkey, l_quantity, l_extendedprice " +
        "FROM lineitem JOIN part ON p_partkey = l_partkey " +
        "WHERE p_brand = 'Brand#4' AND p_size < 25), " +
        "a AS (SELECT *, AVG(l_quantity) OVER (PARTITION BY l_partkey) " +
        "AS aq FROM li) " +
        "SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) " +
        "AS DOUBLE) / 7.0, 2) AS avg_yearly, COUNT(*) AS n FROM a " +
        "WHERE l_quantity < 0.2 * aq") {
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val li = table(s, d, "lineitem")
          .select("l_partkey", "l_quantity", "l_extendedprice")
          .join(broadcast(table(s, d, "part")
            .filter(col("p_brand") === "Brand#4" && col("p_size") < 25)
            .select("p_partkey")),
            col("l_partkey") === col("p_partkey"))
        li.withColumn("aq",
            avg(col("l_quantity")).over(Window.partitionBy("l_partkey")))
          .filter(col("l_quantity") < lit(0.2) * col("aq"))
          .agg(round(graft.functions.expressions.DecimalSumFns.dsum(
            dcast(col("l_extendedprice")))
            .cast("double") / 7.0, 2).as("avg_yearly"),
            count(lit(1)).as("n"))
      }
    },

    // TPC-H Q18 (large volume customers): orders whose line quantities
    // sum past 250, reported with customer context, top 20. The
    // HAVING aggregate runs FIRST (map-side combined on the order
    // key) and semi-prunes the detail join; quantities are integral →
    // summed as longs, hash-exact. Tie-proof: o_orderkey is unique in
    // the final sort.
    Query("x106_tpch18",
      "WITH big AS (SELECT l_orderkey, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty " +
        "FROM lineitem GROUP BY l_orderkey " +
        "HAVING SUM(CAST(l_quantity AS BIGINT)) > 250) " +
        "SELECT c_name, c_custkey, o_orderkey, o_orderdate, " +
        "o_totalprice, total_qty FROM big " +
        "JOIN orders ON o_orderkey = l_orderkey " +
        "JOIN customer ON c_custkey = o_custkey " +
        "ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 20") {
      (s, d) =>
        table(s, d, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
          .filter(col("total_qty") > 250)
          .join(table(s, d, "orders"),
            col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(table(s, d, "customer")
            .select("c_custkey", "c_name")),
            col("c_custkey") === col("o_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"), col("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderdate"),
            col("o_orderkey"))
          .limit(20)
    },

    // TPC-H Q22 shape (global sales opportunity): wealthy-but-DORMANT
    // customers per nation — balance above the screened population's
    // average AND no recent orders. Adaptations: c_phone prefixes →
    // a nation-key set; every fixture customer has SOME order, so
    // "never ordered" → "no order since 2000-01-01" (the anti-join
    // carries the date predicate). The average screen never divides:
    // `bal · n > Σbal` in DECIMAL is exact on both engines, and the
    // 1-row (Σ, n) rides in-plan as a broadcast (plan-pure, x94's
    // pattern — hence this query's intended BroadcastNestedLoopJoin).
    Query("x107_tpch22",
      "WITH pop AS (SELECT c_custkey, c_nationkey, " +
        "CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer " +
        "WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)), " +
        "st AS (SELECT CAST(SUM(bal) AS DECIMAL(28,2)) AS s, " +
        "COUNT(*) AS n FROM pop WHERE bal > 0), " +
        "dormant AS (SELECT pop.* FROM pop WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = pop.c_custkey " +
        "AND o_orderdate >= TIMESTAMP '2000-01-01')) " +
        "SELECT c_nationkey, COUNT(*) AS numcust, " +
        "round(CAST(SUM(bal) AS DOUBLE), 2) AS totacctbal " +
        "FROM dormant, st WHERE bal * n > s " +
        "GROUP BY c_nationkey ORDER BY c_nationkey") {
      (s, d) => {
        val pop = table(s, d, "customer")
          .filter(col("c_nationkey").isin(1, 2, 3, 4, 5, 6, 7))
          .select(col("c_custkey"), col("c_nationkey"),
            dcast(col("c_acctbal")).as("bal"))
        val st = broadcast(pop.filter(col("bal") > 0)
          .agg(graft.functions.expressions.DecimalSumFns.dsum(col("bal"))
            .cast("decimal(28,2)").as("s"),
            count(lit(1)).as("n")))
        pop
          .join(table(s, d, "orders")
            .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01")))
            .select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .crossJoin(st)
          .filter(col("bal") * col("n") > col("s"))
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("numcust"),
            round(graft.functions.expressions.DecimalSumFns.dsum(col("bal"))
              .cast("double"), 2).as("totacctbal"))
          .orderBy("c_nationkey")
      }
    },

    // TPC-H Q15 (top supplier): revenue per supplier over one quarter,
    // report the supplier(s) hitting the maximum — the
    // argmax-over-an-aggregated-view shape (the spec's CREATE VIEW +
    // scalar-subquery equality). The max rides as a 1-row broadcast
    // into a filter over the SAME aggregate (x94's in-plan scalar
    // pattern; Catalyst converts the cross+equality into an equi
    // BroadcastHashJoin on the decimal sum), and ReuseExchange
    // dedupes the shared scan+partial-agg subtree, so lineitem is
    // read once. The suppkey null filter sits on the BASE scan (and
    // in the oracle's view) — without it the supplier equi-join
    // pushes isnotnull into only the probe-side subtree and the
    // exchanges stop being identical, silently doubling the fact
    // read. The equality compares the DECIMAL sum (each engine
    // against its own max — exact, order-proof); the reported revenue
    // casts to double only at the end. A global window-max over the
    // view would need every per-supplier row in one task; the 1-row
    // broadcast is the any-cardinality shape.
    Query("x108_tpch15",
      "WITH rev AS (SELECT l_suppkey, " +
        "SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS tr FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1997-10-01' " +
        "AND l_shipdate < TIMESTAMP '1998-01-01' " +
        "AND l_suppkey IS NOT NULL GROUP BY l_suppkey) " +
        "SELECT s_suppkey, s_name, " +
        "round(CAST(tr AS DOUBLE), 2) AS total_rev " +
        "FROM rev JOIN supplier ON s_suppkey = l_suppkey " +
        "WHERE tr = (SELECT MAX(tr) FROM rev) ORDER BY s_suppkey") {
      (s, d) => {
        val revBySupp = table(s, d, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit("1997-10-01")) &&
            col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
            col("l_suppkey").isNotNull)
          .groupBy("l_suppkey")
          .agg(rev.as("tr"))
        val mx = broadcast(revBySupp.agg(max(col("tr")).as("mx")))
        revBySupp.crossJoin(mx)
          .filter(col("tr") === col("mx"))
          .join(broadcast(table(s, d, "supplier")
            .select("s_suppkey", "s_name")),
            col("s_suppkey") === col("l_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            round(col("tr").cast("double"), 2).as("total_rev"))
          .orderBy("s_suppkey")
      }
    },

    // TPC-H Q21 shape (suppliers who kept orders waiting): suppliers
    // whose line was the ONLY late one in a finished multi-supplier
    // order. The fixture has no commit/receipt dates, so "late" is
    // x101's stand-in (shipped > 60 days after the order date); the
    // shape — EXISTS another supplier in the order, NOT EXISTS another
    // LATE supplier — is intact but computed in ONE pass: instead of
    // the spec's three lineitem scans (self-exists + self-not-exists),
    // per-(order,supplier) lateness is a single aggregate and the two
    // correlated subqueries collapse into order-partitioned window
    // counts over it (supplier count ≥ 2, late-supplier count = 1 —
    // count arithmetic, exact). Scale: the orders join shuffles both
    // facts on the order key ONCE; the (order,supplier) group-by and
    // both windows are satisfied by that same partitioning (subset
    // clustering — no further exchange until the O(suppliers) final
    // count). Nation pruning must wait until after the windows (the
    // other-supplier counts span ALL nations) and lands on the
    // broadcast dim join.
    Query("x109_tpch21",
      "WITH l AS (SELECT l_orderkey, l_suppkey, " +
        "MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY " +
        "THEN 1 ELSE 0 END) AS late " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE o_orderstatus = 'F' GROUP BY l_orderkey, l_suppkey), " +
        "w AS (SELECT l_suppkey, late, " +
        "COUNT(*) OVER (PARTITION BY l_orderkey) AS ns, " +
        "SUM(late) OVER (PARTITION BY l_orderkey) AS nl FROM l) " +
        "SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait " +
        "FROM w JOIN supplier ON s_suppkey = l_suppkey " +
        "WHERE late = 1 AND ns >= 2 AND nl = 1 " +
        "AND s_nationkey IN (3, 19) " +
        "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20") {
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val late = when(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1).otherwise(0)
        val byOrderSupp = table(s, d, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(table(s, d, "orders")
            .filter(col("o_orderstatus") === "F")
            .select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_orderkey", "l_suppkey")
          .agg(max(late).as("late"))
        val w = Window.partitionBy("l_orderkey")
        byOrderSupp
          .withColumn("ns", count(lit(1)).over(w))
          .withColumn("nl", sum(col("late")).over(w))
          .filter(col("late") === 1 && col("ns") >= 2 && col("nl") === 1)
          .join(broadcast(table(s, d, "supplier")
            .filter(col("s_nationkey").isin(3, 19))
            .select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      }
    }
  )
}
