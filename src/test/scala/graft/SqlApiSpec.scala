package graft

import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

/** The engine's SQL surface: the same plans must be reachable through
  * `spark.sql` over registered views as through the DataFrame
  * builders (both go through Catalyst; this pins the SQL entry path
  * the reference's REST handlers would bind parameters into). */
class SqlApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("spark.sql over registered views matches the DataFrame builders") {
    Tables.registerAll(spark, TestSpark.sf)
    val cases = Seq(
      "q1_scan" -> "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
      "q3_filter" -> ("SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_custkey = 7 AND o_orderstatus = 'O' ORDER BY o_orderkey"),
      "q16_join3" -> ("SELECT r_name, n_name, COUNT(*) AS custs, " +
        "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name, n_name ORDER BY r_name, n_name"),
      "q13_topk" -> ("SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"))
    cases.foreach { case (name, sql) =>
      val viaSql = spark.sql(sql).collect().toSeq
      val viaDf = SparkEntry.queries(name)(spark, TestSpark.sf).collect().toSeq
      assert(viaSql === viaDf, s"$name: SQL path diverges from DataFrame path")
    }
  }
}
