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

  test("custom expressions are SQL functions via GraftExtensions") {
    import graft.functions.expressions.TextExpressions
    import graft.functions.VectorFns
    import org.apache.spark.sql.functions._
    Tables.registerAll(spark, TestSpark.sf)
    // vector ops over embeddings: SQL text == Column wrappers
    val sqlVec = spark.sql(
      "SELECT vec_id, vec_dot(embedding, embedding) AS d, " +
        "vec_normsq(embedding) AS n, vec_l2sq(embedding, embedding) AS z " +
        "FROM embeddings ORDER BY vec_id LIMIT 5").collect().toSeq
    val dfVec = Tables.table(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id"),
        VectorFns.dot(col("embedding"), col("embedding")).as("d"),
        VectorFns.normsq(col("embedding")).as("n"),
        VectorFns.l2sq(col("embedding"), col("embedding")).as("z"))
      .orderBy("vec_id").limit(5).collect().toSeq
    assert(sqlVec === dfVec)
    // text ops over documents
    val sqlTxt = spark.sql(
      "SELECT doc_id, simhash16(split(text, ' ')) AS sh, " +
        "rolling_fp(split(text, ' ')) AS fp, " +
        "size(char_ngrams(text)) AS ng " +
        "FROM documents WHERE text IS NOT NULL ORDER BY doc_id LIMIT 5")
      .collect().toSeq
    val dfTxt = Tables.table(spark, TestSpark.sf, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        TextExpressions.simhash16(split(col("text"), " ")).as("sh"),
        TextExpressions.rolling_fp(split(col("text"), " ")).as("fp"),
        size(TextExpressions.char_ngrams(col("text"))).as("ng"))
      .orderBy("doc_id").limit(5).collect().toSeq
    assert(sqlTxt === dfTxt)
    // the r11 expressions ride the same registration
    val r11 = spark.sql(
      "SELECT edit_at_most('kitten', 'sitting', 3) AS d3, " +
        "edit_at_most('kitten', 'sitting', 2) AS d2, " +
        "sorted_intersect_count(array(1L, 3L, 5L), array(3L, 5L, 9L)) AS ic, " +
        "size(winnow_fps(array('a','b','c','d','e','f','g'))) AS wn")
      .collect().head
    assert(r11.getInt(0) === 3 && r11.getInt(1) === -1 &&
      r11.getLong(2) === 2L && r11.getInt(3) >= 1)
    // misuse through SQL is still an analysis error
    val e = intercept[Exception](spark.sql(
      "SELECT vec_dot(1, 2)").collect())
    assert(e.getMessage.contains("array<float>") ||
      e.isInstanceOf[org.apache.spark.sql.AnalysisException])
  }
}
