package graft

import graft.operators.ShardExport
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The training-shard export writer: the stored windows must be
  * exactly what the x100 manifest promises (every span sliced from
  * its document at the right offsets, concatenated in doc_id order),
  * conserve every corpus token, and land as per-shard (lang-
  * partitioned) files. */
class ShardExportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val W = graft.operators.PackingQueries.WindowW

  private lazy val store = ShardExport.forDir(spark, TestSpark.sf)

  private lazy val docs: Map[Long, Array[String]] =
    spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" "))
      .toMap

  test("shard contents equal the manifest's spans, concatenated in doc_id order") {
    // independent window rebuild: drive it from the DECLARED x100
    // manifest (the hash-pinned contract), not from ShardExport's own
    // internals
    val manifest = SparkEntry.queries("x100_seq_packing")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val want: Map[(String, Long), Seq[String]] = manifest
      .groupBy { case (lang, wid, _, _, _) => (lang, wid) }
      .map { case (k, rows) =>
        k -> rows.sortBy(_._3).toSeq.flatMap {
          case (_, _, docId, st, en) =>
            docs(docId).slice(st.toInt, en.toInt).toSeq
        }
      }
    val got = store.load("shards").collect()
      .map(r => ((r.getString(r.fieldIndex("lang")),
        r.getLong(r.fieldIndex("window_id"))),
        (r.getSeq[String](r.fieldIndex("tokens")),
          r.getLong(r.fieldIndex("n_tok")),
          r.getString(r.fieldIndex("w_md5")))))
      .toMap
    assert(got.keySet === want.keySet, "window universe")
    want.foreach { case (k, toks) =>
      val (gToks, gN, gMd5) = got(k)
      assert(gToks === toks, s"window $k tokens")
      assert(gN === toks.size.toLong, s"window $k n_tok")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(toks.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(gMd5 === md5, s"window $k md5 content key")
    }
  }

  test("token conservation: every corpus token lands in exactly one window") {
    val perLangCorpus = spark.read
      .parquet(s"${TestSpark.sf}/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n"))
      .filter(col("n") > 0)
      .groupBy("lang").agg(sum("n").as("toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perLangShards = store.load("shards")
      .groupBy("lang").agg(sum("n_tok").as("toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLangShards === perLangCorpus)
    // and padding-free packing: every window is exactly W tokens
    // except each shard's final one
    val lens = store.load("shards")
      .select("lang", "window_id", "n_tok").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val lastWid = lens.groupBy(_._1).map { case (l, ws) =>
      l -> ws.map(_._2).max
    }
    lens.foreach { case (lang, wid, n) =>
      if (wid < lastWid(lang)) assert(n === W.toLong, s"window ($lang,$wid)")
      else assert(n >= 1 && n <= W, s"final window ($lang,$wid)")
    }
  }

  test("shards are per-lang partitioned files (loader-addressable layout)") {
    val files = store.load("shards")
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty)
    assert(files.forall(_.contains("lang=")),
      "every shard file must sit in a lang= partition directory")
    val langs = files.map(f =>
      f.split("lang=")(1).takeWhile(_ != '/')).toSet
    val corpusLangs = spark.read
      .parquet(s"${TestSpark.sf}/documents.parquet")
      .filter(col("text").isNotNull)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs === corpusLangs, "one shard directory per language stream")
  }
}
