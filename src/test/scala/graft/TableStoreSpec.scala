package graft

import java.nio.file.{Files, Paths}
import graft.tables.TableStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Log-structured store contracts: appends write deltas (not
  * snapshots), manifests compose segments, compaction bounds segment
  * counts, and readers keep their call-time snapshot across writes. */
class TableStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fresh() =
    new TableStore(spark, Files.createTempDirectory("graft-store").toString)

  test("append writes a delta segment, not a new snapshot") {
    import spark.implicits._
    val store = fresh()
    store.init("t", Seq((1, "a")).toDF("k", "v"))
    store.append("t", Seq((2, "b")).toDF("k", "v"))
    store.append("t", Seq((3, "c")).toDF("k", "v"))
    assert(store.load("t").count() === 3)
    // each delta segment holds only its own rows — the second append's
    // segment dir must contain exactly 1 row
    val segDf = spark.read.parquet(
      store.load("t").inputFiles.map(f => Paths.get(f.stripPrefix("file:"))
        .getParent.toString).distinct.sorted.last)
    assert(segDf.count() === 1)
    assert(store.load("t").inputFiles.map(f =>
      Paths.get(f.stripPrefix("file:")).getParent.toString).distinct.length === 3)
  }

  test("appendUnique drops existing keys and skips empty appends") {
    import spark.implicits._
    val store = fresh()
    store.init("t", Seq((1, "a")).toDF("k", "v"))
    store.appendUnique("t", Seq((1, "dup"), (2, "b")).toDF("k", "v"), Seq("k"))
    assert(store.load("t").count() === 2)
    val before = store.load("t").inputFiles.toSet
    // all-duplicate batch: nothing new → no segment, no version churn
    store.appendUnique("t", Seq((1, "x"), (2, "y")).toDF("k", "v"), Seq("k"))
    assert(store.load("t").inputFiles.toSet === before)
  }

  test("appendUnique tieBreak picks the first row among in-batch dups") {
    import spark.implicits._
    val store = fresh()
    store.init("t", Seq.empty[(Int, String)].toDF("k", "v"))
    store.appendUnique("t", Seq((1, "z"), (1, "a"), (2, "m")).toDF("k", "v"),
      Seq("k"), tieBreak = Seq(col("v")))
    val rows = store.load("t").orderBy("k").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ===
      Seq((1, "a"), (2, "m")))
  }

  test("compaction bounds the segment count") {
    import spark.implicits._
    val store = fresh()
    store.init("t", Seq((0, "s")).toDF("k", "v"))
    (1 to 20).foreach(i => store.append("t", Seq((i, "s")).toDF("k", "v")))
    assert(store.load("t").count() === 21)
    val segDirs = store.load("t").inputFiles.map(f =>
      Paths.get(f.stripPrefix("file:")).getParent.toString).distinct
    assert(segDirs.length <= 17,
      s"compaction never ran: ${segDirs.length} segments")
  }

  test("compact: many tiny files rewrite into few, content identical") {
    import spark.implicits._
    val store = fresh()
    // 12 appends of 50 rows each, every segment multi-file
    store.init("t", (0 until 50).map(i => (i, i.toString))
      .toDF("k", "v").repartition(4))
    (1 to 11).foreach(b => store.append("t",
      (b * 50 until b * 50 + 50).map(i => (i, i.toString))
        .toDF("k", "v").repartition(4)))
    val before = store.load("t")
    val filesBefore = before.inputFiles.length
    val sumBefore = before.agg(sum(col("k"))).head.getLong(0)
    store.compact("t", targetRowsPerFile = 200)
    val after = store.load("t")
    assert(after.count() === 600)
    assert(after.agg(sum(col("k"))).head.getLong(0) === sumBefore)
    assert(after.inputFiles.length === 3, // ceil(600/200)
      s"expected 3 files, got ${after.inputFiles.length} (was $filesBefore)")
    // single fresh segment — the manifest no longer unions deltas
    assert(after.inputFiles.map(f =>
      Paths.get(f.stripPrefix("file:")).getParent.toString)
      .distinct.length === 1)
  }

  test("compact keeps a partitioned layout and its pruning") {
    import spark.implicits._
    val store = fresh()
    store.replace("t", (0 until 300).map(i => (i, s"p${i % 3}"))
      .toDF("k", "part").repartition(8), partitionBy = Seq("part"))
    (1 to 3).foreach(b => store.append("t",
      (300 + b * 10 until 310 + b * 10).map(i => (i, s"p${i % 3}"))
        .toDF("k", "part").repartition(8)))
    store.compact("t", targetRowsPerFile = 1000)
    assert(store.partitionColumns("t") === Seq("part"))
    val after = store.load("t")
    assert(after.count() === 330)
    val pruned = after.filter(col("part") === "p1")
      .queryExecution.executedPlan.toString
    assert(pruned.matches("(?s).*PartitionFilters: \\[[^\\]]*part.*"),
      s"partition pruning lost after compact:\n$pruned")
    // bucketed tables refuse: their file layout is the bucket spec
    store.replaceBucketed("b", Seq((1, "a")).toDF("k", "v"),
      bucketBy = Seq("k"), numBuckets = 2)
    intercept[IllegalArgumentException](store.compact("b"))
  }

  test("concurrent appends to a shared sink lose no rows") {
    // dead_letter is appended to by several flows concurrently; without
    // per-table write serialization two appends can both read version v
    // and both publish v+1, silently dropping one segment
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val store = fresh()
    store.init("shared", Seq.empty[(String, Int)].toDF("flow", "n"))
    val writers = (1 to 4).map { f =>
      Future {
        (1 to 5).foreach { i =>
          store.appendUnique("shared",
            Seq((s"flow$f", i)).toDF("flow", "n"), Seq("flow", "n"))
        }
      }
    }
    Await.result(Future.sequence(writers), 120.seconds)
    assert(store.load("shared").count() === 20)
  }

  test("vacuum reclaims superseded versions, keeps the horizon readable") {
    import spark.implicits._
    val store = fresh()
    val root = {
      store.init("t", Seq((1, "a")).toDF("k", "v")) // v0: d0
      store.append("t", Seq((2, "b")).toDF("k", "v")) // v1: d0,d1
      store.replace("t", Seq((9, "z")).toDF("k", "v")) // v2: d2
      Paths.get(store.load("t").inputFiles.head.stripPrefix("file:"))
        .getParent.getParent
    }
    // a reader bound INSIDE the horizon (v1, keepVersions=2 keeps v1+v2)
    val insideHorizon = spark.read.parquet(
      root.resolve("d0").toString, root.resolve("d1").toString)
    store.vacuum("t", keepVersions = 2)
    assert(Files.exists(root.resolve("d0")) && Files.exists(root.resolve("d1")))
    assert(!Files.exists(root.resolve("m0")), "m0 survived the horizon")
    assert(insideHorizon.count() === 2) // live reader unaffected
    assert(store.load("t").collect().map(_.getInt(0)).toSeq === Seq(9))
    // shrink the horizon to the current version only: v0/v1 segments go
    store.vacuum("t", keepVersions = 1)
    assert(!Files.exists(root.resolve("d0")), "superseded segment retained")
    assert(!Files.exists(root.resolve("d1")), "superseded segment retained")
    assert(Files.exists(root.resolve("d2")))
    assert(!Files.exists(root.resolve("m1")))
    assert(store.load("t").collect().map(_.getInt(0)).toSeq === Seq(9))
    // the store keeps working after GC: appends continue the version chain
    store.append("t", Seq((10, "w")).toDF("k", "v"))
    assert(store.load("t").count() === 2)
  }

  test("auto-vacuum: long-running replace churn does not leak storage") {
    import spark.implicits._
    val store = new graft.tables.TableStore(spark,
      Files.createTempDirectory("graft-store").toString, autoVacuumKeep = 4)
    store.init("t", Seq((0, "v")).toDF("k", "v"))
    (1 to 12).foreach(i => store.replace("t", Seq((i, "v")).toDF("k", "v")))
    val root = Paths.get(store.load("t").inputFiles.head.stripPrefix("file:"))
      .getParent.getParent
    // versions 0..12 existed; only the last 4 manifests (and their
    // segments) survive without any explicit vacuum call
    val files = Files.list(root).iterator()
    var segs = 0; var manifests = 0
    while (files.hasNext) {
      val n = files.next().getFileName.toString
      if (n.startsWith("d")) segs += 1
      if (n.startsWith("m")) manifests += 1
    }
    assert(manifests === 4, s"expected 4 manifests, found $manifests")
    assert(segs === 4, s"expected 4 live segments, found $segs")
    assert(store.load("t").collect().map(_.getInt(0)).toSeq === Seq(12))
  }

  test("partitioned replace: filters on the partition column prune directories") {
    import spark.implicits._
    val store = fresh()
    store.replace("p", (0 until 64).map(i => (i, i % 8)).toDF("k", "cell"),
      partitionBy = Seq("cell"))
    val probed = store.load("p").filter(col("cell").isin(1, 3))
    // collect() drives probed's own QueryExecution (count() would plan
    // and execute a separate aggregate, leaving these metrics empty)
    assert(probed.collect().length === 16)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition pruning in:\n$plan")
    // runtime metrics prove only the 2 probed cell directories were read
    val scanned = probed.queryExecution.executedPlan.collectLeaves().head
      .metrics("numFiles").value
    val total = store.load("p").inputFiles.length
    assert(scanned < total, s"scan read all $total files")
  }

  test("partitioned append: delta segments keep the hive layout and pruning") {
    import spark.implicits._
    val store = fresh()
    store.replace("p", (0 until 64).map(i => (i, i % 8)).toDF("k", "cell"),
      partitionBy = Seq("cell"))
    assert(store.partitionColumns("p") === Seq("cell"))
    // append writes a layout-compatible (partitioned) delta segment —
    // the r7 store forbade this (replace-only partitioned tables)
    store.append("p", Seq((100, 1), (101, 3)).toDF("k", "cell"))
    assert(store.partitionColumns("p") === Seq("cell"))
    val probed = store.load("p").filter(col("cell").isin(1, 3))
    assert(probed.collect().length === 18)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition pruning in:\n$plan")
    // multi-segment partitioned reads union one scan per segment —
    // sum the file metrics across all scan leaves
    val scanned = probed.queryExecution.executedPlan.collectLeaves()
      .map(_.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum
    val total = store.load("p").inputFiles.length
    assert(scanned < total, s"scan read all $total files")
    // the partition column itself reads back correctly across segments
    assert(store.load("p").filter(col("cell") === 3).count() === 9)
    assert(store.load("p").count() === 66)
  }

  test("appendUnique into a partitioned table dedups across segments and keeps the layout") {
    import spark.implicits._
    val store = fresh()
    store.replace("p", (0 until 16).map(i => (i, i % 4)).toDF("k", "cell"),
      partitionBy = Seq("cell"))
    // k=3 already exists (dropped); k=100 is fresh (appended into the
    // hive layout); the anti-join reads the multi-segment union path
    store.appendUnique("p", Seq((3, 3), (100, 1)).toDF("k", "cell"), Seq("k"))
    assert(store.load("p").count() === 17)
    assert(store.load("p").filter(col("k") === 3).count() === 1)
    assert(store.partitionColumns("p") === Seq("cell"))
    assert(store.load("p").filter(col("cell") === 1)
      .collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 5, 9, 13, 100))
    // an all-duplicate batch appends nothing (no empty segment)
    val before = store.load("p").inputFiles.length
    store.appendUnique("p", Seq((100, 1)).toDF("k", "cell"), Seq("k"))
    assert(store.load("p").inputFiles.length === before)
  }

  test("empty append to a partitioned table is a no-op, not a poisoned segment") {
    import spark.implicits._
    val store = fresh()
    store.replace("p", (0 until 16).map(i => (i, i % 4)).toDF("k", "cell"),
      partitionBy = Seq("cell"))
    // a zero-row partitionBy write emits no parquet files; recording
    // that segment would make every later load() fail schema inference
    store.append("p", Seq.empty[(Int, Int)].toDF("k", "cell"))
    assert(store.load("p").count() === 16)
    store.append("p", Seq((100, 1)).toDF("k", "cell"))
    assert(store.load("p").count() === 17)
  }

  test("partitioned append: compaction preserves the layout") {
    import spark.implicits._
    val store = fresh()
    store.replace("p", (0 until 16).map(i => (i, i % 4)).toDF("k", "cell"),
      partitionBy = Seq("cell"))
    // enough appends to cross CompactThreshold (16 segments)
    (0 until 17).foreach(i =>
      store.append("p", Seq((100 + i, i % 4)).toDF("k", "cell")))
    assert(store.partitionColumns("p") === Seq("cell"))
    assert(store.load("p").count() === 33)
    val probed = store.load("p").filter(col("cell") === 2)
    probed.collect()
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      s"compacted table lost pruning:\n$plan")
  }

  test("bucketed replace: content round-trips, versions supersede, appends reject") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-store").toString
    val store = new TableStore(spark, root)
    // this store's catalog-name prefix (same derivation as catalogId),
    // so assertions don't collide with other suites' bucketed tables
    val pfx = "graft_" + java.security.MessageDigest.getInstance("MD5")
      .digest(root.getBytes("UTF-8")).take(4).map("%02x".format(_))
      .mkString
    val v1 = (1 to 100).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    store.replaceBucketed("b", v1, bucketBy = Seq("k"), numBuckets = 4,
      sortBy = Seq("k"))
    assert(store.load("b").collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1).toSeq === (1 to 100).map(i => (i.toLong, s"r$i")))
    // a second bucketed publish supersedes the first (fresh catalog
    // entry per version — readers of the new snapshot see new content)
    val v2 = (1 to 50).map(i => (i.toLong, s"x$i")).toDF("k", "v")
    store.replaceBucketed("b", v2, bucketBy = Seq("k"), numBuckets = 4)
    val got = store.load("b").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.length === 50 && got.forall(_._2.startsWith("x")))
    // bucketed tables are replace-only: a plain append would break the
    // bucket invariant and must reject loudly
    val ex = intercept[IllegalArgumentException] {
      store.append("b", Seq((999L, "z")).toDF("k", "v"))
    }
    assert(ex.getMessage.contains("replace-only"))
    // vacuum drops the superseded version's catalog entry along with
    // its manifest — the catalog never lists tables whose files are
    // gone (v2's entry survives; v1's is dropped)
    store.vacuum("b", keepVersions = 1)
    val remaining = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith(pfx)).toSeq
    assert(remaining.length === 1,
      s"stale bucketed catalog entries survived vacuum: $remaining")
    assert(store.load("b").count() === 50)
    // cleanup the session-catalog entries this test registered
    spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith(pfx)).foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("bucketed table survives a session restart: re-registered from the manifest spec") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-store").toString
    val store = new TableStore(spark, root)
    val df = (1 to 100).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    store.replaceBucketed("b", df, bucketBy = Seq("k"), numBuckets = 4,
      sortBy = Seq("k"))
    // simulate a JVM restart: the session catalog is in-memory, so a
    // new session starts without the entry — drop it (the table is
    // EXTERNAL: data files under the store root survive the drop)
    val pfx = "graft_" + java.security.MessageDigest.getInstance("MD5")
      .digest(root.getBytes("UTF-8")).take(4).map("%02x".format(_))
      .mkString
    spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith(pfx)).foreach(t =>
        spark.sql(s"DROP TABLE $t"))
    // load() must re-create the catalog entry from the #bucketSpec
    // manifest header and serve the same content...
    val got = store.load("b").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got === (1 to 100).map(i => (i.toLong, s"r$i")))
    // ...with the bucketing METADATA intact: an aggregation on the
    // bucket key must still ride the stored HashPartitioning with no
    // Exchange (the whole point of the layout surviving restarts)
    val agg = store.load("b").groupBy("k").count()
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"restart lost the bucket spec — agg re-shuffles:\n$plan")
    spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith(pfx)).foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    graft.tables.TempDirs.delete(root)
  }

  test("upsert supersedes same-key rows and keeps the rest") {
    import spark.implicits._
    val store = fresh()
    // creates on first use
    store.upsert("t", Seq((1, "a"), (2, "b")).toDF("k", "v"), Seq("k"))
    assert(store.load("t").count() === 2)
    // incoming rows WIN over stored ones (unlike appendUnique); other
    // keys are untouched
    store.upsert("t", Seq((2, "B2"), (3, "c")).toDF("k", "v"), Seq("k"))
    val got = store.load("t").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got === Map(1 -> "a", 2 -> "B2", 3 -> "c"))
    // exactly one row per key survives — no duplicate (2, ...) rows
    assert(store.load("t").count() === 3)
    // idempotent: replaying the same upsert changes nothing
    store.upsert("t", Seq((2, "B2"), (3, "c")).toDF("k", "v"), Seq("k"))
    assert(store.load("t").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap === got)
  }

  test("upsert keeps a partitioned table's layout (pruning still works)") {
    import spark.implicits._
    val store = fresh()
    store.replace("t", Seq((1, "p1", "a"), (2, "p2", "b"))
      .toDF("k", "part", "v"), partitionBy = Seq("part"))
    store.upsert("t", Seq((2, "p2", "B2"), (3, "p1", "c"))
      .toDF("k", "part", "v"), Seq("k"))
    assert(store.load("t").select("k", "v").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
      === Set((1, "a"), (2, "B2"), (3, "c")))
    // the rewrite must preserve the hive layout: a partition filter
    // still prunes to only p1's files at execution time
    assert(store.partitionColumns("t") === Seq("part"))
    val pruned = store.load("t").filter(col("part") === "p1")
    assert(pruned.collect().length === 2)
    val scanned = pruned.queryExecution.executedPlan.collectLeaves().head
      .metrics("numFiles").value
    val p1Files = store.load("t").inputFiles.count(_.contains("part=p1"))
    assert(scanned === p1Files && p1Files <
      store.load("t").inputFiles.length,
      s"partition pruning lost after upsert: scanned $scanned")
  }

  test("bucketed restart re-registration survives a quoted store path") {
    import spark.implicits._
    // a store root containing a single quote: the re-registration DDL
    // interpolates the LOCATION literal, which must escape it
    val root = Files.createTempDirectory("graft-store-o'brien").toString
    val store = new TableStore(spark, root)
    val df = (1 to 20).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    store.replaceBucketed("b", df, bucketBy = Seq("k"), numBuckets = 2,
      sortBy = Seq("k"))
    val pfx = "graft_" + java.security.MessageDigest.getInstance("MD5")
      .digest(root.getBytes("UTF-8")).take(4).map("%02x".format(_))
      .mkString
    spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith(pfx)).foreach(t =>
        spark.sql(s"DROP TABLE $t"))
    val got = store.load("b").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got === (1 to 20).map(i => (i.toLong, s"r$i")))
    spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith(pfx)).foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    graft.tables.TempDirs.delete(root)
  }

  test("MVCC: a plan captured before a write keeps its snapshot") {
    import spark.implicits._
    val store = fresh()
    store.init("t", Seq((1, "a")).toDF("k", "v"))
    val snapshot = store.load("t")
    store.replace("t", Seq((9, "z")).toDF("k", "v"))
    store.append("t", Seq((10, "w")).toDF("k", "v"))
    assert(snapshot.collect().map(_.getInt(0)).toSeq === Seq(1))
    assert(store.load("t").count() === 2)
  }

  test("time travel: loadVersion binds each historical snapshot by number") {
    import spark.implicits._
    val store = fresh()
    store.init("t", Seq((1, "a")).toDF("k", "v")) // v0
    store.append("t", Seq((2, "b")).toDF("k", "v")) // v1
    store.upsert("t", Seq((1, "A"), (3, "c")).toDF("k", "v"), Seq("k")) // v2
    assert(store.version("t") === 2)
    def rows(v: Int) = store.loadVersion("t", v).collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    assert(rows(0) === Seq((1, "a")))
    assert(rows(1) === Seq((1, "a"), (2, "b")))
    assert(rows(2) === Seq((1, "A"), (2, "b"), (3, "c")))
    val e = intercept[IllegalArgumentException](store.loadVersion("t", 7))
    assert(e.getMessage.contains("no readable version 7"))
  }

  test("time travel: a vacuumed version fails with a pointed error") {
    import spark.implicits._
    val store = fresh()
    store.init("t", Seq((1, "a")).toDF("k", "v"))
    store.replace("t", Seq((2, "b")).toDF("k", "v"))
    store.replace("t", Seq((3, "c")).toDF("k", "v"))
    store.vacuum("t", keepVersions = 1)
    val e = intercept[IllegalArgumentException](store.loadVersion("t", 0))
    assert(e.getMessage.contains("vacuumed"))
    assert(store.loadVersion("t", 2).count() === 1)
  }

  test("CDC fast path: append-only chain diffs read ONLY the delta segments") {
    import spark.implicits._
    val store = fresh()
    store.init("t", (1 to 100).map(i => (i, s"v$i")).toDF("k", "v")) // v0
    store.append("t", Seq((101, "x")).toDF("k", "v")) // v1
    store.append("t", Seq((102, "y")).toDF("k", "v")) // v2
    val cdc = store.changesBetween("t", 0, 2, Seq("k"))
    val got = cdc.collect().map(r => (r.getInt(0), r.getString(1),
      r.getString(2))).sortBy(_._1).toSeq
    assert(got === Seq((101, "x", "insert"), (102, "y", "insert")))
    // the v0 base segment (100 rows) must not be in the scan at all
    val dirs = cdc.inputFiles.map(f => java.nio.file.Paths
      .get(f.stripPrefix("file:")).getParent.getFileName.toString).distinct
    assert(dirs.sorted.toSeq === Seq("d1", "d2"))
  }

  test("CDC general path: a rewriting transition yields insert/update/delete") {
    import spark.implicits._
    val store = fresh()
    store.init("t", Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")) // v0
    // upsert: 1 updated, 4 inserted; then a replace dropping key 2
    store.upsert("t", Seq((1, "A"), (4, "d")).toDF("k", "v"), Seq("k")) // v1
    store.replace("t", store.load("t").filter(col("k") =!= 2)) // v2
    val got = store.changesBetween("t", 0, 2, Seq("k")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(got === Seq((1, "A", "update"), (2, "b", "delete"),
      (4, "d", "insert")))
    // self-diff is empty; delete rows carry the departed values
    assert(store.changesBetween("t", 2, 2, Seq("k")).count() === 0)
  }

  private def content(store: TableStore, name: String) =
    store.load(name).collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq

  test("syncTo: append-only hops replicate O(delta); repeat is a no-op") {
    import spark.implicits._
    val store = fresh()
    store.init("src", Seq((1, "a"), (2, "b")).toDF("k", "v"))
    assert(store.syncTo("src", "dst", Seq("k")) === 0) // initial full copy
    assert(content(store, "dst") === Seq((1, "a"), (2, "b")))
    store.append("src", Seq((3, "c")).toDF("k", "v"))
    store.append("src", Seq((4, "d")).toDF("k", "v"))
    assert(store.syncTo("src", "dst", Seq("k")) === 2)
    assert(content(store, "dst") === Seq((1, "a"), (2, "b"), (3, "c"),
      (4, "d")))
    // the incremental apply landed as a DELTA segment on dst, not a
    // rewrite: dst's scan now covers two segment dirs
    val segs = store.load("dst").inputFiles.map(f => java.nio.file.Paths
      .get(f.stripPrefix("file:")).getParent.getFileName.toString).distinct
    assert(segs.length === 2, s"expected base+delta segments, got $segs")
    // already-synced: version unchanged, content unchanged
    assert(store.syncTo("src", "dst", Seq("k")) === 2)
    assert(content(store, "dst") === Seq((1, "a"), (2, "b"), (3, "c"),
      (4, "d")))
  }

  test("syncTo: rewriting hops reconcile updates and deletes") {
    import spark.implicits._
    val store = fresh()
    store.init("src", Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))
    store.syncTo("src", "dst", Seq("k"))
    store.upsert("src", Seq((1, "A"), (4, "d")).toDF("k", "v"), Seq("k"))
    store.replace("src", store.load("src").filter(col("k") =!= 2))
    store.syncTo("src", "dst", Seq("k"))
    assert(content(store, "dst") === content(store, "src"))
    assert(content(store, "dst") === Seq((1, "A"), (3, "c"), (4, "d")))
  }

  test("schema evolution: unflagged drift rejects; evolveSchema adds nullable columns") {
    import spark.implicits._
    val store = fresh()
    store.init("t", Seq((1, "a")).toDF("k", "v"))
    // silent drift: extra column without the flag → pointed rejection
    val e1 = intercept[IllegalArgumentException](
      store.append("t", Seq((2, "b", 9.5)).toDF("k", "v", "score")))
    assert(e1.getMessage.contains("score") &&
      e1.getMessage.contains("evolveSchema"))
    // retype is never allowed, flag or not
    val e2 = intercept[IllegalArgumentException](
      store.append("t", Seq(("3", "c")).toDF("k", "v"),
        evolveSchema = true))
    assert(e2.getMessage.contains("RETYPE"))
    // evolution: new nullable column; old segment reads it as null
    store.append("t", Seq((2, "b", 9.5)).toDF("k", "v", "score"),
      evolveSchema = true)
    val rows = store.load("t").orderBy("k").collect()
      .map(r => (r.getInt(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(rows.toSeq === Seq((1, "a", None), (2, "b", Some(9.5))))
    // a later batch may omit the evolved column (filled as null)
    store.append("t", Seq((3, "d")).toDF("k", "v"), evolveSchema = true)
    assert(store.load("t").filter(col("k") === 3)
      .select("score").collect().head.isNullAt(0))
    // compact materializes the evolved schema into the files
    store.compact("t")
    assert(store.load("t").schema.fieldNames.toSeq === Seq("k", "v", "score"))
    assert(store.load("t").count() === 3)
  }

  test("deleteWhere rewrites only segments containing matches") {
    import spark.implicits._
    val store = fresh()
    store.init("t", Seq((1, "a"), (2, "b")).toDF("k", "v"))
    store.append("t", Seq((3, "c"), (4, "d")).toDF("k", "v"))
    store.append("t", Seq((5, "e"), (6, "f")).toDF("k", "v"))
    val before = store.load("t").inputFiles.toSet
    val vBefore = store.version("t")
    // k = 3 lives only in the middle segment
    assert(store.deleteWhere("t", col("k") === 3) === 1L)
    assert(store.version("t") === vBefore + 1)
    assert(store.load("t").select("k").as[Int].collect().sorted.toSeq ===
      Seq(1, 2, 4, 5, 6))
    val after = store.load("t").inputFiles.toSet
    // segments 1 and 3 are carried byte-identical (same files);
    // only the matched segment was rewritten
    assert((before & after).nonEmpty, "untouched segments were rewritten")
    assert(before != after)
    // prior version still time-travels to the deleted row
    assert(store.loadVersion("t", vBefore).filter(col("k") === 3)
      .count() === 1L)
    // CDC across the delete reports it as _op = delete
    val ch = store.changesBetween("t", vBefore, vBefore + 1, Seq("k"))
    assert(ch.filter(col("_op") === "delete").select("k").as[Int]
      .collect().toSeq === Seq(3))
  }

  test("deleteWhere: NULL predicate rows survive; no-match publishes nothing") {
    import spark.implicits._
    val store = fresh()
    store.init("t", Seq((1, Some(10)), (2, None), (3, Some(30)))
      .toDF("k", "score"))
    // score > 20 is NULL for k=2 — SQL DELETE keeps it
    assert(store.deleteWhere("t", col("score") > 20) === 1L)
    assert(store.load("t").select("k").as[Int].collect().sorted.toSeq ===
      Seq(1, 2))
    val v = store.version("t")
    assert(store.deleteWhere("t", col("score") > 999) === 0L)
    assert(store.version("t") === v, "no-match delete bumped the version")
  }

  test("deleteWhere: partitioned layout preserved; full wipe leaves readable empty table") {
    import spark.implicits._
    val store = fresh()
    store.replace("t", Seq((1, "x"), (2, "y"), (3, "x")).toDF("k", "part"),
      partitionBy = Seq("part"))
    assert(store.deleteWhere("t", col("part") === "y") === 1L)
    assert(store.partitionColumns("t") === Seq("part"))
    assert(store.load("t").count() === 2L)
    // fully-deleted segments drop; wiping everything stays readable
    assert(store.deleteWhere("t", lit(true)) === 2L)
    assert(store.load("t").count() === 0L)
    assert(store.load("t").schema.fieldNames.toSet === Set("k", "part"))
  }

  test("partition columns align integral types instead of failing retype") {
    import spark.implicits._
    val store = fresh()
    // writer computes the partition value as INT; hive inference reads
    // the path-encoded value back as int too, so the recorded type is
    // int. A later append that computed the SAME values as BIGINT is
    // the identical on-disk layout (cell=7/) — it must align, not fail.
    store.replace("t", Seq((1L, 7), (2L, 8)).toDF("id", "cell"),
      partitionBy = Seq("cell"))
    store.append("t",
      Seq((3L, 7L)).toDF("id", "cell"))
    val got = store.load("t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.get(1)))
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L))
    // read type stays pinned to the recorded int — no per-segment drift
    assert(store.load("t").schema("cell").dataType.catalogString === "int")
    // a NON-partition integral mismatch is still a hard retype error
    val e = intercept[IllegalArgumentException](
      store.append("t", Seq((4, 9L)).toDF("id", "cell")
        .select(col("id").cast("int").as("id"), col("cell"))))
    assert(e.getMessage.contains("RETYPE") && e.getMessage.contains("id"))
    // the exemption is not type-blind: a partition value that cannot
    // round-trip into the recorded type would NULL under the pinned
    // read — loud failure, not silent corruption
    val e2 = intercept[IllegalArgumentException](
      store.append("t", Seq((5L, "x7")).toDF("id", "cell")))
    assert(e2.getMessage.contains("do not parse") &&
      e2.getMessage.contains("cell"))
    // numeric strings DO round-trip (the SRP-bucket writer's case)
    store.append("t", Seq((6L, "9")).toDF("id", "cell"))
    assert(store.load("t").filter(col("cell") === 9).count() === 1L)
  }

  test("schema evolution: CDC across an evolving history aligns the old side") {
    import spark.implicits._
    val store = fresh()
    store.init("t", Seq((1, "a")).toDF("k", "v")) // v0
    store.append("t", Seq((2, "b", 7.0)).toDF("k", "v", "score"),
      evolveSchema = true) // v1 (append-only fast path)
    val fast = store.changesBetween("t", 0, 1, Seq("k")).collect()
    assert(fast.map(r => (r.getInt(0), r.getString(1),
      r.getDouble(2), r.getString(3))).toSeq === Seq((2, "b", 7.0, "insert")))
    // rewriting hop: general path must null-fill the old side's
    // missing column instead of failing resolution
    store.upsert("t", Seq((1, "A", null.asInstanceOf[java.lang.Double]))
      .toDF("k", "v", "score"), Seq("k")) // v2
    val gen = store.changesBetween("t", 0, 2, Seq("k")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(3))).sortBy(_._1)
    assert(gen.toSeq === Seq((1, "A", "update"), (2, "b", "insert")))
  }

  test("CDC reports a NULL-ing update as NULL, never the stale old value") {
    import spark.implicits._
    val store = fresh()
    store.init("t", Seq((1, "x"), (2, "y")).toDF("k", "v")) // v0
    store.upsert("t", Seq((1, null.asInstanceOf[String])).toDF("k", "v"),
      Seq("k")) // v1: k=1's v legitimately becomes NULL
    val ch = store.changesBetween("t", 0, 1, Seq("k")).collect()
      .map(r => (r.getInt(0), Option(r.getString(1)), r.getString(2)))
    assert(ch.toSeq === Seq((1, None, "update")),
      "a coalesce over the sides would resurrect the stale 'x'")
    // ...and a downstream sync replicates the NULL, not the stale value
    store.init("dst", store.loadVersion("t", 0))
    // seed the cursor at v0, then sync the NULL-ing hop
    store.commitBatch("_sync_t__dst", 0)
    store.syncTo("t", "dst", Seq("k"))
    assert(store.load("dst").filter(col("k") === 1)
      .select("v").head.isNullAt(0), "sync replicated the stale value")
  }

  test("CDC detects a value moving between same-typed columns (null-skip hashing)") {
    import spark.implicits._
    val store = fresh()
    // Spark's hash functions skip nulls without perturbing the
    // accumulator — without presence markers, (x, null) → (null, x)
    // hashes identically and the update vanishes from the feed
    store.init("t", Seq((1, "x", null.asInstanceOf[String]))
      .toDF("k", "a", "b")) // v0
    store.upsert("t", Seq((1, null.asInstanceOf[String], "x"))
      .toDF("k", "a", "b"), Seq("k")) // v1: x moves a → b
    val ch = store.changesBetween("t", 0, 1, Seq("k")).collect()
      .map(r => (r.getInt(0), Option(r.getString(1)),
        Option(r.getString(2)), r.getString(3)))
    assert(ch.toSeq === Seq((1, None, Some("x"), "update")),
      "the cross-column null swap was invisible to the change feed")
  }

  test("partition value probe uses the STRING domain the path stores") {
    import spark.implicits._
    val store = fresh()
    store.replace("t", Seq((1L, 7), (2L, 8)).toDF("id", "cell"),
      partitionBy = Seq("cell"))
    // double 9.5 try_casts to int 9, but the path would store "9.5"
    // and the pinned int read would null it — must fail loudly
    val e = intercept[IllegalArgumentException](
      store.append("t", Seq((3L, 9.5)).toDF("id", "cell")))
    assert(e.getMessage.contains("do not parse"), e.getMessage)
  }

  test("syncTo follows source schema evolution on both hop kinds") {
    import spark.implicits._
    val store = fresh()
    store.init("src", Seq((1, "a")).toDF("k", "v"))
    store.syncTo("src", "dst", Seq("k"))
    // append-only hop that EVOLVES the schema
    store.append("src", Seq((2, "b", 9.5)).toDF("k", "v", "score"),
      evolveSchema = true)
    store.syncTo("src", "dst", Seq("k"))
    assert(store.load("dst").schema.fieldNames.toSeq ===
      Seq("k", "v", "score"))
    assert(store.load("dst").count() === 2L)
    // rewriting hop after evolution (upsert resets the segment chain)
    store.upsert("src", Seq((1, "A", 1.0)).toDF("k", "v", "score"), Seq("k"))
    store.syncTo("src", "dst", Seq("k"))
    val rows = store.load("dst").orderBy("k").collect()
      .map(r => (r.getInt(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(rows.toSeq === Seq((1, "A", Some(1.0)), (2, "b", Some(9.5))))
  }

  test("syncTo: a vacuumed base version falls back to a full resync") {
    import spark.implicits._
    val store = fresh()
    store.init("src", Seq((1, "a")).toDF("k", "v"))
    store.syncTo("src", "dst", Seq("k")) // synced at v0
    store.replace("src", Seq((2, "b")).toDF("k", "v"))
    store.replace("src", Seq((3, "c")).toDF("k", "v"))
    store.vacuum("src", keepVersions = 1) // v0 (the sync base) is gone
    assert(store.syncTo("src", "dst", Seq("k")) === 2)
    assert(content(store, "dst") === Seq((3, "c")))
  }
}
