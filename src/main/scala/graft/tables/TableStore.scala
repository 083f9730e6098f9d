package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, lit, row_number}

/**
 * Versioned parquet table manager — a minimal log-structured MVCC
 * store mirroring the reference's mutable collections (insert/update
 * only, never delete — README.md:47) with the snapshot semantics flows
 * need.
 *
 * Layout: every version N has a manifest file `root/<table>/m<N>`
 * listing the data segment dirs (`d<K>/`) that compose the snapshot,
 * plus a `_current` pointer file naming the live version. `load` binds
 * a DataFrame to the segment list current AT CALL TIME.
 *
 * Writes are O(change), not O(table): `replace` materializes a full
 * new segment (mutating merges need it), but `append`/`appendUnique`
 * write ONLY the new rows as a fresh segment and publish a manifest
 * that extends the previous one — the same delta-log idea as
 * Delta/Iceberg commits (which is what this store becomes in
 * production). Segment counts are bounded by compaction: once a
 * manifest exceeds `CompactThreshold` segments the next append folds
 * them into one (their `OPTIMIZE`).
 *
 * Superseded versions and their segments are RETAINED, so lazy plans
 * captured before a publish stay readable for the rest of the batch —
 * the reader-snapshot guarantee of a transaction log. `vacuum` is the
 * version GC: it reclaims manifests/segments older than a retention
 * horizon of versions while keeping everything a reader inside the
 * horizon can still reference.
 *
 * Writer contract: one snapshot-rewriting writer per table by
 * convention (one foreachBatch sink owns each replace()d table);
 * concurrent APPENDS to shared sinks (dead_letter) are supported and
 * serialized by the per-table JVM-local lock — sufficient because
 * every foreachBatch sink runs on the one driver that owns this store
 * instance. Readers are unrestricted.
 */
/** @param autoVacuumKeep every version transition GCs manifests (and
  *   their now-unreferenced segments) more than this many versions
  *   behind the new current — the always-on retention horizon that
  *   keeps long-running deployments from leaking storage linearly in
  *   commits. Readers must be no staler than `autoVacuumKeep` versions
  *   (flows bind reads per micro-batch, which advances a table a
  *   handful of versions at most). ≤ 0 disables; `vacuum()` remains
  *   available for explicit, tighter GC. */
final class TableStore(spark: SparkSession, root: String,
    autoVacuumKeep: Int = 16) {
  Files.createDirectories(Paths.get(root))

  private val CompactThreshold = 16

  // Per-table write lock. The single-writer-per-table contract holds
  // for snapshot-rewriting flows, but APPEND-only sinks are legitimately
  // shared (dead_letter receives rows from every flow): two concurrent
  // appends that both read version v and both publish v+1 would lose
  // one segment. All version transitions of a table therefore serialize
  // on this JVM-local lock — sufficient because every foreachBatch sink
  // runs on the one driver that owns this store instance.
  private val writeLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def writeLock(name: String): Object =
    writeLocks.computeIfAbsent(name, _ => new Object)

  private def tdir(name: String): Path = Paths.get(root, name)
  private def pointer(name: String): Path = tdir(name).resolve("_current")

  private def currentVersion(name: String): Int =
    if (Files.exists(pointer(name)))
      new String(Files.readAllBytes(pointer(name))).trim.toInt
    else -1

  // manifest = optional `#partitionBy=c1,c2` layout header + one
  // segment dir per line. The header is what lets append() write
  // layout-compatible (hive-partitioned) segments into a partitioned
  // table instead of the r7 replace-only constraint.
  private def manifestLines(name: String, v: Int): Seq[String] = {
    val m = tdir(name).resolve(s"m$v")
    new String(Files.readAllBytes(m)).split("\n").toSeq.filter(_.nonEmpty)
  }

  private def segments(name: String, v: Int): Seq[String] =
    manifestLines(name, v).filterNot(_.startsWith("#"))

  /** The table's partition columns (hive layout) as recorded by the
    * manifest of its CURRENT version; empty for flat tables. */
  def partitionColumns(name: String): Seq[String] = {
    val v = currentVersion(name)
    if (v < 0) Nil
    else manifestLines(name, v).find(_.startsWith("#partitionBy="))
      .map(_.stripPrefix("#partitionBy=").split(",").toSeq
        .filter(_.nonEmpty))
      .getOrElse(Nil)
  }

  /** The schema recorded by version `v`'s manifest, present once a
    * table has EVOLVED past its files' own footers (older segments
    * then lack the newer columns and must be read under the recorded
    * superset schema, which fills them as null). */
  private def recordedSchema(name: String, v: Int)
      : Option[org.apache.spark.sql.types.StructType] =
    manifestLines(name, v).find(_.startsWith("#schema="))
      .map(h => org.apache.spark.sql.types.DataType
        .fromJson(h.stripPrefix("#schema="))
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** Atomically flip the table to version `next` = `segs`. The segment
    * data is fully materialized BEFORE the pointer flips; concurrent
    * readers see old-or-new, never partial. */
  private def partHeader(partitionBy: Seq[String]): Seq[String] =
    if (partitionBy.nonEmpty) Seq(s"#partitionBy=${partitionBy.mkString(",")}")
    else Nil

  private def publish(name: String, segs: Seq[String], next: Int,
      headers: Seq[String] = Nil): Unit = {
    Files.write(tdir(name).resolve(s"m$next"),
      (headers ++ segs).mkString("\n").getBytes)
    val tmp = tdir(name).resolve("_current_tmp")
    Files.write(tmp, next.toString.getBytes)
    Files.move(tmp, pointer(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // always-on retention GC (callers hold the write lock; vacuum's
    // synchronized re-enters). Only fires once the horizon is behind
    // us, so young tables pay nothing.
    if (autoVacuumKeep > 0 && next >= autoVacuumKeep)
      vacuum(name, autoVacuumKeep)
  }

  private def writeSegment(name: String, v: Int, df: DataFrame,
      partitionBy: Seq[String] = Nil): String = {
    val seg = s"d$v"
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tdir(name).resolve(seg).toString)
    seg
  }

  def exists(name: String): Boolean = currentVersion(name) >= 0

  /** The table's live version number (−1 if the table is absent) —
    * the handle time travel and CDC take. */
  def version(name: String): Int = currentVersion(name)

  /** True iff version `v` of `name` is still readable (its manifest
    * has not been vacuumed) — the probe incremental consumers use to
    * decide between a delta read and a full resync. */
  def versionExists(name: String, v: Int): Boolean =
    v >= 0 && Files.exists(tdir(name).resolve(s"m$v"))

  /** Snapshot read: bound to the segment list current at call time.
    * Partitioned tables with several delta segments read one scan per
    * segment unioned together — Spark's multi-path partition
    * discovery rejects sibling hive roots, and partition filters push
    * through the union into every branch, so pruning is preserved.
    * Bucketed tables resolve through the session catalog — that is
    * where Spark keeps the CLUSTERED BY metadata that lets a join or
    * aggregation on the bucket key skip its Exchange. */
  def load(name: String): DataFrame = {
    val v = currentVersion(name)
    require(v >= 0, s"table $name does not exist")
    loadVersion(name, v)
  }

  /** Time-travel read: bind to the snapshot AS OF version `v` (any
    * version still inside the vacuum horizon — reclaimed versions fail
    * with a pointed error, the Delta/Iceberg `VERSION AS OF` contract).
    * Bucketed snapshots whose session-catalog entry is gone re-register
    * from the manifest's recorded spec exactly like [[load]] does. */
  def loadVersion(name: String, v: Int): DataFrame = {
    require(currentVersion(name) >= 0, s"table $name does not exist")
    require(v >= 0 && Files.exists(tdir(name).resolve(s"m$v")),
      s"table $name has no readable version $v (current " +
        s"${currentVersion(name)}; older versions may have been vacuumed)")
    val lines = manifestLines(name, v)
    lines.find(_.startsWith("#bucketed=")) match {
      case Some(h) =>
        val catalog = h.stripPrefix("#bucketed=")
        // the catalog entry dies with the SparkSession but the manifest
        // and data files are durable — a fresh session re-registers the
        // recorded CLUSTERED BY spec over the existing segment before
        // reading, so bucketed tables honor the same restart contract
        // as every other table kind
        if (!spark.catalog.tableExists(catalog))
          lines.find(_.startsWith("#bucketSpec="))
            .map(_.stripPrefix("#bucketSpec=").split("\\|", -1)) match {
            case Some(Array(n, by, sort)) =>
              val dir = tdir(name)
                .resolve(lines.filterNot(_.startsWith("#")).head).toString
              val schema = spark.read.parquet(dir).schema
              // quote identifiers and escape the path: the store root
              // is caller-chosen, so the LOCATION literal (and bucket/
              // sort columns) must survive quotes/backticks in it
              def qId(c: String) = "`" + c.replace("`", "``") + "`"
              val loc = "'" + dir.replace("\\", "\\\\")
                .replace("'", "\\'") + "'"
              val sorted = if (sort.nonEmpty)
                s" SORTED BY (${sort.split(",").map(qId).mkString(", ")})"
              else ""
              spark.sql(s"CREATE TABLE IF NOT EXISTS $catalog " +
                s"(${schema.toDDL}) USING parquet " +
                s"CLUSTERED BY (${by.split(",").map(qId).mkString(", ")})" +
                s"$sorted INTO ${n.toInt} BUCKETS LOCATION $loc")
              ()
            case _ => throw new IllegalStateException(
              s"bucketed table $name has no catalog entry in this " +
                "session and its manifest carries no #bucketSpec header")
          }
        spark.table(catalog)
      case None =>
        val dirs = lines.filterNot(_.startsWith("#"))
          .map(s => tdir(name).resolve(s).toString)
        readDirs(dirs, lines.exists(_.startsWith("#partitionBy=")),
          recordedSchema(name, v))
    }
  }

  private def readDirs(dirs: Seq[String], partitioned: Boolean,
      recorded: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame =
    recorded match {
      // an evolved table reads under its RECORDED superset schema —
      // parquet fills columns missing from older segments as null
      case Some(sch) =>
        if (dirs.length == 1 || !partitioned)
          spark.read.schema(sch).parquet(dirs: _*)
        else dirs.map(d => spark.read.schema(sch).parquet(d))
          .reduce(_.unionByName(_))
      case None if !partitioned || dirs.length == 1 =>
        spark.read.parquet(dirs: _*)
      case None =>
        // pin every segment to the first segment's schema: hive
        // partition-column type inference runs per segment, so a
        // segment whose partition values happen to all look numeric
        // could otherwise infer a different type than its siblings
        // and unionByName would silently coerce
        val schema = spark.read.parquet(dirs.head).schema
        dirs.map(d => spark.read.schema(schema).parquet(d))
          .reduce(_.unionByName(_))
    }

  /** Change-data-feed between two versions — the rows a downstream
    * incremental consumer must apply to move its copy of `name` from
    * snapshot `fromV` to snapshot `toV`, each tagged `_op` ∈
    * insert|update|delete (Delta CDF / Iceberg changelog semantics;
    * delete rows carry the departed values). `key` must be a unique
    * key of the table — with duplicate keys "update" is ill-defined,
    * exactly the CDF precondition the production formats state.
    *
    * Scale shape: when `toV`'s manifest EXTENDS `fromV`'s (the
    * append-only chain appendUnique/append build), the diff reads ONLY
    * the delta segments — O(change), no join, regardless of table
    * size; a reader incrementally tailing a 100 TB append-only table
    * never rescans it. A rewriting transition between the two versions
    * (upsert/compact/replace resets the segment chain) falls back to a
    * keyed full-outer diff of the two snapshots with xxhash64 row
    * comparison — O(both snapshots), one shuffle each side, the
    * unavoidable general case. */
  def changesBetween(name: String, fromV: Int, toV: Int,
      key: Seq[String]): DataFrame = {
    require(fromV <= toV, s"fromV $fromV must be <= toV $toV")
    require(key.nonEmpty, "changesBetween needs a non-empty unique key")
    Seq(fromV, toV).foreach(v =>
      require(Files.exists(tdir(name).resolve(s"m$v")),
        s"table $name has no readable version $v (current " +
          s"${currentVersion(name)}; older versions may have been vacuumed)"))
    val fromLines = manifestLines(name, fromV)
    val toLines = manifestLines(name, toV)
    val fromSegs = fromLines.filterNot(_.startsWith("#"))
    val toSegs = toLines.filterNot(_.startsWith("#"))
    val bucketed = (fromLines ++ toLines).exists(_.startsWith("#bucketed="))
    if (!bucketed && toSegs.startsWith(fromSegs)) {
      val delta = toSegs.drop(fromSegs.length)
        .map(s => tdir(name).resolve(s).toString)
      if (delta.isEmpty) // identical manifests (e.g. self-diff)
        loadVersion(name, toV).limit(0).withColumn("_op", lit("insert"))
      else readDirs(delta, toLines.exists(_.startsWith("#partitionBy=")),
          recordedSchema(name, toV))
        .withColumn("_op", lit("insert"))
    }
    else {
      import org.apache.spark.sql.functions.{when, xxhash64}
      // presence markers, not key-IS-NULL probes: a legitimately NULL
      // key column must not masquerade as an absent join side
      val nRaw = loadVersion(name, toV)
      val cols = nRaw.columns.toSeq
      val oRaw = loadVersion(name, fromV)
      // align the old snapshot to the new schema (a column added by
      // evolution since fromV reads as null on the old side)
      val o = oRaw.select(cols.map(c =>
          if (oRaw.columns.contains(c)) col(c)
          else lit(null).cast(nRaw.schema(c).dataType).as(c)): _*)
        .withColumn("_o_present", lit(true)).alias("o")
      val n = nRaw.withColumn("_n_present", lit(true)).alias("n")
      val payload = cols.filterNot(key.contains)
      // interleave a presence marker per column: Spark's hash functions
      // SKIP null inputs without perturbing the accumulator, so
      // (x, null) and (null, x) in two same-typed columns would hash
      // identically and the update would vanish from the feed; the
      // non-null boolean marker keeps the streams distinct
      def rowHash(side: String) = // key-only tables carry no payload
        if (payload.isEmpty) lit(0L)
        else xxhash64(payload.flatMap(c =>
          Seq(col(s"$side.$c"), col(s"$side.$c").isNull)): _*)
      val joined = o.join(n,
        key.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _),
        "full_outer")
      val op = when(col("_o_present").isNull, lit("insert"))
        .when(col("_n_present").isNull, lit("delete"))
        .when(rowHash("o") =!= rowHash("n"), lit("update"))
      // side selection by PRESENCE, not per-column coalesce: an update
      // that legitimately NULLs a column must report the NULL (a
      // coalesce would resurrect the stale old value and a downstream
      // sync would replicate it); only delete rows carry old values
      joined
        .select(cols.map(c =>
          when(col("_n_present").isNotNull, col(s"n.$c"))
            .otherwise(col(s"o.$c")).as(c)) :+ op.as("_op"): _*)
        .filter(col("_op").isNotNull)
    }
  }

  def init(name: String, df: DataFrame): Unit = replace(name, df)

  /** Publish a whole-table snapshot (mutating merges). `partitionBy`
    * lays the segment out as hive-style partition directories, so
    * reader filters on those columns become PartitionFilters and prune
    * whole directories from the scan (the layout the stored ANN
    * indexes use to make a probe O(probed partitions), not O(corpus)).
    * The layout is recorded in the manifest, so later append()s write
    * layout-compatible segments and the table keeps pruning as it
    * grows (incremental index maintenance). */
  def replace(name: String, df: DataFrame,
      partitionBy: Seq[String] = Nil): Unit =
    writeLock(name).synchronized {
      val next = currentVersion(name) + 1
      publish(name, Seq(writeSegment(name, next, df, partitionBy)), next,
        partHeader(partitionBy))
    }

  /** Bucketed snapshot publish — the fact-to-fact co-location layout:
    * rows are hash-CLUSTERED BY `bucketBy` into `numBuckets` files
    * (optionally sorted within each bucket), and the bucketing spec is
    * registered in the session catalog, which is where Spark's planner
    * reads the `HashPartitioning` it needs to ELIDE the Exchange under
    * a join or aggregation on the bucket key. Two fact tables bucketed
    * on their join key with the same bucket count sort-merge-join with
    * ZERO shuffle of either side — at 100 TB that is the difference
    * between a co-located merge and re-shuffling both fact tables per
    * query (the layout Delta/Iceberg express as CLUSTERED BY; the
    * production swap SCALING.md names). Each version registers its own
    * catalog entry over an external path inside this store, so the
    * snapshot/versioning contract is unchanged. Bucketed tables are
    * replace-only: a plain parquet append cannot extend hash-bucketed
    * files without breaking the bucket invariant (production formats
    * append per-bucket; this store's appends reject instead of
    * silently degrading the layout). */
  def replaceBucketed(name: String, df: DataFrame, bucketBy: Seq[String],
      numBuckets: Int, sortBy: Seq[String] = Nil): Unit =
    writeLock(name).synchronized {
      val next = currentVersion(name) + 1
      val seg = s"d$next"
      val catalog = catalogId(name, next)
      val w = df.write.mode("overwrite").format("parquet")
        .option("path", tdir(name).resolve(seg).toString)
        .bucketBy(numBuckets, bucketBy.head, bucketBy.drop(1): _*)
      (if (sortBy.nonEmpty) w.sortBy(sortBy.head, sortBy.drop(1): _*) else w)
        .saveAsTable(catalog)
      // record the bucket spec itself, not just the catalog name: the
      // session catalog is in-memory, so a later session re-creates the
      // entry from this header (see load)
      publish(name, Seq(seg), next, headers = Seq(s"#bucketed=$catalog",
        s"#bucketSpec=$numBuckets|${bucketBy.mkString(",")}|${sortBy.mkString(",")}"))
    }

  /** Session-catalog identifier for version `v` of bucketed table
    * `name` in THIS store (several stores can host a `name`). */
  private def catalogId(name: String, v: Int): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(root.getBytes("UTF-8")).take(4)
      .map("%02x".format(_)).mkString
    s"graft_${h}_${name}_v$v"
  }

  /** Append rows to an insert-only table (notifications, rejections,
    * growing stored indexes): writes ONLY the new rows as a segment;
    * compacts when the manifest is long. Creates the table on first
    * append (flat layout — use replace(partitionBy) to establish a
    * partitioned one). Appends into a partitioned table write
    * hive-partitioned segments matching the recorded layout, so
    * partition discovery and pruning keep working across segments. */
  /** `evolveSchema = true` lets a batch ADD nullable columns (and omit
    * existing ones — filled as null): the table's live schema becomes
    * the union, recorded in the manifest so older segments read under
    * it with the new columns null — Delta `mergeSchema` semantics.
    * Retyping or any schema change without the flag is rejected with a
    * pointed error (the fixture-drift class the schema-guard specs
    * exist for), never silently coerced. */
  def append(name: String, df: DataFrame,
      evolveSchema: Boolean = false): Unit =
    writeLock(name).synchronized {
      if (!exists(name)) replace(name, df)
      else {
        require(!manifestLines(name, currentVersion(name))
          .exists(_.startsWith("#bucketed=")),
          s"table $name is bucketed — bucketed tables are replace-only " +
            "(a plain append would break the bucket invariant)")
        val parts = partitionColumns(name)
        // a zero-row partitionBy write emits NO parquet files (only
        // _SUCCESS), so recording it in the manifest would make every
        // later load() fail schema inference on the empty segment dir —
        // skip empty appends for partitioned tables entirely (flat
        // empty writes still emit a schema-bearing part file and are
        // harmless, so they keep the cheap no-action path)
        if (parts.isEmpty || !df.isEmpty) {
          val v = currentVersion(name)
          val cur = recordedSchema(name, v).getOrElse(load(name).schema)
          val curTypes = cur.fields
            .map(f => f.name -> f.dataType.catalogString).toMap
          // Partition columns carry NO type on disk — the value is the
          // path string (cell=42/), and the recorded type is whatever
          // hive inference read back from those strings. A writer that
          // computed the value as bigint (or a numeric string) while
          // inference pinned int produces the IDENTICAL layout, so a
          // type mismatch there is not a retype; reads stay pinned to
          // the recorded schema either way. The exemption is not
          // type-BLIND though: every batch value must round-trip into
          // the recorded type, else the pinned read would silently
          // null it (cell=x7/ under a recorded int) — that stays a
          // loud failure. Data columns — whose parquet encoding DOES
          // carry the type — get the hard check.
          df.schema.fields
            .filter(f => curTypes.contains(f.name))
            .foreach { f =>
              val want = curTypes(f.name)
              val got = f.dataType.catalogString
              if (want != got) {
                require(parts.contains(f.name),
                  s"append to $name would RETYPE column ${f.name}: " +
                    s"table has $want, batch has $got — schema " +
                    "evolution only adds nullable columns")
                // round-trip through the STRING domain — the value the
                // partition path actually stores: a typed try_cast would
                // coerce (9.5 → int 9) while the path writes "9.5" and
                // the pinned read nulls it
                val bad = df.filter(col(f.name).isNotNull &&
                  col(f.name).cast("string").try_cast(want).isNull).count()
                require(bad == 0L,
                  s"append to $name: $bad value(s) of partition " +
                    s"column ${f.name} (batch type $got) do not parse " +
                    s"as the recorded type $want — the pinned read " +
                    "would null them; align the batch")
              }
            }
          val newCols = df.schema.fields
            .filterNot(f => curTypes.contains(f.name))
          val missing = cur.fieldNames
            .filterNot(df.schema.fieldNames.contains).toSeq
          val (aligned, evolvedHeader) =
            if (newCols.isEmpty && missing.isEmpty)
              (df.select(cur.fieldNames.map(col).toSeq: _*),
                manifestLines(name, v).find(_.startsWith("#schema=")))
            else {
              require(evolveSchema,
                s"append to $name changes the schema (adds " +
                  s"[${newCols.map(_.name).mkString(",")}], omits " +
                  s"[${missing.mkString(",")}]) — pass " +
                  "evolveSchema = true to evolve, or align the batch")
              val evolved = org.apache.spark.sql.types.StructType(
                cur.fields ++ newCols.map(_.copy(nullable = true)))
              val sel = evolved.fields.toSeq.map(f =>
                if (df.columns.contains(f.name)) col(f.name)
                else lit(null).cast(f.dataType).as(f.name))
              (df.select(sel: _*),
                if (newCols.isEmpty) // pure-omission batch: no evolution
                  manifestLines(name, v).find(_.startsWith("#schema="))
                else Some(s"#schema=${evolved.json}"))
            }
          val segs = segments(name, v)
          if (segs.length >= CompactThreshold)
            // the rewrite materializes the (possibly evolved) schema
            // into the files themselves — no header needed afterwards
            replace(name, load(name).unionByName(aligned,
              allowMissingColumns = true), parts)
          else {
            val next = v + 1
            publish(name, segs :+ writeSegment(name, next, aligned, parts),
              next, partHeader(parts) ++ evolvedHeader.toSeq)
          }
        }
      }
    }

  /** Idempotent append: rows whose `key` already exists are dropped, so
    * a crash-replayed batch cannot double-append (the append-only
    * analogue of the key-idempotent MERGEs). In-batch duplicates
    * collapse to the first row by `tieBreak` ordering (arbitrary when
    * empty). Write cost is O(new rows); the existing table is only
    * READ for the anti-join. */
  def appendUnique(name: String, df: DataFrame, key: Seq[String],
      tieBreak: Seq[Column] = Nil, evolveSchema: Boolean = false): Unit = {
    val dedup = MergeOps.dedupBy(df, key, tieBreak)
    // the lock spans the anti-join read as well as the write: two
    // concurrent appendUniques could otherwise both miss a key in the
    // snapshot and both append it
    writeLock(name).synchronized {
      if (!exists(name)) replace(name, dedup)
      else {
        // persist: the emptiness probe AND the segment write both
        // consume this plan — unpersisted, the dedup + anti-join (and
        // the table read under it) would execute twice per append
        val fresh = dedup.join(load(name).select(key.map(col): _*),
          key, "left_anti").persist()
        try {
          // skip empty appends entirely: no segment, no version churn
          if (!fresh.isEmpty) append(name, fresh, evolveSchema)
        } finally fresh.unpersist()
      }
    }
  }

  /** Key-replacing MERGE: rows of `df` SUPERSEDE existing rows with the
    * same `key`; all other rows are kept (in-batch duplicates collapse
    * arbitrarily). Unlike [[appendUnique]] the incoming row wins — the
    * re-verdict path for tables whose rows can legitimately be
    * corrected (a quality-rejected document re-sent with fixed
    * content). Cost is a full snapshot rewrite — O(table), the same
    * order as the derived-table recomputes that accompany it on the
    * ingest path; the production swap is a Delta/Iceberg MERGE with
    * file-level pruning. */
  def upsert(name: String, df: DataFrame, key: Seq[String]): Unit = {
    val dedup = df.dropDuplicates(key)
    // the lock spans the read as well as the rewrite, like appendUnique
    writeLock(name).synchronized {
      if (!exists(name)) replace(name, dedup)
      else {
        require(!manifestLines(name, currentVersion(name))
          .exists(_.startsWith("#bucketed=")),
          s"table $name is bucketed — upsert would drop its bucket spec")
        val kept = load(name).join(dedup.select(key.map(col): _*),
          key, "left_anti")
        replace(name, kept.unionByName(dedup), partitionColumns(name))
      }
    }
  }

  /** OPTIMIZE — small-file compaction. Rewrites the table as ONE
    * segment of ~`targetRowsPerFile`-row files (per partition directory
    * for partitioned layouts, with rows clustered so each directory is
    * written by as few tasks as hold its rows). The append path bounds
    * SEGMENT count (manifest length) but not file count or size — a
    * streaming flow committing small batches accretes many tiny files,
    * and at 100 TB tiny files are the classic scan killer (per-file
    * open/footer cost dominates; row-group pruning loses leverage).
    * Content is byte-identical by construction (same rows, fresh
    * layout); the version flip is atomic like every publish, and
    * superseded versions age out via the usual vacuum horizon. The
    * production swap is Delta OPTIMIZE / Iceberg rewrite_data_files.
    * Bucketed tables are refused: their file count IS the bucket spec.
    * Cost: one full read + write of the table — schedule off-peak like
    * any OPTIMIZE. */
  def compact(name: String, targetRowsPerFile: Long = 1L << 20): Unit =
    writeLock(name).synchronized {
      require(exists(name), s"table $name does not exist")
      require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
      require(!manifestLines(name, currentVersion(name))
        .exists(_.startsWith("#bucketed=")),
        s"table $name is bucketed — its layout is fixed by the bucket " +
          "spec; re-publish with replaceBucketed to change it")
      val parts = partitionColumns(name)
      val df = load(name)
      val rows = df.count()
      val nFiles = math.max(1L,
        (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
      val shaped =
        if (parts.isEmpty) df.repartition(nFiles)
        else df.repartition(nFiles, parts.map(col): _*)
      replace(name, shaped, parts)
    }

  /** Targeted row deletion — `DELETE FROM name WHERE predicate`, the
    * third mutation class next to append and upsert (the reference
    * never deletes — README.md:47 — but a data-governance request,
    * GDPR erasure being the canonical one, needs it as a first-class
    * table op). Returns the number of rows deleted.
    *
    * Scale shape (the Delta/Iceberg copy-on-write DELETE): the
    * predicate is evaluated PER SEGMENT, and only segments that
    * actually contain matches are rewritten — the match probe is a
    * predicate-pushed count whose parquet min/max row-group stats let
    * untouched segments answer from footers, so a targeted delete on
    * a 100 TB table rewrites O(affected segments), not O(table).
    * Untouched segment directories are carried into the new manifest
    * byte-identical. SQL DELETE semantics: rows where the predicate
    * is NULL survive. A segment whose every row matches is DROPPED
    * from the manifest rather than rewritten (a zero-row partitioned
    * write emits no readable files). No-match deletes publish nothing
    * (version unchanged). Prior versions still time-travel to the
    * deleted rows until vacuumed, and `changesBetween` across the
    * delete reports them as `_op = delete` via its rewriting-
    * transition diff. Bucketed tables are refused (replace-only, like
    * compact). If a delete empties the table entirely, an empty FLAT
    * segment with the full recorded schema is published (the
    * partition layout carries no information at zero rows; the next
    * replace re-establishes it). */
  def deleteWhere(name: String, predicate: Column): Long =
    writeLock(name).synchronized {
      require(exists(name), s"table $name does not exist")
      val v = currentVersion(name)
      val lines = manifestLines(name, v)
      require(!lines.exists(_.startsWith("#bucketed=")),
        s"table $name is bucketed — bucketed tables are replace-only")
      val parts = partitionColumns(name)
      val segs = segments(name, v)
      val dirs = segs.map(s => tdir(name).resolve(s).toString)
      // pin one schema across segments, same rule as readDirs: the
      // recorded (evolved) superset when present, else the first
      // segment's — per-segment hive inference must not diverge
      val pinned = recordedSchema(name, v)
        .getOrElse(spark.read.parquet(dirs.head).schema)
      val keep = !org.apache.spark.sql.functions
        .coalesce(predicate, lit(false))
      var deleted = 0L
      val rewritten = segs.zip(dirs).zipWithIndex.flatMap {
        case ((seg, dir), i) =>
          val sdf = spark.read.schema(pinned).parquet(dir)
          val hits = sdf.filter(
            org.apache.spark.sql.functions.coalesce(predicate, lit(false)))
            .count()
          if (hits == 0L) Some(seg) // untouched — carried as-is
          else {
            deleted += hits
            val kept = sdf.filter(keep)
            if (kept.isEmpty) None // fully-deleted segment: drop
            else {
              val next = v + 1
              val newSeg = s"d${next}_$i"
              val w = kept.write.mode("overwrite")
              (if (parts.nonEmpty) w.partitionBy(parts: _*) else w)
                .parquet(tdir(name).resolve(newSeg).toString)
              Some(newSeg)
            }
          }
      }
      if (deleted > 0L) {
        val headers = lines.filter(_.startsWith("#"))
        if (rewritten.nonEmpty)
          publish(name, rewritten, v + 1, headers)
        else {
          // table emptied: one empty flat segment carrying the full
          // schema (partition columns become ordinary columns)
          val empty = spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], pinned)
          publish(name, Seq(writeSegment(name, v + 1, empty)), v + 1,
            headers.filterNot(_.startsWith("#partitionBy=")))
        }
      }
      deleted
    }

  /** True iff `toV`'s manifest EXTENDS `fromV`'s — the append-only
    * chain whose version diff is pure inserts readable from the delta
    * segments alone. */
  private def appendOnlyBetween(name: String, fromV: Int, toV: Int): Boolean = {
    val fl = manifestLines(name, fromV)
    val tl = manifestLines(name, toV)
    !(fl ++ tl).exists(_.startsWith("#bucketed=")) &&
      tl.filterNot(_.startsWith("#"))
        .startsWith(fl.filterNot(_.startsWith("#")))
  }

  /** True iff the transition `fromV` → current is append-only (pure
    * inserts, readable from the delta segments alone) — the probe an
    * incremental view maintainer uses to choose between a delta fold
    * and a full resync (false also when `fromV` has been vacuumed). */
  def appendOnlySince(name: String, fromV: Int): Boolean =
    versionExists(name, fromV) &&
      appendOnlyBetween(name, fromV, currentVersion(name))

  /** Incremental replication: bring `dst` (hosted by this store) up to
    * `src`'s current snapshot by applying the version diff since the
    * last sync — the CDC CONSUMER side of [[changesBetween]], the
    * downstream-materialization pattern (Delta CDF reader feeding a
    * derived table). Returns the src version synced to.
    *
    * Cost: an append-only hop applies O(delta) via the idempotent
    * appendUnique (a crash between apply and the sync-log commit
    * replays harmlessly); a rewriting hop applies changed-key
    * anti-join + union — O(dst + change), never O(history). A sync
    * whose base version has been vacuumed falls back to one full
    * resync and is caught up from there on. `key` must be a unique
    * key of `src`, as in [[changesBetween]]. */
  def syncTo(src: String, dst: String, key: Seq[String]): Int = {
    val flow = s"_sync_${src}__$dst"
    val cur = version(src)
    require(cur >= 0, s"table $src does not exist")
    val last = lastCommitted(flow).toInt
    if (!exists(dst) || last < 0) {
      replace(dst, loadVersion(src, cur), partitionColumns(src))
      commitBatch(flow, cur)
      return cur
    }
    if (last == cur) return cur
    // base version aged out of the vacuum horizon → one full resync
    if (!Files.exists(tdir(src).resolve(s"m$last")))
      replace(dst, loadVersion(src, cur), partitionColumns(src))
    else if (appendOnlyBetween(src, last, cur))
      // evolveSchema: an evolved source's delta legitimately carries
      // columns dst has not seen yet — replication must follow the
      // evolution, not reject it
      appendUnique(dst, changesBetween(src, last, cur, key).drop("_op"),
        key, evolveSchema = true)
    else {
      val changes = changesBetween(src, last, cur, key).persist()
      try {
        val changedKeys = changes.select(key.map(col): _*)
        val kept = load(dst).join(changedKeys, key, "left_anti")
        val upserts = changes.filter(col("_op") =!= "delete").drop("_op")
        // allowMissingColumns: dst may predate src's schema evolution
        replace(dst, kept.unionByName(upserts, allowMissingColumns = true),
          partitionColumns(dst))
      } finally changes.unpersist()
    }
    commitBatch(flow, cur)
    cur
  }

  /** VACUUM — retention-horizon GC of superseded versions. Keeps the
    * newest `keepVersions` manifests (the current one always included)
    * and every segment any kept manifest references; deletes older
    * manifests and now-unreferenced segment directories.
    *
    * Reader-snapshot contract: a DataFrame bound to any version inside
    * the horizon stays fully readable (its segments are all referenced
    * by a kept manifest — appends only ever EXTEND the previous segment
    * list, so a newer manifest covers every older one back to the last
    * replace). Readers bound to versions OUTSIDE the horizon lose their
    * files — the same contract as Delta/Iceberg VACUUM, where the
    * retention period must exceed the longest-running reader. The
    * per-table write lock serializes vacuum against concurrent version
    * transitions.
    *
    * Without this, a long-running deployment leaks storage linearly in
    * commits (every replace() retires a whole snapshot segment). Flows
    * call it on whatever cadence suits the table's churn. */
  def vacuum(name: String, keepVersions: Int = 2): Unit =
    writeLock(name).synchronized {
      val cur = currentVersion(name)
      require(cur >= 0, s"table $name does not exist")
      require(keepVersions >= 1, "must keep at least the current version")
      val floor = math.max(0, cur - keepVersions + 1)
      val live = (floor to cur).flatMap(v => segments(name, v)).toSet
      val dir = tdir(name)
      val stream = Files.list(dir)
      try {
        stream.forEach { p =>
          val n = p.getFileName.toString
          val staleManifest = n.startsWith("m") &&
            n.drop(1).forall(_.isDigit) && n.drop(1).toInt < floor
          val staleSegment = Files.isDirectory(p) && !live.contains(n)
          if (staleManifest) {
            // a superseded bucketed version also owns a session-catalog
            // entry; drop it with the manifest so the catalog never
            // lists tables whose files this GC is about to delete
            new String(Files.readAllBytes(p)).split("\n")
              .find(_.startsWith("#bucketed=")).foreach(h =>
                spark.sql("DROP TABLE IF EXISTS " +
                  h.stripPrefix("#bucketed=")))
            Files.delete(p)
          }
          else if (staleSegment) deleteRecursively(p)
        }
      } finally stream.close()
    }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively) finally s.close()
    }
    Files.delete(p)
  }

  // -- per-flow batch commit log: replay protection for foreachBatch ---
  // Structured Streaming re-runs a failed micro-batch with the same
  // batchId; flows consult this log and skip already-committed ids, the
  // library-level equivalent of Delta's txn-id dedup. (A crash between
  // the last table swap and the commit write re-applies one batch; the
  // flows' merges are key-idempotent, so the reapplication is a no-op —
  // same contract as the reference's at-least-once + dup-tolerant
  // consumers, inventario/main.go:91-93.)

  def lastCommitted(flow: String): Long = {
    val f = Paths.get(root, "_commits", flow)
    if (Files.exists(f)) new String(Files.readAllBytes(f)).trim.toLong else -1L
  }

  def commitBatch(flow: String, batchId: Long): Unit = {
    val d = Paths.get(root, "_commits")
    Files.createDirectories(d)
    Files.write(d.resolve(flow), batchId.toString.getBytes)
  }
}
