package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Versioned parquet table manager — a minimal MVCC store mirroring the
 * reference's mutable collections (insert/update only, never delete —
 * README.md:47) with the snapshot semantics flows need.
 *
 * Layout: `root/<table>/v<N>/` parquet dirs plus a `_current` pointer
 * file. `load` binds a DataFrame to the version current AT CALL TIME;
 * `replace` materializes the new snapshot into `v<N+1>` and atomically
 * flips the pointer. Superseded versions are RETAINED, so lazy plans
 * captured before a replace stay readable for the rest of the batch —
 * the same reader-snapshot guarantee Delta/Iceberg give via their
 * transaction log (which is what this store becomes in production;
 * version GC is their `VACUUM`).
 *
 * Single-writer per table (one foreachBatch sink), many readers.
 */
final class TableStore(spark: SparkSession, root: String) {
  Files.createDirectories(Paths.get(root))

  private def tdir(name: String): Path = Paths.get(root, name)
  private def pointer(name: String): Path = tdir(name).resolve("_current")

  private def currentVersion(name: String): Int =
    if (Files.exists(pointer(name)))
      new String(Files.readAllBytes(pointer(name))).trim.toInt
    else -1

  def exists(name: String): Boolean = currentVersion(name) >= 0

  /** Snapshot read: bound to the version current at call time. */
  def load(name: String): DataFrame = {
    val v = currentVersion(name)
    require(v >= 0, s"table $name does not exist")
    spark.read.parquet(tdir(name).resolve(s"v$v").toString)
  }

  def init(name: String, df: DataFrame): Unit = replace(name, df)

  /** Atomically publish a new snapshot. The DataFrame is fully
    * materialized into the new version dir BEFORE the pointer flips;
    * concurrent readers see old-or-new, never partial. */
  def replace(name: String, df: DataFrame): Unit = {
    val next = currentVersion(name) + 1
    val dest = tdir(name).resolve(s"v$next")
    df.write.mode("overwrite").parquet(dest.toString)
    val tmp = tdir(name).resolve("_current_tmp")
    Files.write(tmp, next.toString.getBytes)
    Files.move(tmp, pointer(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Append rows to an insert-only table (notifications, rejections).
    * Creates the table on first append. */
  def append(name: String, df: DataFrame): Unit =
    if (!exists(name)) replace(name, df)
    else replace(name, load(name).unionByName(df))

  /** Idempotent append: rows whose `key` already exists are dropped, so
    * a crash-replayed batch cannot double-append (the append-only
    * analogue of the key-idempotent MERGEs). */
  def appendUnique(name: String, df: DataFrame, key: Seq[String]): Unit =
    if (!exists(name)) replace(name, df.dropDuplicates(key))
    else {
      val cur = load(name)
      val fresh = df.dropDuplicates(key)
        .join(cur.select(key.map(org.apache.spark.sql.functions.col): _*),
          key, "left_anti")
      replace(name, cur.unionByName(fresh))
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
