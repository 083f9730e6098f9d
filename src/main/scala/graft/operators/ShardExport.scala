package graft.operators

import graft.functions.TextFns
import graft.sources.Tables.table
import graft.tables.TableStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Training-shard EXPORT — the materialization step downstream of the
 * packing manifest (r15 verdict ask #6): x100 maps every W-token
 * training window to the document spans that fill it; this writer
 * actually BUILDS those windows and writes them as per-shard parquet
 * files — the artifact a trainer's data loader mmaps, completing the
 * manifest tier (x100 manifest → x117 epoch order → x119 loader
 * schedule → exported shards).
 *
 * Lifecycle: build-once per corpus version ([[StoredIndexes]]
 * fingerprint cache, kind `graft-shard-export` in the bench `build`
 * section), stored table `shards(lang, window_id, n_tok, tokens,
 * w_md5)` hive-partitioned by `lang` — each shard (= lang stream,
 * matching x100's shard-local packing contract) is its own directory
 * of files, which is exactly the per-shard file layout a loader
 * schedule addresses. Every window carries its md5 content key so
 * shard integrity is checkable without re-reading the corpus.
 *
 * Shape: ONE manifest-driven join. The manifest is recomputed from
 * [[PackingQueries.manifestOf]] (the SAME definition x100 hash-pins —
 * the stored shards cannot drift from the declared manifest), joined
 * back to the corpus on doc_id, each manifest row slices its span
 * out of the document's token array, and one (lang, window_id)
 * aggregate concatenates the slices in doc_id order (windows are
 * ≤ W tokens by construction, so the grouped state is bounded).
 *
 * 100 TB: this is the one operator in the packing tier that MUST move
 * the token payload — it is the export job. The payload moves twice,
 * both times usefully: once hash-partitioned by doc_id into the
 * manifest join (full arrays, each exactly once — the slice projects
 * W-bounded segments in the same stage, so the per-(doc,window)
 * duplication never hits a shuffle), once as W-bounded segments into
 * the window aggregate. Everything else (offsets, window ids, spans)
 * is the manifest's narrow arithmetic. The final repartition by lang
 * makes each shard directory contiguous files; at real scale the
 * shard key widens to (lang, file-group) exactly as x100 documents,
 * which also bounds the per-task window count.
 */
object ShardExport {

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, StoredIndexes.Cached[TableStore]]()

  def forDir(spark: SparkSession, dir: String): TableStore =
    StoredIndexes.versioned(cache, dir, "documents.parquet",
      "graft-shard-export") { root =>
      val store = new TableStore(spark, root)
      store.replace("shards",
        windowRows(spark, dir).repartition(col("lang")),
        partitionBy = Seq("lang"))
      store
    }

  /** The materialized windows (lang, window_id, n_tok, tokens, w_md5)
    * — the BUILD plan; probes read the stored table. */
  private[operators] def windowRows(s: SparkSession, d: String): DataFrame = {
    val docs = table(s, d, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("ts"))
    val seg = PackingQueries.manifestOf(s, d)
      .join(docs, Seq("doc_id"))
      .select(col("lang"), col("window_id"), col("doc_id"),
        slice(col("ts"), col("start_tok") + 1,
          (col("end_tok") - col("start_tok")).cast("int")).as("sg"))
    seg.groupBy("lang", "window_id")
      .agg(flatten(transform(sort_array(collect_list(
        struct(col("doc_id"), col("sg")))),
        x => x.getField("sg"))).as("tokens"))
      .select(col("lang"), col("window_id"),
        size(col("tokens")).cast("long").as("n_tok"),
        col("tokens"),
        md5(concat_ws(" ", col("tokens"))).as("w_md5"))
  }
}
