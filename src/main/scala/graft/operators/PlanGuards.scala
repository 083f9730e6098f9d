package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Shared plan-shape guards for query builders. */
private[graft] object PlanGuards {

  /** Broadcast-if-small: an unconditional `broadcast()` hint OVERRIDES
    * Spark's size checks, so hinting a side that grows with the corpus
    * (a key→nation projection, a vocabulary table) becomes an
    * executor-OOM at 100×. This consults the optimizer's size estimate
    * (parquet footer stats — driver-side metadata, no job) and only
    * hints broadcast under the threshold; above it the plan falls back
    * to a shuffle join, which AQE may still convert at runtime if the
    * post-filter side turns out small. */
  def broadcastIfSmall(df: DataFrame,
      thresholdBytes: Long = 256L << 20): DataFrame =
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= thresholdBytes)
      broadcast(df)
    else df
}
