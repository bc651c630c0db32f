package graft.operators

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism floor for CPU-heavy per-document stages.
  *
  * The text operators spend ~10–100 µs of CPU per document (shingling,
  * window hashing, per-token aggregation) — orders of magnitude more than
  * the bytes they read. Their parallelism, though, is inherited from the
  * INPUT's split count, and parquet cannot split below row-group
  * granularity: a compacted table, a single crawl shard, or any
  * small-file input runs the whole CPU-bound stage on a handful of tasks
  * no matter how many cores the cluster has (measured on the sf0.1
  * bench: the q85 window-hash stage was ONE task carrying 1.8 s of its
  * 1.8 s wall time).
  *
  * `spread` hash-repartitions the (narrow: id + text) input up to the
  * session's shuffle width ONLY when the input has fewer than half that
  * many partitions. At warehouse scale the input has thousands of splits
  * and this is a no-op — the guard is what makes the helper safe to put
  * in every operator: a 100 TB corpus never pays a gratuitous full-text
  * shuffle, a coalesced input never serializes the operator.
  */
object Par {

  def spread(df: DataFrame, keyCol: String): DataFrame =
    spread(df, Seq(col(keyCol)))

  def spread(df: DataFrame, keyCols: Seq[Column]): DataFrame = {
    // streaming plans cannot be probed with .rdd; their micro-batch
    // parallelism is the trigger's concern, not this helper's
    if (df.isStreaming) return df
    val want = df.sparkSession.sessionState.conf.numShufflePartitions
    // getNumPartitions builds the physical RDD DAG (driver-side, no job)
    val have = df.rdd.getNumPartitions
    if (have * 2 >= want) df else df.repartition(want, keyCols: _*)
  }
}
