package graft.streaming

import graft.DeltaTable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Delta table as a Structured Streaming SOURCE.
  *
  * For append-only tables (the streaming-ingest case) the table's data
  * directory IS a valid file-stream source: every commit only adds new
  * parquet files, so Spark's built-in file source — which discovers and
  * checkpoints new files per micro-batch — yields exactly the committed
  * rows. This reuses Spark's battle-tested file tracking instead of a
  * custom MicroBatchStream.
  *
  * Non-append tables (delete/overwrite/restore rewrite files) need
  * version-aware change feeds — that is the batch
  * [[graft.DeltaTable.changesBetween]] API.
  *
  * Merge-on-read deletes (deletion vectors) don't rewrite data files, so
  * they cannot DUPLICATE rows here — and `_graft_dv/` sidecars are
  * invisible to the stream (Spark's file index skips `_`-prefixed dirs) —
  * but already-streamed rows later marked dead are NOT retracted and a
  * DV'd file's dead rows still stream on first discovery: this source is
  * for append-only ingest; DV-aware feeds go through `changesBetween`.
  */
object DeltaStreamSource {

  /** readStream over an append-only graft table. The schema is pinned from
    * the current log (file-stream sources require an explicit schema).
    */
  def appendOnlyStream(spark: SparkSession, tableDir: String): DataFrame = {
    val t = DeltaTable.forPath(tableDir)
    spark.readStream
      .schema(t.schema)
      .option("basePath", tableDir)
      // data files only — never the transaction log or staging leftovers
      .option("pathGlobFilter", "*.parquet")
      .parquet(tableDir)
  }
}
