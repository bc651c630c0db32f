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
    *
    * The append-only contract is ENFORCED at construction (delta-spark
    * parity): any log entry carrying `remove` actions — overwrite,
    * copy-on-write delete/update/merge, OPTIMIZE, RESTORE — aborts,
    * because the removed files still exist on disk and the file stream
    * would serve their rows; a rewrite's new files would additionally
    * stream as duplicates. `ignoreChanges = true` opts out with delta's
    * documented semantics: the stream may then deliver reprocessed or
    * deleted rows. Commits made AFTER construction are the operator's
    * contract, as with delta's source.
    */
  def appendOnlyStream(spark: SparkSession, tableDir: String,
      ignoreChanges: Boolean = false,
      options: Map[String, String] = Map.empty): DataFrame = {
    val t = DeltaTable.forPath(tableDir)
    if (!ignoreChanges) {
      // full JSON replay, not the checkpoint fast path: a checkpoint
      // snapshot compacts history and would hide earlier removes
      val full = graft.log.DeltaLog.load(t.logLoc)
      full.entries.foreach { case (v, e) =>
        // merge-on-read mutations emit NO removes (the touched file is
        // re-added with a deletionVector ref) but their dead rows still
        // stream — guard both shapes
        val dved = e.adds.count(a => graft.sources.DeletionVectors.refOf(a).isDefined)
        if (e.removes.nonEmpty || dved > 0) {
          val op = e.commitInfos.headOption.map(_.operation).getOrElse("UNKNOWN")
          val what =
            if (e.removes.nonEmpty) s"removed ${e.removes.size} file(s)"
            else s"attached deletion vectors to $dved file(s)"
          throw new IllegalStateException(
            s"appendOnlyStream requires an append-only table, but version $v " +
              s"($op) $what: removed/DV'd rows still stream and rewrites " +
              "duplicate rows. Use changesBetween for change feeds, or " +
              "ignoreChanges=true to accept reprocessing.")
        }
      }
    }
    spark.readStream
      .schema(t.schema)
      .option("basePath", tableDir)
      // data files only — never the transaction log or staging leftovers
      .option("pathGlobFilter", "*.parquet")
      // caller-supplied SOURCE options (maxFilesPerTrigger etc.) — sink
      // options can't reach the source, it is built right here
      .options(options)
      .parquet(tableDir)
  }
}
