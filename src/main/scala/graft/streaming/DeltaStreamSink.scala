package graft.streaming

import graft.log.WriteMode
import graft.DeltaTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured Streaming → Delta-table sink.
  *
  * The reference is batch-only (SURVEY.md §2.f); this is the post-parity
  * streaming extension: a `foreachBatch` sink that commits each micro-batch
  * as a Delta log entry, giving exactly-once table-level semantics (each
  * batch is one atomic commit; a replayed batch overwrites rather than
  * duplicates in complete mode).
  *
  * At cluster scale the same shape holds: the windowed aggregation state is
  * distributed by group key, the sink write is a normal partitioned
  * executor-side parquet job, and only the log commit is driver-side.
  */
object DeltaStreamSink {

  /** Probed raw schema of the events files under `dir` (glob
    * `events*.parquet`). Streaming file sources need an explicit schema;
    * hardcoding one broke every streaming runner when the fixture's `ts`
    * changed physical type (INT64 ns → TIMESTAMP µs), so probe the actual
    * files with a batch read and normalize `ts` afterwards via
    * [[graft.QueryLib.tsToNtz]] / [[graft.QueryLib.tsToTimestamp]].
    */
  def eventsRawSchema(spark: SparkSession, dir: String): StructType =
    spark.read.parquet(s"$dir/events*.parquet").schema

  /** Write each micro-batch's (complete-mode) result as the new content of
    * the Delta table at `tableDir`: the first batch creates, later batches
    * overwrite — old versions stay time-travelable.
    */
  def completeModeSink(tableDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val t = DeltaTable.forPath(tableDir)
    if (t.version < 0) t.write(batch)
    else t.write(batch, mode = WriteMode.Overwrite)
  }

  /** events → 1-hour tumbling-window counts/sums per event_type, streamed
    * with Trigger.AvailableNow in complete output mode (all input is
    * processed, so the final table equals the batch aggregation — no
    * watermark-truncation of trailing windows).
    */
  def runHourlyAggregate(spark: SparkSession, sfDir: String, tableDir: String): Unit = {
    val raw = eventsRawSchema(spark, sfDir)
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    val stream = spark.readStream
      .schema(raw)
      // glob (not the bare file path) so the inferred basePath is the
      // parent DIRECTORY — a single-file path fails partition inference
      .option("basePath", sfDir)
      .parquet(s"$sfDir/events*.parquet")
      // ntz: the raw timestamps are wall-clock naive; keeping NTZ
      // end-to-end writes tz-free parquet identical to the oracle's
      .withColumn("ts", graft.QueryLib.tsToNtz(raw("ts").dataType))
    val agg = stream
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(completeModeSink(tableDir) _)
      .start()
    q.awaitTermination()
  }

  /** events → SLIDING windows (2-hour length, 1-hour slide): every event
    * lands in exactly two overlapping windows — the smoothing shape
    * dashboards and rate monitors stream with; tumbling (q32) is the
    * degenerate slide == length case. Same complete-mode
    * Trigger.AvailableNow drive as [[runHourlyAggregate]], state ∝
    * (windows × groups), two state rows per event's hour.
    */
  def runSlidingAggregate(spark: SparkSession, sfDir: String,
      tableDir: String): Unit = {
    val raw = eventsRawSchema(spark, sfDir)
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    val stream = spark.readStream
      .schema(raw)
      .option("basePath", sfDir)
      .parquet(s"$sfDir/events*.parquet")
      .withColumn("ts", graft.QueryLib.tsToNtz(raw("ts").dataType))
    val agg = stream
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(completeModeSink(tableDir) _)
      .start()
    q.awaitTermination()
  }

  /** events → 1-hour tumbling windows under an event-time WATERMARK in
    * append output mode: a window row is emitted exactly once, when the
    * watermark (max event time − `delay`) passes its end — the
    * late-data-bounded streaming shape a continuous deployment runs
    * (complete mode re-emits everything per batch and keeps all state
    * forever; a watermark lets Spark evict finalized windows). Windows the
    * final watermark never passes are retained as state and NOT emitted —
    * the oracle is the batch aggregation restricted to
    * `window_end <= max(ts) − delay`.
    */
  def runWatermarkedHourlyAggregate(spark: SparkSession, sfDir: String,
      tableDir: String, delay: String = "30 minutes"): Unit = {
    val raw = eventsRawSchema(spark, sfDir)
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    val stream = spark.readStream
      .schema(raw)
      .option("basePath", sfDir)
      .parquet(s"$sfDir/events*.parquet")
      // watermarks require TimestampType; session tz is UTC, so the naive
      // micros become the same wall-clock instants and the output window
      // start converts back to NTZ losslessly
      .withColumn("ts", graft.QueryLib.tsToTimestamp(raw("ts").dataType))
    val agg = stream
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("cnt"), col("sum_value"))
    val q = agg.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(appendSink(tableDir) _)
      .start()
    q.awaitTermination()
  }

  /** Generic streaming append sink: commit every micro-batch of `df` as a
    * Delta append at `tableDir` (exactly the `foreachBatch` →
    * `DeltaTable.write(append)` composition SURVEY.md §2.f sketches).
    */
  def appendSink(tableDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val t = DeltaTable.forPath(tableDir)
    if (t.version < 0) t.write(batch) else t.write(batch, mode = WriteMode.Append)
  }

  /** Exactly-once streaming append sink: each micro-batch commits together
    * with a `txn(appId, batchId)` marker, and a batch the table has
    * already recorded is SKIPPED — so foreachBatch re-deliveries (Spark
    * retries a batch whose sink failed mid-flight) cannot duplicate rows.
    * This is the SetTransaction idempotence handshake Delta sinks use.
    */
  def idempotentAppendSink(tableDir: String, appId: String)(
      batch: DataFrame, batchId: Long): Unit = {
    DeltaTable.forPath(tableDir).writeWithTxn(batch, appId, batchId)
  }

  /** Streams events through the idempotent sink and DELIVERS EVERY BATCH
    * TWICE (simulating foreachBatch replay after a sink failure): the txn
    * handshake must keep exactly one copy.
    */
  def runIdempotentStream(spark: SparkSession, sfDir: String, tableDir: String): Unit = {
    val raw = eventsRawSchema(spark, sfDir)
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    val stream = spark.readStream
      .schema(raw)
      .option("basePath", sfDir)
      .parquet(s"$sfDir/events*.parquet")
      .withColumn("ts", graft.QueryLib.tsToNtz(raw("ts").dataType))
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        idempotentAppendSink(tableDir, "graft-events-app")(b, id)
        idempotentAppendSink(tableDir, "graft-events-app")(b, id) // replay
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming upsert sink: MERGE each micro-batch into the Delta table by
    * `keys`. For stateful operators that re-emit a group's updated
    * cumulative row on every batch the group appears in, append semantics
    * would duplicate keys across batches — upsert makes the last emission
    * win, so the final table is correct under ANY batch split.
    */
  def upsertSink(tableDir: String, keys: Seq[String])(batch: DataFrame, batchId: Long): Unit = {
    val t = DeltaTable.forPath(tableDir)
    if (t.version < 0) t.write(batch)
    else t.merge(batch.sparkSession, batch, keys)
  }

  /** Stream-stream inner join with an event-time range condition: for
    * every purchase, the clicks by the same user within the hour AFTER it.
    * Both sides are unbounded streams; Spark buffers each side's rows in
    * keyed state and the WATERMARKS plus the time-range condition bound
    * how much state is retained (left rows older than watermark−1h can
    * never match a future right row and are evicted) — the canonical
    * funnel/attribution join a clickstream pipeline runs continuously.
    */
  def runStreamStreamJoin(spark: SparkSession, sfDir: String, tableDir: String,
      delay: String = "30 minutes"): Unit = {
    val raw = eventsRawSchema(spark, sfDir)
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    def side(eventType: String, prefix: String) = {
      val s = spark.readStream
        .schema(raw)
        .option("basePath", sfDir)
        .parquet(s"$sfDir/events*.parquet")
        .withColumn("ts", graft.QueryLib.tsToTimestamp(raw("ts").dataType))
        .filter(col("event_type") === eventType)
        .withWatermark("ts", delay)
      s.select(col("user_id").as(s"${prefix}_user"),
        col("event_id").as(s"${prefix}_id"), col("ts").as(s"${prefix}_ts"))
    }
    val purchases = side("purchase", "p")
    val clicks = side("click", "c")
    val joined = purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") &&
          col("c_ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("p_user").as("user_id"),
        col("p_id").as("purchase_id"), col("c_id").as("click_id"))
    val q = joined.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(appendSink(tableDir) _)
      .start()
    q.awaitTermination()
  }

  /** Stream-stream LEFT OUTER join with watermark-driven null emission —
    * the attribution shape ([[runStreamStreamJoin]]'s inner join can
    * never answer "which purchases had NO click"): matched pairs emit as
    * they join; an UNMATCHED left row emits null-padded only once the
    * watermark proves no match can still arrive (event-time watermark
    * past `p_ts + window + delay`), which is when its state evicts. The
    * final no-data micro-batch (on by default) advances the watermark
    * after input exhausts, so a bounded replay flushes everything
    * eligible.
    *
    * Scale shape: state is bounded by delay + window per Spark's outer
    * stream-stream join contract; both sides shuffle on the equality key
    * only. The sink keeps `purchase_ts` so consumers can cut at a
    * watermark-safe horizon (rows closer to max event time than
    * delay + window are still legitimately in state, not dropped).
    */
  def runStreamStreamLeftJoin(spark: SparkSession, sfDir: String,
      tableDir: String, delay: String = "30 minutes"): Unit = {
    val raw = eventsRawSchema(spark, sfDir)
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    def side(eventType: String, prefix: String) = {
      val s = spark.readStream
        .schema(raw)
        .option("basePath", sfDir)
        .parquet(s"$sfDir/events*.parquet")
        .withColumn("ts", graft.QueryLib.tsToTimestamp(raw("ts").dataType))
        .filter(col("event_type") === eventType)
        .withWatermark("ts", delay)
      s.select(col("user_id").as(s"${prefix}_user"),
        col("event_id").as(s"${prefix}_id"), col("ts").as(s"${prefix}_ts"))
    }
    val purchases = side("purchase", "p")
    val clicks = side("click", "c")
    val joined = purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") &&
          col("c_ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"),
        "leftOuter")
      .select(col("p_user").as("user_id"),
        col("p_id").as("purchase_id"),
        col("p_ts").as("purchase_ts"),
        col("c_id").as("click_id"))
    val q = joined.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(appendSink(tableDir) _)
      .start()
    q.awaitTermination()
  }

  /** Streaming exact deduplication: `dropDuplicates` on the id keeps a
    * keyed state store across micro-batches, so a duplicate arriving in a
    * LATER batch than its original is still dropped — the streaming
    * counterpart of X1's batch exact dedup, and the shape a continuous
    * ingestion pipeline dedups with.
    *
    * The input directory holds TWO copies of the events file and
    * `maxFilesPerTrigger=1` forces them into separate micro-batches, so
    * every duplicate crosses a batch boundary — append-sink correctness
    * therefore proves the state survives between batches. State here is
    * unbounded by design (exact dedup over all history); the bounded
    * variant is `dropDuplicatesWithinWatermark`, which this corpus can't
    * use honestly (its duplicates arrive later than any realistic
    * watermark delay would retain).
    */
  def runStreamingDedup(spark: SparkSession, sfDir: String, tableDir: String): Unit = {
    val raw = eventsRawSchema(spark, sfDir)
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    val inDir = java.nio.file.Files.createTempDirectory("graft-dedup-in-")
    Seq("events_a.parquet", "events_b.parquet").foreach { name =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"), inDir.resolve(name))
    }
    val deduped = spark.readStream
      .schema(raw)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$inDir/*.parquet")
      .withColumn("ts", graft.QueryLib.tsToNtz(raw("ts").dataType))
      .dropDuplicates("event_id")
    val q = deduped.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(appendSink(tableDir) _)
      .start()
    q.awaitTermination()
  }

  /** STREAM–STATIC join: the event stream enriches against a Delta TABLE
    * (dimension) batch-side — Structured Streaming re-plans the static
    * side per micro-batch, so a dimension update between batches is
    * visible to the next trigger without restarting the stream. The
    * static side is a log-backed graft scan (no listing), and at scale
    * the join broadcasts the dimension exactly like its batch twin.
    */
  def runStreamStaticJoin(spark: SparkSession, sfDir: String,
      staticDir: String, tableDir: String): Unit = {
    val raw = eventsRawSchema(spark, sfDir)
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    val dim = DeltaTable.forPath(staticDir).toDF(spark)
      .select(col("c_custkey"), col("c_mktsegment"))
    val stream = spark.readStream
      .schema(raw)
      .option("basePath", sfDir)
      .parquet(s"$sfDir/events*.parquet")
    val agg = stream
      .join(dim, dim("c_custkey") === stream("user_id") + 1)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(completeModeSink(tableDir) _)
      .start()
    q.awaitTermination()
  }

  /** Streaming MERGE-upsert sink (the CDC-apply shape): each micro-batch
    * is reduced to its latest row per key, resolved against the CURRENT
    * table state (a matched target row NEWER than the arriving one wins —
    * out-of-order batches cannot regress a key), and merged. The final
    * table is exactly "latest event per key over the whole stream"
    * regardless of batch boundaries or arrival order.
    *
    * Scale shape: the per-batch reduction is a batch-sized window; the
    * resolution semi-join touches only files owning matched keys (merge's
    * own phase-1 pruning), and the merge rewrites only those files. No
    * unbounded streaming state — the TABLE is the state, which is what
    * lets this run forever where mapGroupsWithState would grow with keys.
    */
  def upsertLatestSink(tableDir: String)(batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    def latestPerKey(df: DataFrame): DataFrame =
      df.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    val reduced = latestPerKey(batch)
    val t = DeltaTable.forPath(tableDir)
    if (t.version < 0) { t.write(reduced); return }
    val resolved = latestPerKey(
      t.toDF(spark)
        .join(reduced.select("user_id"), Seq("user_id"), "left_semi")
        .unionByName(reduced))
    t.merge(spark, resolved, Seq("user_id"))
  }

  /** Drive [[upsertLatestSink]] over the events fixture split into two
    * single-file micro-batches (`maxFilesPerTrigger=1`), so later batches
    * genuinely UPDATE keys the first batch inserted — the upsert path is
    * exercised, not just the initial load.
    */
  def runStreamingUpsert(spark: SparkSession, sfDir: String, tableDir: String): Unit = {
    val raw = eventsRawSchema(spark, sfDir)
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    val inDir = java.nio.file.Files.createTempDirectory("graft-upsert-in-")
    val norm = spark.read.schema(raw).parquet(s"$sfDir/events.parquet")
      .withColumn("ts", graft.QueryLib.tsToNtz(raw("ts").dataType))
    // arbitrary halves (even/odd ids): the sink's latest-wins resolution
    // must produce the same table whichever half lands first
    norm.filter(pmod(col("event_id"), lit(2)) === 0).coalesce(1)
      .write.parquet(s"$inDir/half_a")
    norm.filter(pmod(col("event_id"), lit(2)) === 1).coalesce(1)
      .write.parquet(s"$inDir/half_b")
    val q = spark.readStream
      .schema(norm.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$inDir/half_*/*.parquet")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(upsertLatestSink(tableDir) _)
      .start()
    q.awaitTermination()
  }

  /** Streaming CRAWL INGESTION with inline near-dup dedup — the
    * composition a crawl pipeline actually runs: each micro-batch drops
    * (1) docs near-dup against HISTORY via the persisted MinHash
    * signature store (banded LSH; the store is scanned, never shuffled —
    * X157's contract) and (2) intra-batch near-dups (the larger id of any
    * verified pair loses), then appends ONLY the novel docs to the corpus
    * table and ONLY their signatures to the store — each as its own
    * SetTransaction-idempotent commit, so a replayed micro-batch (a
    * foreachBatch redelivery after a crash) re-commits nothing on either
    * table and corpus/store stay row-for-row consistent.
    *
    * Scale shape: everything batch-sized broadcasts; history participates
    * only through the signature store (10⁹ docs ≈ 0.5 TB of signatures
    * standing in for 100 TB of text) and both appends are blind — no
    * rewrite, no unbounded streaming state; the TABLES are the state.
    *
    * The store must exist (create it once with `minHashStoreInit`, an
    * empty first batch is fine): batch-0-creates would turn a redelivered
    * first batch into a silent duplicate store.
    */
  def crawlIngestSink(corpusDir: String, storeDir: String, appId: String,
      idCol: String = "doc_id", textCol: String = "text",
      estThreshold: Double = 0.7)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val store = DeltaTable.forPath(storeDir)
    val props = store.tableProperties
    val n = props.getOrElse("graft.minhash.n", throw new IllegalStateException(
      s"$storeDir is not a minhash store — minHashStoreInit it before streaming")).toInt
    val numHashes = props("graft.minhash.numHashes").toInt
    val intraLosers = graft.operators.Dedup
      .minHashLshPairs(batch, idCol, textCol, n = n, numHashes = numHashes,
        threshold = estThreshold)
      .select(col("b").as(idCol)).distinct()
    val histLosers = graft.operators.Dedup
      .minHashStoreDedup(spark, storeDir, batch, idCol, textCol,
        estThreshold = estThreshold)
      .select(col("b").as(idCol)).distinct()
    val novel = batch.join(intraLosers.unionByName(histLosers).distinct(),
      Seq(idCol), "left_anti")
    DeltaTable.forPath(corpusDir).writeWithTxn(novel, s"$appId:corpus", batchId)
    store.writeWithTxn(
      graft.operators.Dedup.sigOf(novel, idCol, textCol, n, numHashes),
      s"$appId:sig", batchId)
  }

  /** Drive [[crawlIngestSink]] over three document micro-batches with
    * planted cross-batch and intra-batch duplicates
    * (`maxFilesPerTrigger=1`; slice files get strictly increasing
    * modification times so arrival order is the crawl order).
    */
  def runStreamingCrawlIngest(spark: SparkSession, sfDir: String,
      corpusDir: String, storeDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    graft.operators.Dedup.minHashStoreInit(spark, storeDir, docs.limit(0),
      "doc_id", "text")
    val inDir = java.nio.file.Files.createTempDirectory("graft-crawl-in-")
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    def copies(slice: DataFrame, offset: Long) =
      slice.withColumn("doc_id", col("doc_id") + offset)
    // deterministic id-range predicates (limit() has no order): 10 planted
    // history dups of slice a in b, 10 of b in c, plus one synthetic
    // INTRA-batch twin pair in c whose text exists nowhere else
    val a = docs.filter(col("doc_id") % 3 === 0)
    val b = docs.filter(col("doc_id") % 3 === 1)
      .unionByName(copies(a.filter(col("doc_id") < 30), 1000000L))
    import spark.implicits._
    val twinText = Seq.fill(40)("uniquecrawltoken").zipWithIndex
      .map { case (w, i) => s"$w$i" }.mkString(" ")
    val twins = Seq(5000000L, 5000001L)
      .map(id => (id, twinText, "xx", "synthetic", twinText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val c = docs.filter(col("doc_id") % 3 === 2)
      .unionByName(copies(docs.filter(col("doc_id") % 3 === 1 &&
        col("doc_id") < 30), 2000000L))
      .unionByName(twins.select(docs.columns.map(col): _*))
    Seq("a" -> a, "b" -> b, "c" -> c).zipWithIndex.foreach {
      case ((name, df), i) =>
        df.coalesce(1).write.parquet(s"$inDir/slice_$name")
        // FileStreamSource admits oldest-first: pin the crawl order
        new java.io.File(s"$inDir/slice_$name").listFiles()
          .foreach(_.setLastModified(1000000L * (i + 1)))
    }
    val q = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$inDir/slice_*/*.parquet")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(crawlIngestSink(corpusDir, storeDir, "crawl-demo") _)
      .start()
    q.awaitTermination()
  }

  /** BOUNDED-state streaming dedup: `dropDuplicatesWithinWatermark` keeps
    * a key's dedup state only until the watermark passes its event time
    * plus the delay, so the state store is proportional to the watermark
    * WINDOW, not the stream's full key history — the difference between an
    * ingestion pipeline that runs for a day and one that runs for a year
    * (plain `dropDuplicates`, q61, grows state forever by design).
    *
    * Harness: batch 1 is the whole events table; batch 2 re-delivers the
    * last-50-minute slice — inside the 1-hour watermark when batch 2 runs,
    * so every duplicate both crosses a batch boundary AND lands in the
    * retained window, and must be dropped by state that survived batch 1 —
    * plus a genuinely-new shifted copy of the slice (id + 10^7, ts + 2 h)
    * that must be kept. Deterministic by construction: nothing re-delivered
    * is older than the watermark (late rows would be dropped by the
    * watermark itself, not by dedup state).
    *
    * @return the LAST reported state-store row count — the bounded-state
    *         evidence: ~(2 h of events), orders of magnitude below the
    *         stream's distinct-key count after eviction
    */
  def runStreamingDedupWithinWatermark(spark: SparkSession, sfDir: String,
      tableDir: String): Long = {
    val raw = eventsRawSchema(spark, sfDir)
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    val inDir = java.nio.file.Files.createTempDirectory("graft-wmdedup-in-")
    // normalize to TimestampType up front: the staged parts then carry a
    // µs timestamp regardless of the fixture's physical ts type, and the
    // slice/shift arithmetic is plain interval arithmetic
    val ev = spark.read.schema(raw).parquet(s"$sfDir/events.parquet")
      .withColumn("ts", graft.QueryLib.tsToTimestamp(raw("ts").dataType))
    val maxTs = ev.agg(max("ts")).first().getTimestamp(0)
    val slice = ev.filter(col("ts") > lit(maxTs) - expr("INTERVAL 50 MINUTES"))
    val shifted = slice.select((col("event_id") + 10000000L).as("event_id"),
      (col("ts") + expr("INTERVAL 2 HOURS")).as("ts"), col("user_id"),
      col("event_type"), col("value"), col("props"))
    def onePart(df: DataFrame, dest: java.nio.file.Path, modMillis: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-wm-part-")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).filter(p =>
        p.getFileName.toString.endsWith(".parquet")).findFirst().get
      java.nio.file.Files.copy(part, dest)
      // the file source batches in modification-time order; pin it so the
      // full table is always batch 1 and the re-delivery batch 2
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(modMillis))
    }
    val t0 = System.currentTimeMillis() - 120000
    onePart(ev, inDir.resolve("events_a.parquet"), t0)
    onePart(slice.union(shifted), inDir.resolve("events_b.parquet"), t0 + 60000)
    val deduped = spark.readStream
      // the staged parts were written from the normalized frame above, so
      // their schema is ev's (ts already TimestampType — watermark-ready);
      // back to NTZ at the sink like the other runners
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$inDir/*.parquet")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val q = deduped.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(appendSink(tableDir) _)
      .start()
    q.awaitTermination()
    q.recentProgress.reverseIterator
      .flatMap(_.stateOperators.headOption)
      .map(_.numRowsTotal)
      .nextOption()
      .getOrElse(-1L)
  }

  /** Custom stateful streaming: per-user gap sessionization with
    * `flatMapGroupsWithState` — state is distributed by the group key and
    * survives across micro-batches. Each batch a user appears in emits the
    * user's UPDATED cumulative (n_events, n_sessions) row, and the upsert
    * sink replaces the previous one, so the final table holds exactly one
    * correct row per user even when AvailableNow splits the input across
    * micro-batches (`maxFilesPerTrigger`). Cross-batch arrival is assumed
    * time-ordered per user (file-source batches arrive in modification-time
    * order); same 30-min gap rule as the batch q34 query.
    */
  def runStatefulSessionize(spark: SparkSession, sfDir: String, tableDir: String,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    import spark.implicits._
    val raw = eventsRawSchema(spark, sfDir)
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    val reader = spark.readStream
      .schema(raw)
      .option("basePath", sfDir)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$sfDir/events*.parquet")
      .select(col("user_id"), col("event_id"),
        graft.QueryLib.tsToMicros(raw("ts").dataType).as("us"))
      .as[(Long, Long, Long)]

    def sessionize(userId: Long, rows: Iterator[(Long, Long, Long)],
        state: GroupState[(Long, Long, Long)]): Iterator[(Long, Long, Long)] = {
      val sorted = rows.map(r => (r._3, r._2)).toArray.sorted // (us, event_id)
      var (nEvents, nSessions, lastUs) =
        state.getOption.getOrElse((0L, 0L, Long.MinValue))
      sorted.foreach { case (us, _) =>
        if (lastUs == Long.MinValue || us - lastUs > 1800000000L) nSessions += 1
        lastUs = us
        nEvents += 1
      }
      state.update((nEvents, nSessions, lastUs))
      Iterator.single((userId, nEvents, nSessions))
    }

    val sessions = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(sessionize)
      .toDF("user_id", "n_events", "n_sessions")

    val q = sessions.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(upsertSink(tableDir, Seq("user_id")) _)
      .start()
    q.awaitTermination()
  }
}
