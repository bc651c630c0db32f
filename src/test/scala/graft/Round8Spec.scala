package graft

import org.apache.spark.sql.functions._

/** Round-8 contracts: materialized int8 codes tables (X66's 1-byte
  * candidate scan) and their stats-in-commit-metadata round trip.
  */
class Round8Spec extends SparkSuite {

  private def explainOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("int8 codes table: stats round-trip through commit metadata") {
    val emb = QueryLib.embX2(spark, sfDir)
    val dir = tempDir("codes-meta")
    val t = operators.Similarity.writeInt8CodesTable(
      spark, emb, "vec_id", "embedding", dir)
    // schema is (vec_id, codes array<tinyint>) — 1 byte/dim on disk
    val codes = t.toDF(spark)
    assert(codes.schema("codes").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = false) ||
      codes.schema("codes").dataType.simpleString == "array<tinyint>")
    assert(codes.count() === emb.count())
    // the commit carries the affine stats under the declared key
    val extra = t.history.head._2.extra
    val node = extra(operators.Similarity.Int8StatsKey)
    val dims = emb.select(size(col("embedding"))).first().getInt(0)
    assert(node.get("mn").size() === dims)
    assert(node.get("span").size() === dims)
  }

  test("quantized rerank over the codes table finds the identical twin") {
    val emb = QueryLib.embX2(spark, sfDir)
    val got = operators.Similarity.quantizedRerankTopKFromCodes(
      spark, QueryLib.embCodesDir(spark, sfDir), emb,
      emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 1)
    // embX2 = embeddings + identical twin at vec_id+10000: the twin
    // encodes identically, survives any candidateK, reranks to cos 1.0
    val rows = got.orderBy("query_id").collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") === r.getAs[Long]("query_id") + 10000L)
      assert(math.abs(r.getAs[Double]("cos_sim") - 1.0) < 1e-12)
    }
  }

  test("dropDuplicatesWithinWatermark: re-delivery dropped, state bounded") {
    val sf = "/root/testdata/sf0.01"
    val dir = tempDir("wm-dedup")
    val stateRows = streaming.DeltaStreamSink
      .runStreamingDedupWithinWatermark(spark, sf, dir)
    val raw = streaming.DeltaStreamSink.eventsRawSchema(spark, sf)
    val ev = spark.read.schema(raw).parquet(s"$sf/events.parquet")
      .withColumn("ts", QueryLib.tsToTimestamp(raw("ts").dataType))
    val nEvents = ev.count()
    val maxTs = ev.agg(max("ts")).first().getTimestamp(0)
    val nSlice = ev.filter(col("ts") > lit(maxTs) - expr("INTERVAL 50 MINUTES")).count()
    val got = DeltaTable.forPath(dir).toDF(spark)
    // one copy of events + the genuinely-new shifted slice; the
    // re-delivered slice (inside the watermark, across a batch boundary)
    // was dropped by surviving state
    assert(got.count() === nEvents + nSlice, s"slice=$nSlice")
    assert(got.select("event_id").distinct().count() === nEvents + nSlice)
    // the bounded-state claim: after watermark eviction the store holds
    // ~(watermark window) of keys, not the stream's full key history —
    // plain dropDuplicates would sit at nEvents + nSlice forever
    assert(stateRows >= 0L, "no state-operator progress reported")
    assert(stateRows < nEvents / 10,
      s"state not bounded: $stateRows rows for $nEvents distinct keys")
  }

  test("stage-1 candidate plan scans only 1-byte codes, no float vectors") {
    val emb = QueryLib.embX2(spark, sfDir)
    // queries as a local relation so the ONLY table scan in the candidate
    // plan is the codes table — any float-vector ReadSchema is a failure
    val qRows = emb.filter(col("vec_id") < 3).collect().toSeq
    val queries = spark.createDataFrame(
      spark.sparkContext.parallelize(qRows), emb.schema)
    val cands = operators.Similarity.quantizedCandidates(
      spark, QueryLib.embCodesDir(spark, sfDir), queries,
      "vec_id", "embedding", candidateK = 10)
    val plan = explainOf(cands)
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).toList
    assert(readSchemas.nonEmpty, plan.take(600))
    assert(readSchemas.exists(_.contains("tinyint")),
      s"candidate scan must read int8 codes: $readSchemas")
    assert(!readSchemas.exists(l => l.contains("float") || l.contains("double")),
      s"candidate scan must never read a full-width vector column: $readSchemas")
  }

  // ---- q50 pruner memoization (VERDICT r6 #3 / r7 #7) ----

  test("listFiles pruner runs once per (snapshot, filter-set) across q50's six scans") {
    import graft.sources.GraftFileIndex
    // warm the fixture tables so their one-time graft writes don't count
    SparkEntry.queries("q50_q5_multijoin")(spark, sfDir).collect()

    val df = SparkEntry.queries("q50_q5_multijoin")(spark, sfDir)
    val before = GraftFileIndex.listingComputations.get()
    df.collect()
    val firstRun = GraftFileIndex.listingComputations.get() - before
    // six snapshots, and per snapshot at most two distinct filter-sets
    // (the optimizer's partition-only ask + the scan's full ask); anything
    // above that means repeated asks are re-walking per-file stats
    assert(firstRun <= 12, s"expected <= 2 evaluations per table scan, got $firstRun")
    assert(firstRun >= 6, s"six tables must each be pruned at least once, got $firstRun")
    // re-executing the SAME plan re-asks the index; the memo must answer
    df.collect()
    val secondRun = GraftFileIndex.listingComputations.get() - before - firstRun
    assert(secondRun == 0,
      s"re-running the same q50 plan recomputed the pruner $secondRun times")
  }

  test("listFiles memo: identical asks compute once, different filters recompute") {
    val d = tempDir("memo")
    val t = DeltaTable.forPath(d).write(
      spark.read.parquet(s"$sfDir/nation.parquet").repartition(4))
    val df = t.toDF(spark).filter(col("n_nationkey") > 10)
    val before = graft.sources.GraftFileIndex.listingComputations.get()
    df.collect()
    df.collect() // same plan instance: lazy selectedPartitions + memo
    val n = graft.sources.GraftFileIndex.listingComputations.get() - before
    assert(n <= 2, s"one filter-set on one snapshot evaluated $n times")
  }
}
