package graft

import org.apache.spark.sql.functions._

/** `format("graft")` surface: DataFrame reader/writer, SQL DDL, and the
  * exactly-once streaming sink.
  */
class DataSourceSpec extends SparkSuite {
  import spark.implicits._

  private def nation = spark.read.parquet(s"$sfDir/nation.parquet")

  test("read: format(graft).load equals toDF, including partitioned + versionAsOf") {
    val d = tempDir("ds-read")
    val t = DeltaTable.forPath(d)
      .write(nation, partitionBy = Some(Seq("n_regionkey")))
      .write(nation.withColumn("n_nationkey", col("n_nationkey") + 100))
    assertSameRows(spark.read.format("graft").load(d), t.toDF(spark))
    assertSameRows(spark.read.format("graft").option("versionAsOf", 0).load(d),
      nation)
    // pushed filters still prune through the relation
    assert(spark.read.format("graft").load(d)
      .filter(col("n_regionkey") === 0).count() == 10)
  }

  test("read: mapped and DV snapshots are rejected, not misread") {
    val d = tempDir("ds-guard")
    val t = DeltaTable.forPath(d).write(nation).renameColumn("n_name", "nn")
    assert(intercept[IllegalArgumentException](
      spark.read.format("graft").load(d).count()).getMessage.contains("column mapping"))
    val d2 = tempDir("ds-guard-dv")
    DeltaTable.forPath(d2).write(nation)
      .deleteMergeOnRead(spark, Some(col("n_nationkey") === 1))
    assert(intercept[IllegalArgumentException](
      spark.read.format("graft").load(d2).count()).getMessage.contains("deletion vectors"))
  }

  test("write: df.write.format(graft) commits through the log") {
    val d = tempDir("ds-write")
    // the standard writer API — partitionBy arrives via Spark's
    // __partition_columns option
    nation.write.format("graft").partitionBy("n_regionkey").save(d)
    val t = DeltaTable.forPath(d)
    assert(t.version == 0L && t.partitionColumns == Seq("n_regionkey"))
    nation.withColumn("n_nationkey", col("n_nationkey") + 100)
      .write.format("graft").mode("append").save(d)
    assert(DeltaTable.forPath(d).toDF(spark).count() == 50)
    // overwrite replaces; time travel still reaches v0/v1
    nation.limit(5).write.format("graft").mode("overwrite").save(d)
    assert(DeltaTable.forPath(d).toDF(spark).count() == 5)
    assert(DeltaTable.forPath(d).loadAsVersion(1L).toDF(spark).count() == 50)
  }

  test("SQL DDL: CREATE TABLE ... USING graft LOCATION") {
    val d = tempDir("ds-sql")
    DeltaTable.forPath(d).write(nation)
    spark.sql(s"CREATE TABLE graft_sql_t USING graft LOCATION '$d'")
    try {
      assert(spark.sql("SELECT count(*) FROM graft_sql_t").as[Long].head() == 25L)
      assert(spark.sql(
        "SELECT n_name FROM graft_sql_t WHERE n_nationkey = 7").as[String].head()
        == nation.filter(col("n_nationkey") === 7).select("n_name").as[String].head())
    } finally spark.sql("DROP TABLE graft_sql_t")
  }

  test("streaming sink: writeStream.format(graft) commits exactly once") {
    val src = tempDir("ds-sink-src")
    DeltaTable.forPath(src).write(nation).write(
      nation.withColumn("n_nationkey", col("n_nationkey") + 100))
    val out = tempDir("ds-sink-out")
    val ckpt = tempDir("ds-sink-ckpt")
    def runOnce(): Unit = {
      val q = graft.streaming.DeltaStreamSource
        // SOURCE option: genuinely forces one file per micro-batch
        .appendOnlyStream(spark, src, options = Map("maxFilesPerTrigger" -> "1"))
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(out)
      q.awaitTermination()
    }
    runOnce()
    val t = DeltaTable.forPath(out)
    assert(t.toDF(spark).count() == 50)
    // multiple micro-batches really happened: one txn-marked append per
    // source file (query-id app, batch 0 and 1)
    val txns = t.dlog.entries.values.flatMap(_.actions).collect {
      case x: graft.log.Txn => x
    }.toSeq
    assert(txns.size == 2 && txns.map(_.version).sorted == Seq(0L, 1L),
      s"expected 2 batch commits, got $txns")
    assert(txns.map(_.appId).distinct.size == 1 &&
      txns.head.appId.startsWith("graft-sink:"))
    // a REPLAYED batch id under the same app is skipped by the txn
    // handshake (what checkpoint recovery re-delivery hits)
    val replayed = t.writeWithTxn(nation, txns.head.appId, 1L)
    assert(replayed.version == t.version, "replayed batch must be a no-op")
    // a SECOND full run over the same checkpoint re-delivers nothing
    runOnce()
    assert(DeltaTable.forPath(out).toDF(spark).count() == 50)
  }

  // ---- readStream.format("graft"): the log-versioned source ----

  private def nationDF = spark.read.parquet(s"$sfDir/nation.parquet")

  private def runGraftStream(src: String, out: String, ckpt: String,
      options: Map[String, String] = Map.empty): Unit = {
    val reader = spark.readStream.format("graft").options(options)
    val q = reader.load(src)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(out)
    q.awaitTermination()
  }

  test("versioned source: initial snapshot, per-commit tail, exactly-once restart") {
    val src = tempDir("vsrc"); val out = tempDir("vsrc-out"); val ckpt = tempDir("vsrc-ckpt")
    var t = DeltaTable.forPath(src).write(nationDF).write(nationDF)
    runGraftStream(src, out, ckpt)
    assert(DeltaTable.forPath(out).toDF(spark).count() == 2 * nationDF.count())
    // two commits land after the first run; the restart must deliver
    // EXACTLY those versions' adds, replayed from the offset log
    t = t.write(nationDF)
    t = t.write(nationDF.limit(5).coalesce(1))
    runGraftStream(src, out, ckpt)
    val outT = DeltaTable.forPath(out)
    assert(outT.toDF(spark).count() == 3 * nationDF.count() + 5)
    // and a third run with nothing new re-delivers nothing
    runGraftStream(src, out, ckpt)
    assert(DeltaTable.forPath(out).toDF(spark).count() == 3 * nationDF.count() + 5)
  }

  test("versioned source: a non-append commit mid-stream fails loudly") {
    val src = tempDir("vsrc-del"); val out = tempDir("vsrc-del-out"); val ckpt = tempDir("vsrc-del-ckpt")
    DeltaTable.forPath(src).write(nationDF.coalesce(1)).write(nationDF.coalesce(1))
    runGraftStream(src, out, ckpt)
    // a copy-on-write delete lands AFTER the stream's offset — the next
    // tail batch must abort (construction-time checks cannot see this)
    DeltaTable.forPath(src).delete(spark, Some(col("n_nationkey") === 1))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      runGraftStream(src, out, ckpt))
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("append-only")), e.getMessage)
    // ignoreChanges opts into reprocessing on a FRESH checkpoint
    val out2 = tempDir("vsrc-del-out2"); val ckpt2 = tempDir("vsrc-del-ckpt2")
    runGraftStream(src, out2, ckpt2, Map("ignoreChanges" -> "true"))
    assert(DeltaTable.forPath(out2).toDF(spark).count() ==
      DeltaTable.forPath(src).toDF(spark).count())
  }

  test("versioned source: column-mapped tables are rejected at stream start") {
    val src = tempDir("vsrc-map")
    DeltaTable.forPath(src).write(nationDF).renameColumn("n_name", "nn")
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft").load(src)
        .writeStream.format("memory").queryName("vsrc_map_reject")
        .option("checkpointLocation", tempDir("vsrc-map-ckpt"))
        .start()
      q.awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage).exists(_.contains("column mapping"))),
      e.getMessage)
  }

  test("versioned source offsets round-trip through JSON") {
    import graft.streaming.GraftSourceOffset
    val o = GraftSourceOffset(42L)
    assert(GraftSourceOffset.fromJson(o.json) == o)
    assert(GraftSourceOffset.of(o) == 42L)
  }

  test("versioned source: maxVersionsPerTrigger bounds each tail batch") {
    val src = tempDir("vsrc-rate"); val out = tempDir("vsrc-rate-out")
    val ckpt = tempDir("vsrc-rate-ckpt")
    val five = nationDF.limit(5).coalesce(1)
    var t = DeltaTable.forPath(src).write(five)
    runGraftStream(src, out, ckpt) // initial snapshot: versions [0,0]
    (1 to 4).foreach(_ => t = t.write(five)) // versions 1..4 land
    runGraftStream(src, out, ckpt, Map("maxVersionsPerTrigger" -> "2"))
    val outT = DeltaTable.forPath(out)
    assert(outT.toDF(spark).count() == 5 * five.count())
    // the 4-version backlog was split into 2-version micro-batches:
    // the sink committed once per batch, so >= 2 commits landed in run 2
    assert(outT.version >= 2L,
      s"expected the backlog split across batches, got versions ${outT.versions}")
  }

  test("batch readChangeFeed equals changesBetween, bounds validated") {
    val d = tempDir("cdf-batch")
    var t = DeltaTable.forPath(d).write(nationDF.limit(5).coalesce(1)) // v0
    t = t.write(nationDF.limit(3).coalesce(1)) // v1
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") === 1)) // v2
    val viaOption = spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "1").load(d)
    assertSameRows(viaOption, t.changesBetween(spark, 0L, 2L))
    // MoR delete rows are exact: version 2 carries `delete` frames only
    assert(viaOption.filter(col("_commit_version") === 2L)
      .select("_change_type").distinct().collect().map(_.getString(0)).toSeq
      == Seq("delete"))
    // endingVersion bounds the range; timestamps resolve asymmetrically
    val bounded = spark.read.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", "1").option("endingVersion", "1").load(d)
    assert(bounded.select("_commit_version").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    val ts1 = t.history.reverse(1)._2.timestamp
    val viaTs = spark.read.format("graft").option("readChangeFeed", "true")
      .option("startingTimestamp", ts1.toString)
      .option("endingTimestamp", ts1.toString).load(d)
    assertSameRows(viaTs, bounded)
    // option misuse fails loudly
    intercept[Exception](spark.read.format("graft")
      .option("readChangeFeed", "true").load(d).collect())
    intercept[Exception](spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .option("versionAsOf", "1").load(d).collect())
  }

  test("writer mergeSchema option evolves the schema on append") {
    val d = tempDir("merge-schema")
    nationDF.write.format("graft").mode("append").save(d)
    val widened = nationDF.withColumn("n_flag",
      (col("n_nationkey") % 2 === 0))
    // without the option a schema mismatch throws (delta parity)
    intercept[Exception](
      widened.write.format("graft").mode("append").save(d))
    widened.write.format("graft").mode("append")
      .option("mergeSchema", "true").save(d)
    val t = DeltaTable.forPath(d)
    assert(t.schema.fieldNames.contains("n_flag"))
    val out = t.toDF(spark)
    assert(out.count() == 2 * nationDF.count())
    // pre-evolution rows are null-backfilled
    assert(out.filter(col("n_flag").isNull).count() == nationDF.count())
  }

  test("writer txnAppId/txnVersion makes batch writes idempotent") {
    val d = tempDir("txn-write")
    def writeOnce(v: Long): Unit =
      nationDF.limit(5).coalesce(1).write.format("graft").mode("append")
        .option("txnAppId", "jobA").option("txnVersion", v.toString).save(d)
    writeOnce(1L); writeOnce(1L) // the retry is recognized and skipped
    assert(DeltaTable.forPath(d).toDF(spark).count() == 5)
    writeOnce(2L) // a NEW version commits
    assert(DeltaTable.forPath(d).toDF(spark).count() == 10)
    intercept[Exception](nationDF.write.format("graft").mode("append")
      .option("txnAppId", "jobA").save(d)) // version without app id: rejected
    intercept[Exception](nationDF.write.format("graft").mode("overwrite")
      .option("txnAppId", "jobA").option("txnVersion", "9").save(d))
  }

  test("versioned source: maxFilesPerTrigger splits the backlog by file budget") {
    val src = tempDir("vsrc-files"); val out = tempDir("vsrc-files-out")
    val ckpt = tempDir("vsrc-files-ckpt")
    val five = nationDF.limit(5).coalesce(1)
    var t = DeltaTable.forPath(src).write(five)
    runGraftStream(src, out, ckpt) // initial snapshot
    (1 to 4).foreach(_ => t = t.write(five)) // 4 versions x 1 file each
    runGraftStream(src, out, ckpt, Map("maxFilesPerTrigger" -> "1"))
    val outT = DeltaTable.forPath(out)
    assert(outT.toDF(spark).count() == 5 * five.count())
    // 1 file per trigger => the 4-version backlog landed as 4 sink commits
    assert(outT.version >= 4L,
      s"expected one sink commit per file-capped batch, got ${outT.versions}")
    // an oversized single commit still goes through (at least one version
    // is always admitted)
    t = t.write(nationDF.limit(10).coalesce(2)) // 2 files in one version
    runGraftStream(src, out, ckpt, Map("maxFilesPerTrigger" -> "1"))
    assert(DeltaTable.forPath(out).toDF(spark).count() == 5 * five.count() + 10)
  }

  test("streaming CDF: rate limits split a 100-version backlog into bounded batches") {
    // the r13-verdict ask: prove the CDF path shares the append path's
    // admission control — a 100-version change-feed backlog must drain as
    // file-capped micro-batches, never one giant batch
    val src = tempDir("cdf-rate"); val out = tempDir("cdf-rate-out")
    val ckpt = tempDir("cdf-rate-ckpt")
    val one = nationDF.limit(1).coalesce(1)
    var t = DeltaTable.forPath(src).write(one) // v0
    (1 to 99).foreach(_ => t = t.write(one)) // versions 1..99, 1 file each
    runGraftStream(src, out, ckpt, Map("readChangeFeed" -> "true",
      "startingVersion" -> "0", "maxFilesPerTrigger" -> "10"))
    val outT = DeltaTable.forPath(out)
    val rows = outT.toDF(spark)
    assert(rows.count() == 100) // one insert frame per version
    assert(rows.select("_commit_version").distinct().count() == 100)
    // 10-file batches over 100 single-file versions => >= 10 sink commits
    assert(outT.version >= 9L,
      s"CDF backlog not split by maxFilesPerTrigger: ${outT.versions}")
    // the version cap bounds the CDF tail identically
    (1 to 6).foreach(_ => t = t.write(one))
    val before = DeltaTable.forPath(out).version
    runGraftStream(src, out, ckpt, Map("readChangeFeed" -> "true",
      "startingVersion" -> "0", "maxVersionsPerTrigger" -> "2"))
    val after = DeltaTable.forPath(out)
    assert(after.toDF(spark).count() == 106)
    assert(after.version >= before + 3,
      s"CDF tail not split by maxVersionsPerTrigger: ${after.versions}")
  }

  test("versioned source: startingVersion/startingTimestamp skip the snapshot") {
    val src = tempDir("vsrc-sv")
    var t = DeltaTable.forPath(src).write(nationDF) // v0: 25 rows
    Thread.sleep(10)
    val tsBeforeV1 = System.currentTimeMillis()
    Thread.sleep(10)
    t = t.write(nationDF.limit(5).coalesce(1)) // v1: 5 rows
    // startingVersion=1: the first batch is v1's CHANGES, not a snapshot
    val out1 = tempDir("vsrc-sv-out1")
    runGraftStream(src, out1, tempDir("vsrc-sv-ckpt1"),
      Map("startingVersion" -> "1"))
    assert(DeltaTable.forPath(out1).toDF(spark).count() == 5)
    // startingTimestamp between the commits resolves to the EARLIEST
    // version at/after it — same five rows
    val out2 = tempDir("vsrc-sv-out2")
    runGraftStream(src, out2, tempDir("vsrc-sv-ckpt2"),
      Map("startingTimestamp" -> tsBeforeV1.toString))
    assert(DeltaTable.forPath(out2).toDF(spark).count() == 5)
    // "latest": nothing pre-existing streams; a post-start commit does
    val out3 = tempDir("vsrc-sv-out3"); val ckpt3 = tempDir("vsrc-sv-ckpt3")
    runGraftStream(src, out3, ckpt3, Map("startingVersion" -> "latest"))
    assert(DeltaTable.forPath(out3).version < 0L ||
      DeltaTable.forPath(out3).toDF(spark).count() == 0L)
    t = t.write(nationDF.limit(3).coalesce(1)) // v2 lands after run 1
    runGraftStream(src, out3, ckpt3, Map("startingVersion" -> "latest"))
    assert(DeltaTable.forPath(out3).toDF(spark).count() == 3)
    // both options together: rejected
    intercept[Exception](runGraftStream(src, tempDir("x"), tempDir("y"),
      Map("startingVersion" -> "0", "startingTimestamp" -> "12345")))
  }

  test("versioned source: ignoreDeletes passes remove-only commits, not rewrites") {
    val src = tempDir("vsrc-igdel"); val out = tempDir("vsrc-igdel-out")
    val ckpt = tempDir("vsrc-igdel-ckpt")
    val df = nationDF.coalesce(1)
    var t = DeltaTable.forPath(src)
      .write(df.filter(col("n_nationkey") < 10), partitionBy = Some(Seq("n_regionkey")))
    t = t.write(df.filter(col("n_nationkey") >= 10))
    runGraftStream(src, out, ckpt, Map("ignoreDeletes" -> "true"))
    assert(DeltaTable.forPath(out).toDF(spark).count() == nationDF.count())
    // a partition-boundary delete drops whole files: remove-only commit,
    // tolerated (deleted rows are NOT retracted from the sink)
    t = t.delete(spark, Some(col("n_regionkey") === 0 && col("n_nationkey") < 10))
    t = t.write(df.limit(3)) // and the tail keeps streaming
    runGraftStream(src, out, ckpt, Map("ignoreDeletes" -> "true"))
    assert(DeltaTable.forPath(out).toDF(spark).count() == nationDF.count() + 3)
    // a REWRITING delete (kept rows re-staged) still aborts under
    // ignoreDeletes — only ignoreChanges accepts reprocessing
    t = t.delete(spark, Some(col("n_nationkey") === 20))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      runGraftStream(src, out, ckpt, Map("ignoreDeletes" -> "true")))
    def causes(x: Throwable): Seq[Throwable] =
      if (x == null) Seq.empty else x +: causes(x.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("append-only")), e.getMessage)
  }

  test("versioned source: startingVersion backfill is rate-limited from batch one") {
    val src = tempDir("vsrc-svcap"); val out = tempDir("vsrc-svcap-out")
    val five = nationDF.limit(5).coalesce(1)
    var t = DeltaTable.forPath(src).write(five)
    (1 to 3).foreach(_ => t = t.write(five)) // v0..v3
    // startingVersion=0 turns the FIRST batch into a commit-range
    // backfill — exactly what the caps exist for; pre-fix it arrived as
    // ONE uncapped batch
    runGraftStream(src, out, tempDir("vsrc-svcap-ckpt"),
      Map("startingVersion" -> "0", "maxVersionsPerTrigger" -> "2"))
    val outT = DeltaTable.forPath(out)
    assert(outT.toDF(spark).count() == 4 * five.count())
    assert(outT.version == 1L,
      s"4-version backfill at cap 2 must land as 2 sink commits, got ${outT.versions}")
  }

  test("versioned source: skipChangeCommits skips non-append commits wholesale") {
    val src = tempDir("vsrc-skipcc"); val out = tempDir("vsrc-skipcc-out")
    val ckpt = tempDir("vsrc-skipcc-ckpt")
    var t = DeltaTable.forPath(src).write(nationDF.coalesce(1)) // v0: 25 rows
    runGraftStream(src, out, ckpt) // initial snapshot
    assert(DeltaTable.forPath(out).toDF(spark).count() == 25)
    // a rewriting copy-on-write delete: under ignoreChanges the re-staged
    // kept rows would stream as 24 duplicates; under skipChangeCommits the
    // commit contributes NOTHING, and the tail append still streams
    t = t.delete(spark, Some(col("n_nationkey") === 20))
    t = t.write(nationDF.limit(3).coalesce(1))
    runGraftStream(src, out, ckpt, Map("skipChangeCommits" -> "true"))
    assert(DeltaTable.forPath(out).toDF(spark).count() == 25 + 3)
    // a MoR delete (DV re-add) is likewise skipped, not aborted
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") === 21))
    t = t.write(nationDF.limit(2).coalesce(1))
    runGraftStream(src, out, ckpt, Map("skipChangeCommits" -> "true"))
    assert(DeltaTable.forPath(out).toDF(spark).count() == 25 + 3 + 2)
  }

  test("versioned source: OPTIMIZE mid-stream passes with no tolerance options") {
    val src = tempDir("vsrc-opt"); val out = tempDir("vsrc-opt-out")
    val ckpt = tempDir("vsrc-opt-ckpt")
    var t = DeltaTable.forPath(src).write(nationDF.limit(10).coalesce(1))
    t = t.write(nationDF.filter(col("n_nationkey") >= 10).coalesce(1))
    runGraftStream(src, out, ckpt)
    assert(DeltaTable.forPath(out).toDF(spark).count() == 25)
    // compaction rewrites BOTH files with dataChange=false on every add and
    // remove: the strict append-only stream must pass it untouched — no
    // abort, no duplicate delivery — and keep consuming the tail
    t = t.compact(spark)
    t = t.write(nationDF.limit(4).coalesce(1))
    runGraftStream(src, out, ckpt)
    assert(DeltaTable.forPath(out).toDF(spark).count() == 25 + 4)
  }

  test("versioned source: initial snapshot reads through deletion vectors") {
    val src = tempDir("vsrc-dv"); val out = tempDir("vsrc-dv-out")
    var t = DeltaTable.forPath(src).write(nationDF.limit(5).coalesce(1))
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") === 0))
    // the MoR delete happened BEFORE stream start: the initial snapshot
    // must serve the 4 LIVE rows, not the file's raw 5
    runGraftStream(src, out, tempDir("vsrc-dv-ckpt"))
    assert(DeltaTable.forPath(out).toDF(spark).count() == 4)
  }

  test("versioned source: readChangeFeed streams row-level changes") {
    val src = tempDir("vsrc-cdf"); val out = tempDir("vsrc-cdf-out")
    val ckpt = tempDir("vsrc-cdf-ckpt")
    var t = DeltaTable.forPath(src)
      .write(nationDF.limit(5).coalesce(1)) // v0: keys 0..4
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") === 0)) // v1
    // initial snapshot under CDF: the LIVE rows as `insert` at the
    // stream's starting version
    runGraftStream(src, out, ckpt, Map("readChangeFeed" -> "true"))
    val o1 = spark.read.format("graft").load(out)
    assert(o1.count() == 4)
    assert(o1.filter(col("_change_type") === "insert" &&
      col("_commit_version") === 1L).count() == 4)
    // tail batches: an append streams inserts; a merge-on-read delete
    // streams its EXACT newly-dead row — and does NOT abort the stream
    // (change feeds exist to carry non-append commits)
    t = t.write(nationDF.limit(3).coalesce(1)) // v2: keys 0..2 again
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") === 4)) // v3
    runGraftStream(src, out, ckpt, Map("readChangeFeed" -> "true"))
    val o2 = spark.read.format("graft").load(out)
    assert(o2.filter(col("_commit_version") === 2L &&
      col("_change_type") === "insert").count() == 3)
    val dead = o2.filter(col("_commit_version") === 3L &&
      col("_change_type") === "delete")
    assert(dead.count() == 1)
    assert(dead.select("n_nationkey").collect().head.get(0).toString == "4")
  }

  test("timestampAsOf: API and reader option resolve to the right version") {
    val d = tempDir("ts-asof")
    var t = DeltaTable.forPath(d).write(nationDF)
    Thread.sleep(5)
    t = t.write(nationDF)
    Thread.sleep(5)
    t = t.delete(spark, Some(col("n_nationkey") < 10))
    val hist = t.history.reverse // oldest first: (0, ci0), (1, ci1), (2, ci2)
    assert(t.versionAt(hist(1)._2.timestamp) == 1L)
    assert(t.versionAt(hist(2)._2.timestamp + 1000L) == 2L)
    assertSameRows(t.loadAsTimestamp(hist(1)._2.timestamp).toDF(spark),
      nationDF.union(nationDF))
    // the reader option takes millis and equals versionAsOf
    val viaTs = spark.read.format("graft")
      .option("timestampAsOf", hist(1)._2.timestamp.toString).load(d)
    val viaV = spark.read.format("graft").option("versionAsOf", "1").load(d)
    assertSameRows(viaTs, viaV)
    // before the first commit: loud error; both options together: rejected
    intercept[IllegalArgumentException](t.versionAt(hist(0)._2.timestamp - 10000L))
    intercept[IllegalArgumentException](
      spark.read.format("graft").option("versionAsOf", "1")
        .option("timestampAsOf", "12345").load(d).collect())
  }
}
