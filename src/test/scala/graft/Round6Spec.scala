package graft

import graft.operators.{Pii, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-6 operators: PII redaction, duplicate-passage detection, and
  * unigram-LM scoring — closed-form fixtures plus plan-shape guards.
  */
class Round6Spec extends SparkSuite {
  import spark.implicits._

  test("pii: detects and redacts emails, phones, ipv4 with exact counts") {
    val df = Seq(
      (1L, "write to alice.smith+x@mail.example.org today"),
      (2L, "call 555-123-4567 or 555-987-0000 x"),
      (3L, "server at 10.0.0.1 and 192.168.254.3"),
      (4L, "nothing sensitive here"),
      (5L, "a@b.io via 172.16.0.9 phone 800-555-1212")).toDF("id", "text")
    val r = Pii.detectRedact(df, "id", "text").orderBy("id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4)))
    assert(r(0) == ((1L, 1L, 0L, 0L, "write to <EMAIL> today")))
    assert(r(1) == ((2L, 0L, 2L, 0L, "call <PHONE> or <PHONE> x")))
    assert(r(2) == ((3L, 0L, 0L, 2L, "server at <IP> and <IP>")))
    assert(r(3) == ((4L, 0L, 0L, 0L, "nothing sensitive here")))
    assert(r(4) == ((5L, 1L, 1L, 1L, "<EMAIL> via <IP> phone <PHONE>")))
  }

  test("pii: a dotted quad inside an email is redacted once, counted once") {
    val df = Seq((1L, "ping admin@10.0.0.1.example.com now")).toDF("id", "text")
    val r = Pii.detectRedact(df, "id", "text").head()
    assert(r.getLong(1) == 1L && r.getLong(3) == 0L,
      "email swallows the embedded quad; ip count must be 0")
    assert(r.getString(4) == "ping <EMAIL> now")
  }

  test("pii: dropPii keeps only clean rows") {
    val df = Seq((1L, "x@y.ai"), (2L, "clean"), (3L, "at 8.8.8.8")).toDF("id", "text")
    assert(Pii.dropPii(df, "text").select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("url signals: domains extracted, blocklist flagged, zero shuffle") {
    val df = Seq(
      (1L, "see https://www.sub.shop.example.com/p/1 and http://spam.bad.net"),
      (2L, "plain text no links"),
      (3L, "dup https://a.example.com/x https://b.example.com/y")).toDF("id", "text")
    val r = Pii.urlSignals(df, "id", "text", Seq("bad.net")).orderBy("id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3), x.getBoolean(4)))
    assert(r(0) == ((1L, 2L, 1L, "bad.net,example.com", true)))
    assert(r(1) == ((2L, 0L, 0L, "", false)))
    assert(r(2) == ((3L, 2L, 0L, "example.com", false)))
    val plan = Pii.urlSignals(df, "id", "text", Seq("bad.net"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("pii: redaction is pure row-local column algebra — no shuffle") {
    val df = Seq((1L, "x")).toDF("id", "text")
    val plan = Pii.detectRedact(df, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("dup passages: shared windows are flagged in both docs, unique ones not") {
    // docs 1 and 2 share the 5-token run "p q r s t"; doc 3 is disjoint;
    // doc 4 is too short to have any window
    val df = Seq(
      (1L, "a b p q r s t c d"),
      (2L, "e f p q r s t g h"),
      (3L, "m n o aa bb cc dd"),
      (4L, "x y z")).toDF("doc_id", "text")
    val r = TextAnalysis.duplicatePassages(df, "doc_id", "text", k = 5)
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // 9 tokens → 5 windows; exactly one ("p q r s t") is cross-doc
    assert(r(0) == ((1L, 5L, 1L)))
    assert(r(1) == ((2L, 5L, 1L)))
    assert(r(2) == ((3L, 3L, 0L)))
    assert(r.length == 3, "doc shorter than k has no windows and drops out")
  }

  test("dup passages: within-doc repeats don't count as cross-doc duplicates") {
    // the window set is per-doc DISTINCT: a doc repeating its own passage
    // must not inflate the document frequency
    val df = Seq(
      (1L, "p q r s t u p q r s t u"),
      (2L, "lone words only here five")).toDF("doc_id", "text")
    val r = TextAnalysis.duplicatePassages(df, "doc_id", "text", k = 5)
      .orderBy("doc_id").collect()
    assert(r.forall(_.getLong(2) == 0L), "no cross-doc duplicate exists")
  }

  test("metadata min/max survives zero-record files from empty partitions") {
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val d = tempDir("mm-empty")
    // 64 round-robin partitions over 25 rows force empty output files
    // whose footer stats are {} — they must contribute nothing, not
    // poison the fold
    val t = DeltaTable.forPath(d).write(nation.repartition(64))
    assert(t.dlog.addActions.values.exists(
        a => a.stats.exists(_.contains("\"numRecords\":0"))),
      "fixture must actually commit a zero-record file")
    assert(t.minMaxFromStats("n_nationkey").contains((0L, 24L)))
  }

  test("planner-time stats skipping: a plain filter prunes files in ANY scan") {
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val d = tempDir("fi-skip")
    val t = DeltaTable.forPath(d)
      .write(nation.filter(col("n_nationkey") < 10).coalesce(1))
      .write(nation.filter(col("n_nationkey") >= 10).coalesce(1))
    // NOT toDFWhere — a plain scan with a user filter: the log-backed
    // FileIndex evaluates the pushed data filter against footer stats
    // inside listFiles, so only the high file is planned
    val df = t.toDF(spark).filter(col("n_nationkey") >= 20)
    val qe = df.queryExecution
    // execute THIS plan instance so its scan metrics populate
    val n = qe.executedPlan.executeCollect().length
    assert(n == nation.filter(col("n_nationkey") >= 20).count())
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansOf(a.executedPlan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      }.flatten
    val scan = scansOf(qe.executedPlan).headOption
      .getOrElse(fail("expected a FileSourceScanExec"))
    assert(scan.metrics("numFiles").value == 1L,
      s"stats should prune to 1 file, planned ${scan.metrics("numFiles").value}")
    // and the scan itself lists zero filesystem metadata: statuses come
    // from the log (sanity: sizeInBytes equals the log's sizes)
    assert(scan.relation.location.sizeInBytes ==
      t.dlog.addActions.values.map(_.size).sum)
  }

  test("scan plan identity: snapshots of one version share cached data") {
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val d = tempDir("fi-cache")
    DeltaTable.forPath(d).write(nation)
    val df1 = DeltaTable.forPath(d).toDF(spark).cache()
    try {
      df1.count()
      // a SECOND handle's scan must canonicalize equal and hit the cache
      // (GraftFileIndex equality by table root + live-file set)
      val df2 = DeltaTable.forPath(d).toDF(spark)
      val hits = df2.queryExecution.optimizedPlan.collect {
        case i: org.apache.spark.sql.execution.columnar.InMemoryRelation => i
      }
      assert(hits.nonEmpty, "fresh snapshot scan missed the cached data")
      // a DIFFERENT version must NOT hit the stale cache
      val t2 = DeltaTable.forPath(d).write(nation)
      val miss = t2.toDF(spark).queryExecution.optimizedPlan.collect {
        case i: org.apache.spark.sql.execution.columnar.InMemoryRelation => i
      }
      assert(miss.isEmpty, "new version wrongly reused the old version's cache")
    } finally df1.unpersist()
  }

  test("appendOnlyStream rejects tables with removes unless ignoreChanges") {
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val d = tempDir("stream-guard")
    DeltaTable.forPath(d).write(nation)
      .delete(spark, Some(col("n_nationkey") === 1))
    val e = intercept[IllegalStateException](
      graft.streaming.DeltaStreamSource.appendOnlyStream(spark, d))
    assert(e.getMessage.contains("append-only"))
    // the opt-out constructs (delta's ignoreChanges semantics)
    assert(graft.streaming.DeltaStreamSource
      .appendOnlyStream(spark, d, ignoreChanges = true).isStreaming)
    // append-only history still constructs strictly
    val d2 = tempDir("stream-ok")
    DeltaTable.forPath(d2).write(nation).write(nation)
    assert(graft.streaming.DeltaStreamSource
      .appendOnlyStream(spark, d2).isStreaming)
  }

  test("quantized rerank reproduces exact brute-force top-k") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val exact = graft.operators.Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
    val twoStage = graft.operators.Similarity
      .quantizedRerankTopK(emb, queries, "vec_id", "embedding", 5, candidateK = 50)
    assertSameRows(twoStage, exact)
  }

  test("unigram logprob: the in-plan corpus total reuses the tf shuffle") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // static ReuseExchange is visible in the non-adaptive plan (under
    // AQE the same reuse happens at runtime via shuffle-stage reuse)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
        .queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"),
        s"expected the total's aggregate to reuse the tf exchange:\n${plan.take(2000)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("unigram logprob: closed-form two-doc corpus") {
    // corpus = [a a b], [b c]; total 5 tokens; freqs a=2 b=2 c=1
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val r = TextAnalysis.unigramLogProb(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    def rnd(x: Double) = math.round(x * 1e4) / 1e4
    val lp1 = rnd((2 * math.log(2d / 5) + math.log(2d / 5)) / 3)
    val lp2 = rnd((math.log(2d / 5) + math.log(1d / 5)) / 2)
    assert(r(0).getLong(1) == 3L && r(0).getDouble(2) == lp1)
    assert(r(1).getLong(1) == 2L && r(1).getDouble(2) == lp2)
    val ppl1 = math.round(math.exp(-lp1) * 100) / 100d
    assert(r(0).getDouble(3) == ppl1)
  }
}
