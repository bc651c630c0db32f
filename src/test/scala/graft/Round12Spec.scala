package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Round-12 behavior specs: deterministic weighted sampling. */
class Round12Spec extends SparkSuite {
  import spark.implicits._

  test("weighted sample: deterministic per seed, distinct, bounded by group size") {
    val df = (1 to 300).map(i => (i.toLong, if (i % 3 == 0) "a" else "b", 10.0 + i))
      .toDF("id", "grp", "w")
    val s1 = Sampling.weightedSample(df, "id", col("w"), 30, "seedA", Seq("grp"))
      .select("id").as[Long].collect().sorted.toSeq
    val s2 = Sampling.weightedSample(df, "id", col("w"), 30, "seedA", Seq("grp"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(s1 == s2)
    assert(s1.distinct.size == s1.size)
    assert(s1.size == 60) // both groups have >= 30 members
    val s3 = Sampling.weightedSample(df, "id", col("w"), 30, "seedB", Seq("grp"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(s1 != s3, "a different seed should pick a different sample")
    // k above the group size returns the whole group
    val all = Sampling.weightedSample(df, "id", col("w"), 1000, "seedA", Seq("grp"))
    assert(all.count() == 300)
  }

  test("weighted sample: 10x weight dominates the selection") {
    val df = (1 to 2000).map(i =>
      (i.toLong, if (i <= 1000) 10.0 else 1.0)).toDF("id", "w")
    val picked = Sampling.weightedSample(df, "id", col("w"), 200, "s")
      .select("id").as[Long].collect()
    assert(picked.length == 200)
    val heavy = picked.count(_ <= 1000)
    // E[heavy] ≈ 183 under A-ES (10:1 odds per slot, without replacement);
    // a uniform sampler would center on 100 — the gap is the contract
    assert(heavy > 150, s"heavy=$heavy of 200")
  }

  test("weighted sample: non-positive weight is a loud error") {
    val df = Seq((1L, 1.0), (2L, 0.0)).toDF("id", "w")
    val ex = intercept[Exception](
      Sampling.weightedSample(df, "id", col("w"), 1, "s").collect())
    assert(ex.getMessage.contains("non-positive weight"), ex.getMessage)
  }

  test("kmv store: incremental cardinality equals the direct whole-corpus sketch") {
    import graft.operators.Sketches
    val d = tempDir("kmv-store")
    val all = (1 to 3000).map(i => (s"g${i % 2}", s"v${i % 700}")).toDF("grp", "v")
    val (h0, h1) = (all.filter(hash(col("v")) % 2 === 0),
      all.filter(hash(col("v")) % 2 =!= 0))
    Sketches.kmvStoreInit(d, h0, Seq("grp"), col("v"), 64, "b0")
    Sketches.kmvStoreAppend(d, h1, col("v"), "b1")
    val fromStore = Sketches.kmvStoreCardinality(spark, d)
      .select("grp", "est_distinct", "kth_hash")
    val direct = Sketches.kmvSketch(all, Seq("grp"), col("v"), 64)
      .select(col("grp"), Sketches.estimate(col("kmv_sketch"), 64).as("est_distinct"),
        element_at(col("kmv_sketch"), 64).as("kth_hash"))
    assertSameRows(fromStore, direct)
  }

  test("asof join tolerance: stale matches null out together, fresh ones survive") {
    import graft.operators.Temporal
    val left = Seq((1L, "u", "2024-01-01 10:00:00"),
      (2L, "u", "2024-01-01 12:00:00"),
      (3L, "u", "2024-01-01 12:30:00")).toDF("id", "k", "ts")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val right = Seq(("u", "2024-01-01 09:30:00", 1.0, "a"),
      ("u", "2024-01-01 12:10:00", 2.0, "b")).toDF("k", "ts", "v", "tag")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    // no tolerance: every left row has an as-of match
    val plain = Temporal.asOfJoin(left, right, Seq("k"), "ts", "ts",
      Seq("v", "tag")).orderBy("id").collect()
    assert(plain.map(_.getAs[Double]("asof_v")).toSeq == Seq(1.0, 1.0, 2.0))
    // 1h tolerance: row 2's only candidate (09:30) is 2.5h stale — BOTH
    // value columns null together; rows 1 and 3 keep their fresh match
    val tol = Temporal.asOfJoin(left, right, Seq("k"), "ts", "ts",
      Seq("v", "tag"), toleranceSeconds = Some(3600L)).orderBy("id").collect()
    assert(tol.map(r => Option(r.getAs[java.lang.Double]("asof_v"))).toSeq ==
      Seq(Some(1.0), None, Some(2.0)))
    assert(tol.map(r => Option(r.getAs[String]("asof_tag"))).toSeq ==
      Seq(Some("a"), None, Some("b")))
    // exactly-at-the-bound is inclusive (>=)
    val edge = Temporal.asOfJoin(left, right, Seq("k"), "ts", "ts",
      Seq("v"), toleranceSeconds = Some(9000L)).orderBy("id").collect()
    assert(Option(edge(1).getAs[java.lang.Double]("asof_v")) == Some(1.0))
  }

  test("CDF _commit_timestamp opt-in matches per-version history timestamps") {
    val d = tempDir("cdf-ts")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val t = DeltaTable.forPath(d).write(nation).write(nation)
      .delete(spark, Some(col("n_nationkey") < 5))
    val hist = t.history.map { case (v, c) => v -> c.effectiveTimestamp }.toMap
    val rows = t.changesBetween(spark, 0L, 2L, includeTimestamp = true)
      .select(col("_commit_version"), col("_commit_timestamp").cast("long") * 1000)
      .distinct().collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == hist(r.getLong(0)) / 1000 * 1000,
        s"v${r.getLong(0)}: ${r.getLong(1)} vs ${hist(r.getLong(0))}")
    }
    // default shape unchanged: no timestamp column
    assert(!t.changesBetween(spark, 0L, 2L).columns.contains("_commit_timestamp"))
  }

  test("streaming crawl ingestion: history dups dropped via the store, intra-batch twins resolved, corpus/store consistent, redelivery idempotent") {
    import graft.streaming.DeltaStreamSink
    val corpusDir = tempDir("crawl-corpus")
    val storeDir = tempDir("crawl-store")
    DeltaStreamSink.runStreamingCrawlIngest(spark, sfDir, corpusDir, storeDir)
    val corpus = DeltaTable.forPath(corpusDir)
    val store = DeltaTable.forPath(storeDir)
    val ids = corpus.toDF(spark).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // every planted cross-batch copy was caught against the store
    assert(!ids.exists(id => id >= 1000000L && id < 3000000L),
      s"history dups survived: ${ids.filter(_ >= 1000000L)}")
    // the intra-batch twin pair collapsed to its smaller id
    assert(ids.contains(5000000L) && !ids.contains(5000001L))
    // slice a (first batch, empty store): exactly the intra-a survivors
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = docs.filter(col("doc_id") % 3 === 0)
    val aLosers = graft.operators.Dedup
      .minHashLshPairs(a, "doc_id", "text", threshold = 0.7)
      .select("b").collect().map(_.getLong(0)).toSet
    val aIds = a.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.filter(_ % 3 == 0).filter(_ < 1000000L) == (aIds -- aLosers))
    // row-for-row consistency: one signature per corpus doc, no more
    val sigIds = store.toDF(spark).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(sigIds == ids, s"store/corpus drift: ${(sigIds diff ids) ++ (ids diff sigIds)}")
    // a redelivered final batch re-commits NOTHING on either table
    val (cv, sv) = (corpus.version, store.version)
    val lastBatch = docs.filter(col("doc_id") % 3 === 2)
    DeltaStreamSink.crawlIngestSink(corpusDir, storeDir, "crawl-demo")(
      lastBatch, 2L)
    assert(DeltaTable.forPath(corpusDir).version == cv)
    assert(DeltaTable.forPath(storeDir).version == sv)
  }

  test("bigram LM: hand-computed interpolation on a 2-doc corpus") {
    import graft.operators.TextAnalysis
    // corpus "a b" / "a c": big (a,b)=1 (a,c)=1, left a=2; uni a=2 b=1
    // c=1, total 4. Each doc's one bigram scores
    // ln(0.7·(1/2) + 0.3·(1/4)) = ln(0.425) = -0.8557 → ppl 2.35
    val df = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramLogProb(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(row.getAs[Long]("n_bigrams") == 1L)
      assert(row.getAs[Double]("avg_logprob") == -0.8557, row.toString)
      assert(row.getAs[Double]("ppl") == 2.35, row.toString)
    }
    // single-token docs have no bigrams and no row
    val single = TextAnalysis.bigramLogProb(
      Seq((1L, "alone")).toDF("doc_id", "text"), "doc_id", "text")
    assert(single.count() == 0)
  }

  test("robust z-score: hand-computed median/MAD; all-equal group nulls") {
    // group g: values 1..5 -> median 3, |dev| = {2,1,0,1,2} -> MAD 1;
    // z(5) = 2 / 1.4826, rounded like the engine rounds
    val df = ((1 to 5).map(v => ("g", v.toLong)) ++
      Seq(("h", 7L), ("h", 7L), ("h", 7L))).toDF("src", "v")
    val r = Sampling.robustZScore(df, "src", "v")
    val z5 = r.filter(col("src") === "g" && col("v") === 5)
      .select("robust_z").head().getDouble(0)
    val want = BigDecimal(2.0 / 1.4826)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(z5 == want, s"$z5 vs $want")
    assert(r.filter(col("src") === "g" && col("v") === 3)
      .select("robust_z").head().getDouble(0) == 0.0)
    // MAD 0 (all equal): null, never Infinity
    assert(r.filter(col("src") === "h").collect().forall(_.isNullAt(
      r.columns.indexOf("robust_z"))))
  }

  test("perceptual dHash: re-encode invariant, 1-pixel perturbation pairs, strangers don't") {
    import graft.operators.Multimodal
    javax.imageio.ImageIO.setUseCache(false)
    val base = Multimodal.attachImagePayload(
      Seq(100L, 102L, 104L).toDF("doc_id"), "doc_id")
    // doc 900: doc 100's image with ONE pixel flipped, re-encoded — a
    // recompressed near-duplicate no byte hash can see
    val perturbed = base.filter(col("doc_id") === 100L).collect().map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      img.setRGB(0, 0, img.getRGB(0, 0) ^ 0x00FFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (900L, "image/png", bos.toByteArray)
    }.toSeq.toDF("doc_id", "media_type", "payload")
    val hashed = Multimodal.perceptualDHash(base.unionByName(perturbed))
    val h = hashed.select("doc_id", "dhash").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(h.values.forall(_.length == 64))
    // identical content re-encoded through a second PNG pass: same hash
    assert(h(900L).zip(h(100L)).count { case (a, b) => a != b } <= 2)
    val pairs = Multimodal.perceptualNearDupPairs(hashed).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 900L)), pairs.toString)
    assert(!pairs.exists(p => p._1 == 102L || p._2 == 102L), pairs.toString)
  }

  test("video frame hashes: real AVI walk, closed-form fingerprints, cross-file shares") {
    import graft.operators.Multimodal
    val media = Multimodal.attachAviPayload(Seq(7L, 8L).toDF("doc_id"), "doc_id")
    val fh = Multimodal.videoFrameHashes(media)
    val byDoc = fh.collect().groupBy(_.getLong(0))
    // frame counts match the container's declared closed form
    assert(byDoc(7L).length == 4 + 7 % 13)
    assert(byDoc(8L).length == 4 + 8 % 13)
    // frame f of video 7 is byte-identical to frame f-1 of video 8
    // (content keyed by id + f): fingerprints must agree
    val h7 = byDoc(7L).map(r => r.getLong(1) -> r.getString(3)).toMap
    val h8 = byDoc(8L).map(r => r.getLong(1) -> r.getString(3)).toMap
    assert(h7(1L) == h8(0L) && h7(2L) == h8(1L))
    assert(h7(0L) != h8(0L))
    // fingerprint is the md5 of the canonical comma-joined unsigned bytes
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest((0 until 64).map(i => ((7L * 2654435761L + i * 31L) & 0xFF))
        .mkString(",").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(h7(0L) == want)
  }

  test("timestampNtz auto-declares as a readerWriter feature (delta spec)") {
    import graft.log.ProtocolGate
    val d = tempDir("ntz-feature")
    val df = Seq((1L, "2024-01-01 10:00:00")).toDF("id", "ts")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val t = DeltaTable.forPath(d).write(df)
    val p = t.dlog.currentProtocol
    assert(ProtocolGate.readerFeatures(p).contains("timestampNtz"), p.toString)
    assert(ProtocolGate.writerFeatures(p).contains("timestampNtz"), p.toString)
    // a zone-carrying-only table declares nothing extra
    val d2 = tempDir("ts-feature")
    val p2 = DeltaTable.forPath(d2).write(
      Seq((1L, new java.sql.Timestamp(0L))).toDF("id", "ts"))
      .dlog.currentProtocol
    assert(!ProtocolGate.writerFeatures(p2).contains("timestampNtz"), p2.toString)
  }

  test("exact store: match pinned pre-append, idempotent redelivery, refusal") {
    import graft.operators.Dedup
    val d = tempDir("exact-store")
    val base = Seq((1L, "alpha text"), (2L, "beta text"), (3L, "gamma text"))
      .toDF("doc_id", "text")
    Dedup.exactStoreInit(d, base, "doc_id", "text")
    // batch: one byte-identical recrawl + two novel docs (one pair of
    // in-batch twins — exact store matches HISTORY only, so the twins
    // must NOT match each other through the just-appended rows)
    val batch = Seq((10L, "alpha text"), (11L, "delta text"),
      (12L, "delta text")).toDF("doc_id", "text")
    val m = Dedup.exactStoreDedup(spark, d, batch, "doc_id", "text",
      append = true, batchTxn = Some(("exact-app", 1L))).collect()
    assert(m.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 10L)), m.mkString(","))
    val storeN = DeltaTable.forPath(d).toDF(spark).count()
    assert(storeN == 6) // 3 base + 3 batch fingerprints
    // redelivery: same txn version -> nothing appends, same matches
    val m2 = Dedup.exactStoreDedup(spark, d, batch, "doc_id", "text",
      append = true, batchTxn = Some(("exact-app", 1L))).collect()
    assert(DeltaTable.forPath(d).toDF(spark).count() == 6)
    // the NEW handle sees the appended fingerprints: twins now match history
    assert(m2.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 10L), (10L, 10L), (11L, 11L), (12L, 12L), (11L, 12L), (12L, 11L)))
    val plain = tempDir("exact-notstore")
    DeltaTable.forPath(plain).write(base)
    val ex = intercept[IllegalArgumentException](
      Dedup.exactStoreDedup(spark, plain, batch, "doc_id", "text"))
    assert(ex.getMessage.contains("not an exact-fingerprint store"))
  }

  test("kmv store: re-delivered batch appends exactly once; non-store refused") {
    import graft.operators.Sketches
    val d = tempDir("kmv-once")
    val df = (1 to 100).map(i => ("g", i.toString)).toDF("grp", "v")
    Sketches.kmvStoreInit(d, df, Seq("grp"), col("v"), 32, "b0")
    Sketches.kmvStoreAppend(d, df, col("v"), "b1", Some(("app", 1L)))
    Sketches.kmvStoreAppend(d, df, col("v"), "b1", Some(("app", 1L))) // retry
    val batches = DeltaTable.forPath(d).toDF(spark)
      .groupBy("batch").count().collect()
    assert(batches.length == 2 && batches.forall(_.getLong(1) == 1L),
      batches.mkString(","))
    val plain = tempDir("kmv-notstore")
    DeltaTable.forPath(plain).write(df)
    val ex = intercept[IllegalStateException](
      Sketches.kmvStoreAppend(plain, df, col("v"), "bX"))
    assert(ex.getMessage.contains("not a kmv store"), ex.getMessage)
  }
}
