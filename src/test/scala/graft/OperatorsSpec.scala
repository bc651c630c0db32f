package graft

import graft.operators.{Dedup, Multimodal, Regression, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("exact dedup keeps the smallest id per duplicate group") {
    val df = docs(3L -> "same text here", 1L -> "same text here", 2L -> "other text")
    val out = Dedup.exact(df, "doc_id").orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("ngram jaccard computes exact pair similarity") {
    val df = docs(
      1L -> "a b c d e",
      2L -> "a b c d e f", // trigrams 3 vs 4, intersection 3 -> j = 0.75
      3L -> "x y z w")
    val out = Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 3, threshold = 0.7)
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 2L)
    assert(out(0).getDouble(2) == 0.75)
  }

  test("maxDocFreq drops boilerplate shingles") {
    val boiler = "common prefix shared by all docs"
    val df = docs((1L to 6L).map(i => i -> s"$boiler unique$i tail$i words$i"): _*)
    val strict = Dedup.ngramJaccardPairs(df, "doc_id", "text", threshold = 0.3)
    val filtered = Dedup.ngramJaccardPairs(df, "doc_id", "text", threshold = 0.3,
      maxDocFreq = 3)
    assert(filtered.count() <= strict.count())
  }

  test("minhash-lsh finds identical and near-identical docs") {
    val df = docs(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy dog again and again",
      3L -> "completely different content with no overlap at all whatsoever")
    val out = Dedup.minHashLshPairs(df, "doc_id", "text", threshold = 0.9).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 2L &&
      out(0).getDouble(2) == 1.0)
  }

  test("simhash: identical docs at hamming 0; disjoint docs not paired") {
    val df = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "one two three four five six seven eight nine ten")
    val out = Dedup.simHashPairs(df, "doc_id", "text", maxHamming = 3).collect()
    assert(out.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getInt(2) == 0))
    assert(!out.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }
}

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private val corpus = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f)),
    (5L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")

  test("brute-force top-k ranks by cosine with deterministic tie-break") {
    val out = Similarity.bruteForceTopK(corpus,
        corpus.filter(col("vec_id") === 1), "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 3L, 4L)) // by cos desc, id
    assert(out(0).getDouble(3) > 0.99)
  }

  test("lsh near-dup pairs finds exact duplicates with cos 1.0") {
    val dup = corpus.union(corpus.withColumn("vec_id", col("vec_id") + 100))
    val out = Similarity.cosineNearDupPairs(dup, "vec_id", "embedding",
      threshold = 0.95)
    val rows = out.collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((1L to 5L).forall(i => pairs.contains(i -> (i + 100))))
    // identical-vector pairs score exactly 1.0; all pairs meet the threshold
    assert(rows.filter(r => r.getLong(1) == r.getLong(0) + 100)
      .forall(_.getDouble(2) == 1.0))
    assert(rows.forall(_.getDouble(2) >= 0.95))
  }

  test("cosineFast expression equals the HOF composition bit-for-bit") {
    val pairs = corpus.as("x").crossJoin(corpus.as("y"))
      .select(
        Similarity.cosineFast(col("x.embedding"), col("y.embedding")).as("fast"),
        Similarity.cosine(Similarity.toDouble(col("x.embedding")),
          Similarity.toDouble(col("y.embedding"))).as("hof"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("cosine_sim is callable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    corpus.createOrReplaceTempView("emb_sql")
    val out = spark.sql(
      """SELECT x.vec_id, cosine_sim(x.embedding, y.embedding) AS c
        |FROM emb_sql x JOIN emb_sql y ON y.vec_id = 1 AND x.vec_id = 2""".stripMargin)
      .collect()
    assert(out.length == 1 && out(0).getDouble(1) > 0.99)
  }

  test("lshTopK returns the identical-vector neighbor first") {
    val dup = corpus.union(corpus.withColumn("vec_id", col("vec_id") + 100))
    val out = Similarity.lshTopK(dup, dup.filter(col("vec_id") === 1),
      "vec_id", "embedding", k = 3)
    val first = out.filter(col("rank") === 1).collect()
    assert(first.length == 1 && first(0).getLong(2) == 101L)
  }

  test("ivfTopK returns the identical-vector neighbor first") {
    val dup = corpus.union(corpus.withColumn("vec_id", col("vec_id") + 100))
    val out = Similarity.ivfTopK(dup, dup.filter(col("vec_id") === 1),
      "vec_id", "embedding", k = 3, nCells = 4, nProbe = 2)
    val first = out.filter(col("rank") === 1).collect()
    assert(first.length == 1 && first(0).getLong(2) == 101L)
    assert(first(0).getDouble(3) == 1.0)
  }

  test("semanticDedup drops exactly the clustered near-duplicates") {
    val dup = corpus.union(corpus.withColumn("vec_id", col("vec_id") + 100))
    val out = Similarity.semanticDedup(dup, "vec_id", "embedding",
      threshold = 0.95, nCells = 4).collect()
    // vector 2 is a genuine SEMANTIC near-dup of 1 (cos ~0.9939 >= 0.95
    // — the paraphrase case lexical dedup misses), so it drops alongside
    // the exact twins; every dropped item is kept by its smallest
    // >=-threshold neighbor
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (1L, 101L), (1L, 102L),
        (3L, 103L), (4L, 104L), (5L, 105L)))
    // identical twins score exactly 1.0; the near-dup scores below it
    val byDrop = out.map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(Seq(101L, 103L, 104L, 105L).forall(byDrop(_) == 1.0))
    assert(byDrop(2L) >= 0.95 && byDrop(2L) < 1.0)
    // semantically distinct originals survive
    assert(!out.map(_.getLong(1)).toSet.exists(Set(1L, 3L, 4L, 5L)))
  }

  test("semanticDedup plans as an equi-join on the cluster id") {
    val dup = corpus.union(corpus.withColumn("vec_id", col("vec_id") + 100))
    val out = Similarity.semanticDedup(dup, "vec_id", "embedding",
      threshold = 0.95, nCells = 4)
    val plan = out.queryExecution.executedPlan.toString
    // the intra-cluster comparison must be an equi-join on _cell — a
    // cartesian/nested-loop plan would be the corpus-wide all-pairs
    // SemDeDup exists to avoid
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("codegen'd LSH signature equals the HOF composition bit-for-bit") {
    val rng = new scala.util.Random(7)
    val dims = Seq(3, 17, 64)
    dims.foreach { d =>
      val vecs = (1L to 50L).map(i => i -> Array.fill(d)(rng.nextFloat() * 2 - 1))
        .toDF("vec_id", "embedding")
      val hp = Similarity.hyperplanes(64, d)
      val v = Similarity.toDouble(col("embedding"))
      val out = vecs.select(
        Similarity.lshSignature(v, hp).as("fast"),
        Similarity.lshSignatureHof(v, hp).as("hof")).collect()
      out.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"dim $d: ${r.getLong(0)} != ${r.getLong(1)}"))
    }
  }

  test("LSH rejects more than 64 planes instead of silently aliasing bits") {
    // 1L << p wraps mod 64 in Java: plane 64 would alias plane 0's bit and
    // silently degrade recall, so construction must fail fast
    assertThrows[IllegalArgumentException](graft.functions.LshSignature(
      org.apache.spark.sql.graftshim.ColumnShim.expression(col("embedding")),
      Similarity.hyperplanes(65, 3)))
    assertThrows[IllegalArgumentException](
      Similarity.lshTopK(corpus, corpus.limit(1), "vec_id", "embedding",
        k = 1, planes = 128, bands = 8))
    assertThrows[IllegalArgumentException](
      Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding",
        threshold = 0.9, planes = 72, bands = 8))
  }

  test("LSH signatures adapt to the data's dimension (no 64-dim hard-code)") {
    // probeDim reads the true dim; a hard-coded 64 would null-pad zip_with,
    // collapse every signature to 0, and degrade blocking to all-pairs
    assert(Similarity.probeDim(corpus, "embedding") == 3)
    val hp = Similarity.hyperplanes(16, 3)
    val sigs = corpus
      .select(col("vec_id"),
        Similarity.lshSignature(Similarity.toDouble(col("embedding")), hp).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.values.toSet.size > 1, "signatures must not collapse to one bucket")
    // opposite vectors disagree on every plane with a nonzero projection
    assert(sigs(1L) != sigs(5L))
    // near-identical vectors still collide in at least one 4-bit band
    val bands = (0 until 4).map(b => (sigs(1L) >>> (b * 4)) & 0xFL)
      .zip((0 until 4).map(b => (sigs(2L) >>> (b * 4)) & 0xFL))
    assert(bands.exists { case (x, y) => x == y })
  }
}

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("shingles: fewer tokens than n yields empty array") {
    val df = Seq((1L, "two words"), (2L, "three word text")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      size(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3)).as("n"))
      .orderBy("doc_id").collect()
    assert(out(0).getInt(1) == 0 && out(1).getInt(1) == 1)
  }

  test("importance weights: target-only tokens score positive, off-target negative") {
    // target docs say 'aa', off-target say 'bb', 'cc' is common ground —
    // the LLR of a doc made of target-exclusive tokens must be positive,
    // an off-target-exclusive doc negative, and the common doc in between
    val df = Seq(
      (1L, "aa aa cc", true), (2L, "aa cc cc", true),
      (3L, "bb bb cc", false), (4L, "cc cc cc", false)
    ).toDF("doc_id", "text", "is_t")
    val out = TextAnalysis.importanceWeights(df, "doc_id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1) > 0.0, s"target-exclusive doc scored ${out(1)}")
    assert(out(3) < 0.0, s"off-target-exclusive doc scored ${out(3)}")
    assert(out(1) > out(2) && out(2) > out(3))
    // weights are a pure function of the corpus: a re-run is identical
    val again = TextAnalysis.importanceWeights(df, "doc_id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again == out)
  }

  test("subword tokens: letter runs, digit runs, symbol/CJK per-char fallback") {
    val df = Seq((1L, "Hello, world42! 你好")).toDF("doc_id", "text")
    val out = df.select(TextAnalysis.subwordTokens(col("text")).as("t"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("hello", ",", "world", "42", "!", "你", "好"))
    val counts = TextAnalysis.subwordCount(df, "doc_id", "text").collect()(0)
    assert(counts.getLong(1) == 7L && counts.getLong(2) == 7L)
  }

  test("hash splits are stable, exhaustive, and superset-monotone") {
    val df = (1L to 1000L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val split = Sampling.hashSplit(df, "doc_id")
    assert(split.count() == 1000)
    val byLabel = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel("train") > byLabel("val") && byLabel("train") > byLabel("test"))
    // deterministic: same assignment on re-evaluation
    val again = Sampling.hashSplit(df, "doc_id")
    assert(split.select("doc_id", "split").exceptAll(
      again.select("doc_id", "split")).count() == 0)
    // monotone supersets: 5% sample ⊆ 20% sample
    val s5 = Sampling.sampleFraction(df, "doc_id", 5).select("doc_id")
    val s20 = Sampling.sampleFraction(df, "doc_id", 20).select("doc_id")
    assert(s5.exceptAll(s20).count() == 0)
    assert(s5.count() < s20.count())
  }

  test("quality score: ratios match hand computation") {
    val df = Seq((1L, "the cat sat on the mat.")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(df, "doc_id", "text").collect()(0)
    assert(r.getLong(1) == 6L) // tokens
    assert(r.getDouble(3) == round2(3.0 / 6.0, 4)) // the, on, the
    assert(r.getDouble(4) == round2(1.0 / 23.0, 4)) // one '.' of 23 chars
  }

  test("langId picks the profile with most marker hits; und when none") {
    val df = Seq(
      (1L, "der hund und die katze ist da"),
      (2L, "le chat et le chien dans la maison"),
      (3L, "qqq www zzz")).toDF("doc_id", "text")
    val out = TextAnalysis.langId(df, "doc_id", "text")
      .select("doc_id", "pred_lang").orderBy("doc_id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("de", "fr", "und"))
  }

  test("fingerprint is stable and order-sensitive") {
    val df = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "d c b a"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.fingerprint(df, "doc_id", "text").orderBy("doc_id").collect()
    assert(out(0).getString(1) == out(1).getString(1))
    assert(out(0).getString(1) != out(2).getString(1))
  }

  private def round2(v: Double, p: Int): Double =
    BigDecimal(v).setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
}

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("extractFeatures: payload identity + deterministic synthetic dims") {
    val df = Seq((7L, "hello world")).toDF("doc_id", "text")
    val out = Multimodal.extractFeatures(
      Multimodal.attachPayload(df, "doc_id", "text")).collect()(0)
    val bytes = "hello world".getBytes("UTF-8")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    val len = bytes.length.toLong
    assert(out.getLong(2) == len)
    assert(out.getString(3) == md5)
    assert(out.getLong(4) == 64 + len % 512 && out.getLong(5) == 64 + (len * 7) % 512
      && out.getLong(6) == 1 + len % 8)
  }

  test("ImageIoCodec decodes generated PNG and animated GIF bytes") {
    val df = Seq(4L, 7L, 10L, 13L).toDF("doc_id")
    val feats = Multimodal.extractFeaturesWith(
      Multimodal.attachImagePayload(df, "doc_id"), Multimodal.ImageIoCodec)
      .orderBy("doc_id").collect()
    assert(feats.length == 4)
    feats.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = Multimodal.imageDims(id)
      val expType = if (id % 2 == 0) "image/png" else "image/gif"
      val expFrames = if (id % 2 == 0) 1L else Multimodal.gifFrames(id).toLong
      assert(r.getString(1) == expType)
      assert(r.getLong(4) == w.toLong, s"width of doc $id")
      assert(r.getLong(5) == h.toLong, s"height of doc $id")
      assert(r.getLong(6) == expFrames, s"frames of doc $id")
    }
  }

  test("ImageIoCodec rejects undecodable payloads loudly") {
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoCodec.decode("definitely not an image".getBytes("UTF-8"))
    }
  }

  test("sampleFrames: stride-2 indices below n_frames") {
    val feats = Seq((1L, "image/fake", 10L, "x", 64L, 64L, 5L))
      .toDF("doc_id", "media_type", "payload_len", "payload_md5", "width", "height", "n_frames")
    val idx = Multimodal.sampleFrames(feats, stride = 2)
      .orderBy("frame_idx").collect().map(_.getLong(1)).toSeq
    assert(idx == Seq(0L, 2L, 4L))
  }

  test("resizePlan fits into the box, preserves aspect, never upscales") {
    val feats = Seq(
      (1L, 512L, 256L), // downscale, width-bound
      (2L, 100L, 400L), // downscale, height-bound
      (3L, 100L, 100L)) // already fits: untouched
      .toDF("doc_id", "width", "height")
    val out = Multimodal.resizePlan(feats, 256L, 256L)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(3) == 256L && out(0).getLong(4) == 128L)
    assert(out(1).getLong(3) == 64L && out(1).getLong(4) == 256L)
    assert(out(2).getLong(3) == 100L && out(2).getLong(4) == 100L &&
      out(2).getDouble(5) == 1.0)
  }
}

class StreamingSinkSpec extends SparkSuite {

  test("availableNow hourly aggregate equals the batch aggregation") {
    val dir = tempDir("stream-agg")
    streaming.DeltaStreamSink.runHourlyAggregate(spark, sfDir, dir)
    val got = DeltaTable.forPath(dir).toDF(spark)
    val batch = QueryLib.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))
    assertSameRows(got, batch)
  }

  test("watermarked append-mode windows equal batch agg minus unfinalized tail") {
    val dir = tempDir("stream-wm")
    streaming.DeltaStreamSink.runWatermarkedHourlyAggregate(spark, sfDir, dir)
    val got = DeltaTable.forPath(dir).toDF(spark)
    val events = QueryLib.events(spark, sfDir)
    val maxTs = events.agg(max(col("ts"))).collect()(0).getAs[java.time.LocalDateTime](0)
    val batch = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))
      .filter(col("window_start") + expr("INTERVAL 1 HOUR") <=
        lit(maxTs.minusMinutes(30)))
    assertSameRows(got, batch)
    // the unfinalized tail really exists (otherwise this tests nothing)
    assert(got.count() <
      events.select(window(col("ts"), "1 hour"), col("event_type")).distinct().count())
  }

  test("stateful sessionize stays correct when input spans micro-batches") {
    // Split events into 3 time-ranged files with increasing modification
    // times: maxFilesPerTrigger=1 forces one micro-batch per file, in time
    // order — users spanning batches re-emit cumulative rows, which the
    // upsert sink must replace, not append.
    val raw = QueryLib.raw(spark, sfDir, "events")
    val src = tempDir("stream-split")
    // quantile over an epoch-µs view of ts (approxQuantile needs a numeric
    // column; works for both the legacy long and the timestamp fixture)
    val withUs = raw.withColumn("_us", QueryLib.tsToMicros(raw.schema("ts").dataType))
    val cuts = withUs.stat.approxQuantile("_us", Array(0.34, 0.67), 0.0)
    val ranges = Seq(
      col("_us") <= cuts(0),
      col("_us") > cuts(0) && col("_us") <= cuts(1),
      col("_us") > cuts(1))
    ranges.zipWithIndex.foreach { case (p, i) =>
      withUs.filter(p).drop("_us").coalesce(1).write.parquet(s"$src/events_$i.parquet")
      // deterministic batch order: the file source sorts by modTime
      new java.io.File(s"$src/events_$i.parquet").listFiles()
        .foreach(f => f.setLastModified(1700000000000L + i * 60000L))
    }
    val dir = tempDir("stream-sess")
    streaming.DeltaStreamSink.runStatefulSessionize(spark, src, dir,
      maxFilesPerTrigger = Some(1))
    val t = DeltaTable.forPath(dir)
    // multiple micro-batches really happened: one commit per non-empty batch
    assert(t.version >= 1, s"expected multi-batch run, got version ${t.version}")
    // and the result equals the single-pass batch computation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("_us"), col("event_id"))
    val batch = QueryLib.events(spark, sfDir)
      .withColumn("_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("_gap", col("_us") - lag(col("_us"), 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("_gap").isNull || col("_gap") > 1800000000L, 1)
          .otherwise(0)).cast("long").as("n_sessions"))
    assertSameRows(t.toDF(spark), batch)
  }
}

/** One-pass normal-equations fitting (Regression). */
class RegressionSpec extends SparkSuite {

  test("ridge fit recovers an exact linear relation; refuses collinear features") {
    val df = spark.range(1, 101).select(col("id").cast("double").as("x"))
      .withColumn("y", lit(2.0) + lit(3.0) * col("x"))
    val b = Regression.ridgeFit(df, Seq(lit(1.0), col("x")), col("y"), lambda = 1e-6)
    assert(math.abs(b(0) - 2.0) < 1e-3 && math.abs(b(1) - 3.0) < 1e-4, b.toSeq.toString)
    val pred = Regression.score(Seq(lit(1.0), col("x")), b)
    val maxErr = df.select(max(abs(col("y") - pred))).head().getDouble(0)
    assert(maxErr < 1e-2, maxErr.toString)
    // exactly collinear features with no regularization: loud refusal,
    // never a garbage model
    val ex = intercept[IllegalArgumentException](
      Regression.ridgeFit(df, Seq(col("x"), col("x") * 2), col("y"), lambda = 0.0))
    assert(ex.getMessage.contains("singular"), ex.getMessage)
  }

  test("logistic IRLS separates a threshold rule and is refit-deterministic") {
    // label = 1 iff x > 50; logistic on (1, x) must put the decision
    // boundary near 50 and order probabilities monotonically in x
    val df = spark.range(1, 101).select(col("id").cast("double").as("x"))
      .withColumn("y", (col("x") > 50.0).cast("int"))
    val b = Regression.logisticFit(df, Seq(lit(1.0), col("x")), col("y"),
      lambda = 1.0, iters = 8)
    assert(b(1) > 0, s"slope should be positive: ${b.toSeq}")
    // λ=1 shrinks the (separable) MLE, so the boundary lands near—not
    // at—the true threshold; the decision quality is the contract
    val boundary = -b(0) / b(1)
    assert(boundary > 40.0 && boundary < 60.0, s"boundary=$boundary")
    val prob = Regression.scoreLogistic(Seq(lit(1.0), col("x")), b)
    val acc = df.select(avg(((prob >= 0.5).cast("int") === col("y")).cast("double")))
      .head().getDouble(0)
    assert(acc >= 0.9, s"accuracy=$acc")
    // fixed iteration count + final rounding: a refit is bit-identical
    val b2 = Regression.logisticFit(df, Seq(lit(1.0), col("x")), col("y"),
      lambda = 1.0, iters = 8)
    assert(b.toSeq == b2.toSeq)
  }
}
