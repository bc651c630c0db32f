package graft

import org.apache.spark.sql.functions._

/** Round-9 continuation: COPY INTO idempotent ingestion, metadata-only
  * SHOW PARTITIONS, delta.targetFileSize-driven OPTIMIZE sizing.
  */
class Round9bSpec extends SparkSuite {

  private def nation = spark.read.parquet(s"$sfDir/nation.parquet")

  test("COPY INTO: new files ingested once, re-runs are no-ops, consumed stays consumed") {
    val landing = tempDir("copy-into-src")
    nation.filter(col("n_nationkey") < 10).coalesce(1)
      .write.parquet(s"$landing/batch1")
    nation.filter(col("n_nationkey") >= 10 && col("n_nationkey") < 20).coalesce(1)
      .write.parquet(s"$landing/batch2")
    val d = tempDir("copy-into")
    var t = DeltaTable.forPath(d).copyInto(spark, landing)
    assertSameRows(t.toDF(spark), nation.filter(col("n_nationkey") < 20))
    val v1 = t.version
    // re-run with nothing new: NO commit
    t = t.copyInto(spark, landing)
    assert(t.version == v1, "re-run over consumed files must not commit")
    // a third file lands: only IT is ingested
    nation.filter(col("n_nationkey") >= 20).coalesce(1)
      .write.parquet(s"$landing/batch3")
    t = t.copyInto(spark, landing)
    assert(t.version == v1 + 1)
    assertSameRows(t.toDF(spark), nation)
    // consumed stays consumed even after its rows are deleted
    t = t.delete(spark, Some(col("n_nationkey") < 10))
    val vDel = t.version
    t = t.copyInto(spark, landing)
    assert(t.version == vDel, "a deleted file's rows must not re-ingest")
  }

  test("SHOW PARTITIONS is metadata-only and typed") {
    val d = tempDir("show-partitions")
    val t = DeltaTable.forPath(d)
      .write(nation, partitionBy = Some(Seq("n_regionkey")))
    val parts = t.partitions(spark)
    // typed per the table schema, not hive strings
    assert(parts.schema("n_regionkey").dataType ==
      nation.schema("n_regionkey").dataType)
    assert(parts.collect().map(_.getAs[Number](0).intValue()).sorted.toSeq ==
      nation.select("n_regionkey").distinct()
        .collect().map(_.getAs[Number](0).intValue()).sorted.toSeq)
    // metadata-only: answers even with every data file gone
    t.fileUris.foreach(u =>
      new java.io.File(new java.net.URI(u).getPath).delete())
    assert(t.partitions(spark).count() == 5)
    intercept[IllegalArgumentException](
      DeltaTable.forPath(tempDir("show-partitions-flat"))
        .write(nation).partitions(spark))
  }

  test("ADD COLUMN is metadata-only: old files scan NULL, AFTER positions, writes accept") {
    val d = tempDir("add-column")
    var t = DeltaTable.forPath(d).write(nation)
    val filesBefore = t.fileUris.toSet
    t = t.addColumn("quality", org.apache.spark.sql.types.DoubleType,
      after = Some("n_name"))
    assert(t.fileUris.toSet == filesBefore, "metadata-only: no file rewritten")
    assert(t.schema.fieldNames.toSeq ==
      Seq("n_nationkey", "n_name", "quality", "n_regionkey"))
    // pre-add files read NULL for the new column
    val out = t.toDF(spark)
    assert(out.filter(col("quality").isNotNull).count() == 0)
    // a post-add write can supply it
    t = t.write(nation.withColumn("quality", lit(0.5))
      .select("n_nationkey", "n_name", "quality", "n_regionkey"))
    assert(t.toDF(spark).filter(col("quality") === 0.5).count() == nation.count())
    assert(t.history.head._2.operation != "WRITE" ||
      t.history.map(_._2.operation).contains("ADD COLUMNS"))
    intercept[IllegalArgumentException](
      t.addColumn("quality", org.apache.spark.sql.types.DoubleType))
  }

  test("NOT NULL columns reject null writes (delta's implicit invariant)") {
    val d = tempDir("not-null")
    // a non-nullable column in the created schema (coalesce-with-literal)
    val base = nation.withColumn("tag",
      coalesce(col("n_name"), lit("x")))
    assert(!base.schema("tag").nullable)
    var t = DeltaTable.forPath(d).write(base)
    assert(!t.schema("tag").nullable)
    val bad = nation.withColumn("tag",
      when(col("n_nationkey") === 3, lit(null)).otherwise(col("n_name"))
        .cast("string"))
    val ex = intercept[IllegalArgumentException](t.write(bad))
    assert(ex.getMessage.contains("NOT NULL on tag"), ex.getMessage)
    // conforming append lands
    t = t.write(base)
    assert(t.toDF(spark).count() == nation.count() * 2)
  }

  test("compression ratio separates repetitive from high-entropy text") {
    import operators.TextAnalysis
    import spark.implicits._
    val rep = "spam " * 400 // highly repetitive
    val rnd = { // deterministic high-entropy string
      val r = new scala.util.Random(7)
      (0 until 2000).map(_ => (33 + r.nextInt(94)).toChar).mkString
    }
    val df = Seq((1L, rep), (2L, rnd)).toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatio(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) < 0.1, s"repetitive text must compress hard: ${out(1L)}")
    assert(out(2L) > 0.7, s"random text must not compress: ${out(2L)}")
    // deterministic: re-run equal
    val again = TextAnalysis.compressionRatio(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(again == out)
  }

  test("k-means assignment is deterministic and per-row OPTIMAL vs the codebook") {
    import operators.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val a1 = Similarity.kmeansAssign(emb, "vec_id", "embedding", k = 8)
    val a2 = Similarity.kmeansAssign(emb, "vec_id", "embedding", k = 8)
    assertSameRows(a1, a2) // seeded init + fixed iterations = pure function
    val rows = a1.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.values.map(_._1).toSet.size > 1, "several clusters must be used")
    assert(rows.values.forall { case (c, _) => c >= 1 && c <= 8 })
    // optimality: the assigned centroid is the argmax similarity among
    // ALL trained centroids, recomputed in plain scala
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding", 8, 5, 42)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    vecs.foreach { case (id, v) =>
      val sims = cents.map(c => cos(v, c))
      val best = sims.zipWithIndex.maxBy(_._1)._2 + 1
      assert(rows(id)._1 == best.toLong, s"vec $id assigned ${rows(id)._1}, argmax $best")
      assert(math.abs(rows(id)._2 - math.rint(sims(best - 1) * 10000) / 10000) < 1e-9)
    }
  }

  test("WAV audio: synthesized containers decode to the embedded signal's stats") {
    import operators.Multimodal
    import spark.implicits._
    val ids = (0L until 50L).toDF("doc_id")
    val media = Multimodal.attachWavPayload(ids, "doc_id")
    val feats = Multimodal.extractAudioFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(feats.size == 50)
    (0L until 50L).foreach { id =>
      val (sr, n, _) = Multimodal.audioParams(id)
      val r = feats(id)
      assert(r.getLong(r.fieldIndex("sample_rate")) == sr)
      assert(r.getLong(r.fieldIndex("n_channels")) == 1L)
      assert(r.getLong(r.fieldIndex("n_samples")) == n.toLong)
      assert(r.getLong(r.fieldIndex("payload_len")) == 44L + 2L * n)
      assert(r.getLong(r.fieldIndex("duration_ms")) == n * 1000L / sr)
      // half-amplitude sine: rms → amp/√2 ≈ 0.3536, peak → ≈ 0.5
      val rms = r.getDouble(r.fieldIndex("rms"))
      val peak = r.getDouble(r.fieldIndex("peak"))
      assert(math.abs(rms - 16383.0 / 32768.0 / math.sqrt(2.0)) < 0.01,
        s"id=$id rms=$rms")
      assert(peak > 0.45 && peak <= 0.5, s"id=$id peak=$peak")
    }
    // a truncated container fails LOUDLY, never a silent sentinel row
    val corrupt = media.limit(1).select(col("doc_id"), col("media_type"),
      expr("substring(payload, 1, 20)").as("payload"))
    intercept[org.apache.spark.SparkException](
      Multimodal.extractAudioFeatures(corrupt).collect())
  }

  test("AVI video: declared-vs-physical frame mismatch is a loud corrupt-container error") {
    import operators.Multimodal
    import spark.implicits._
    val media = Multimodal.attachAviPayload((0L until 5L).toDF("doc_id"), "doc_id")
    // drop the trailing frame chunk: avih still DECLARES the full count
    val truncated = media.select(col("doc_id"), col("media_type"),
      expr("substring(payload, 1, length(payload) - 72)").as("payload"))
    val ex = intercept[org.apache.spark.SparkException](
      Multimodal.extractVideoFeatures(truncated).collect())
    assert(ex.getMessage.contains("frames") || ex.getCause != null)
    // intact containers decode the closed form
    val r = Multimodal.extractVideoFeatures(media)
      .filter(col("doc_id") === 3L).head()
    val (w, h, n, fps) = Multimodal.videoParams(3L)
    assert(r.getLong(r.fieldIndex("width")) == w.toLong)
    assert(r.getLong(r.fieldIndex("height")) == h.toLong)
    assert(r.getLong(r.fieldIndex("n_frames")) == n.toLong)
    assert(r.getLong(r.fieldIndex("fps")) == fps.toLong)
  }

  test("randomizeFilePrefixes shards data files under hex prefix dirs; scans/vacuum unaffected") {
    val d = tempDir("rand-prefix")
    var t = DeltaTable.forPath(d).write(nation)
      .setTableProperties(Map("delta.randomizeFilePrefixes" -> "true"))
    t = t.write(nation.repartition(4))
    val prefixed = t.dlog.addActions.keys.filter(_.matches("^[0-9a-f]{2}/.*\\.parquet$"))
    assert(prefixed.nonEmpty, t.dlog.addActions.keys.toSeq.toString)
    assertSameRows(t.toDF(spark), nation.union(nation))
    // partitioned table: prefix dir sits ABOVE the hive dirs
    val dp = tempDir("rand-prefix-part")
    val tp0 = DeltaTable.forPath(dp)
      .write(nation, partitionBy = Some(Seq("n_regionkey")))
      .setTableProperties(Map("delta.randomizeFilePrefixes" -> "true"))
    val beforeKeys = tp0.dlog.addActions.keySet
    val tp = tp0.write(nation.withColumn("n_nationkey", col("n_nationkey") + 100))
    val fresh = tp.dlog.addActions.keySet.diff(beforeKeys)
    assert(fresh.nonEmpty && fresh
      .forall(_.matches("^[0-9a-f]{2}/n_regionkey=\\d+/.*\\.parquet$")),
      fresh.toSeq.toString)
    assertSameRows(tp.toDF(spark), nation.union(
      nation.withColumn("n_nationkey", col("n_nationkey") + 100)))
    assert(tp.prunedAdds(col("n_regionkey") === 2).size < tp.fileUris.size)
    // dead prefixed files are reclaimable by both vacuum flavors
    val t2 = t.write(nation.filter(col("n_regionkey") === 0),
      mode = graft.log.WriteMode.Overwrite)
    val full = t2.vacuum(retentionMs = 0L, dryRun = true).toSet
    val lite = t2.vacuumLite(retentionMs = 0L, dryRun = true).toSet
    assert(lite.nonEmpty && lite.forall(full.contains))
  }

  test("symlink manifest lists exactly the live files; regeneration drops stale state") {
    def manifestUris(d: String): Set[String] = {
      val root = new java.io.File(d, "_symlink_format_manifest")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).filter(_.getName == "manifest")
        .flatMap(f => scala.io.Source.fromFile(f).getLines()).toSet
    }
    // unpartitioned
    val d = tempDir("symlink")
    var t = DeltaTable.forPath(d).write(nation).write(nation)
    t.generateSymlinkManifest()
    assert(manifestUris(d) == t.fileUris.toSet)
    // a delete rewrites files; regeneration reflects the new live set
    t = t.delete(spark, Some(col("n_nationkey") < 5)).generateSymlinkManifest()
    assert(manifestUris(d) == t.fileUris.toSet)
    // partitioned: one manifest per key=value dir
    val dp = tempDir("symlink-part")
    var tp = DeltaTable.forPath(dp)
      .write(nation, partitionBy = Some(Seq("n_regionkey")))
    tp.generateSymlinkManifest()
    val root = new java.io.File(dp, "_symlink_format_manifest")
    assert(root.listFiles().map(_.getName).toSet ==
      (0 to 4).map(r => s"n_regionkey=$r").toSet)
    assert(manifestUris(dp) == tp.fileUris.toSet)
    // overwrite to ONE partition: stale partition dirs must vanish
    tp = tp.write(nation.filter(col("n_regionkey") === 2),
      mode = graft.log.WriteMode.Overwrite).generateSymlinkManifest()
    assert(root.listFiles().map(_.getName).toSet == Set("n_regionkey=2"))
    assert(manifestUris(dp) == tp.fileUris.toSet)
  }

  test("delta.enableDeletionVectors routes DELETE through merge-on-read") {
    val d = tempDir("dv-default")
    var t = DeltaTable.forPath(d).write(nation)
      .setTableProperties(Map("delta.enableDeletionVectors" -> "true"))
    val before = t.fileUris.toSet
    t = t.delete(spark, Some(col("n_nationkey") === 3))
    // MoR: same files, a deletion vector instead of a rewrite
    assert(t.fileUris.toSet == before, "predicate delete must be merge-on-read")
    assert(t.dlog.addActions.values.exists(a =>
      graft.sources.DeletionVectors.refOf(a).isDefined))
    assert(t.toDF(spark).filter(col("n_nationkey") === 3).count() == 0)
    // truncate stays copy-on-write metadata-only (no all-rows vector)
    val t2 = t.delete(spark, None)
    assert(t2.toDF(spark).count() == 0)
  }

  test("incremental view maintenance: cursor atomic with the fold, no-op when current") {
    import operators.Incremental
    val baseDir = tempDir("ivm-base")
    val aggDir = tempDir("ivm-agg")
    var base = DeltaTable.forPath(baseDir).write(nation)
    Incremental.maintainSumCount(spark, baseDir, aggDir, "n_regionkey", "n_nationkey")
    val agg0 = DeltaTable.forPath(aggDir)
    assert(Incremental.lastMaintained(agg0).contains(0L))
    // up to date → returns without committing
    Incremental.maintainSumCount(spark, baseDir, aggDir, "n_regionkey", "n_nationkey")
    assert(DeltaTable.forPath(aggDir).version == agg0.version)
    // append + delete, then one maintain folds both commits
    base = base.write(nation.withColumn("n_nationkey", col("n_nationkey") + 100))
    base = base.delete(spark, Some(col("n_nationkey") === 3))
    Incremental.maintainSumCount(spark, baseDir, aggDir, "n_regionkey", "n_nationkey")
    val agg1 = DeltaTable.forPath(aggDir)
    assert(Incremental.lastMaintained(agg1).contains(2L))
    val direct = base.toDF(spark).groupBy("n_regionkey")
      .agg(count(lit(1)).as("cnt"), sum("n_nationkey").as("sum_value"))
    assertSameRows(agg1.toDF(spark), direct)
    // a whole-group-vanishing delete is refused, not silently wrong
    base = base.delete(spark, Some(col("n_regionkey") === 2))
    val ex = intercept[IllegalArgumentException](
      Incremental.maintainSumCount(spark, baseDir, aggDir, "n_regionkey", "n_nationkey"))
    assert(ex.getMessage.contains("count 0"), ex.getMessage)
  }

  test("BPE training learns the textbook merges; application reconstructs words") {
    import operators.TextAnalysis
    import spark.implicits._
    val rows = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = rows.toDF("text")
    val merges = TextAnalysis.trainBpeMerges(df, "text", 5)
      .orderBy("rank").collect()
    def m(i: Int) = (merges(i).getString(1), merges(i).getString(2))
    // hand-computed (Sennrich's own example corpus shape): freq-weighted
    // argmax with lexicographic tie-break
    assert(m(0) == ("e", "s") && merges(0).getLong(3) == 9L, merges.toSeq)
    assert(m(1) == ("es", "t"))
    assert(m(2) == ("est", "</w>"))
    assert(m(3) == ("l", "o") && merges(3).getLong(3) == 7L)
    assert(m(4) == ("lo", "w"))
    // application in rank order: encode a doc and round-trip
    val docs = Seq((1L, "low lower newest widest")).toDF("doc_id", "text")
    val enc = TextAnalysis.applyBpeMerges(docs, "doc_id", "text",
      merges.map(r => (r.getString(1), r.getString(2))).toSeq).head()
    val toks = enc.getSeq[String](enc.fieldIndex("tokens"))
    assert(toks.mkString("").replace("</w>", " ").trim == "low lower newest widest")
    // low→[low,</w>]=2, lower→[low,e,r,</w>]=4, newest→[n,e,w,est</w>]=4,
    // widest→[w,i,d,est</w>]=4
    assert(enc.getLong(enc.fieldIndex("n_tokens")) == 14L, toks)
  }

  test("delta.targetFileSize drives OPTIMIZE output file count") {
    val d = tempDir("target-size")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").repartition(8)
    var t = DeltaTable.forPath(d).write(li)
    val total = t.dlog.addActions.values.map(_.size).sum
    val target = total / 4
    t = t.setTableProperties(Map("delta.targetFileSize" -> target.toString))
    t = t.compact(spark, sortBy = Seq("l_orderkey"))
    val expected = math.ceil(
      total.toDouble / target).toInt
    val got = t.fileUris.size
    assert(got >= expected - 1 && got <= expected + 1,
      s"expected ~$expected files from targetFileSize, got $got")
    assertSameRows(t.toDF(spark), li)
    // explicit targetFiles wins over the property
    val t2 = t.compact(spark, sortBy = Seq("l_orderkey"), targetFiles = 2)
    assert(t2.fileUris.size == 2)
  }
}
