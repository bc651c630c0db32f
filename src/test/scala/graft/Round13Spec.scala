package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Round-13 surface: persisted IVF index (build / refresh / query
  * separation, X182).
  */
class Round13Spec extends SparkSuite {

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("ivf index: build + txn-idempotent append + twin query") {
    val d = tempDir("ivf-index")
    val base = emb
    val n = base.count()
    Similarity.ivfIndexBuild(spark, d, base, "vec_id", "embedding",
      nCells = 8, iters = 1)
    val twins = base.withColumn("vec_id", col("vec_id") + 10000)
    Similarity.ivfIndexAppend(spark, d, twins, "vec_id", "embedding",
      batchTxn = Some(("ivf-spec", 1L)))
    val vAfterAppend = DeltaTable.forPath(s"$d/cells").version
    // re-delivered batch: exactly-once, no new commit, no duplicate rows
    Similarity.ivfIndexAppend(spark, d, twins, "vec_id", "embedding",
      batchTxn = Some(("ivf-spec", 1L)))
    val cells = DeltaTable.forPath(s"$d/cells")
    assert(cells.version == vAfterAppend,
      s"replayed append committed: v${cells.version} != v$vAfterAppend")
    assert(cells.toDF(spark).count() == 2 * n)
    // query pays no training: top-1 for each base query is its twin
    val r = Similarity.ivfIndexTopK(spark, d,
        base.filter(col("vec_id") < 5), "vec_id", "embedding", k = 1,
        nProbe = 2)
      .collect()
    assert(r.length == 5)
    r.foreach { row =>
      assert(row.getAs[Long]("neighbor_id") == row.getAs[Long]("query_id") + 10000)
      assert(math.abs(row.getAs[Double]("cos_sim") - 1.0) < 1e-9)
    }
    // codebook is pinned: a mismatched-dim refresh fails loudly
    val bad = base.withColumn("embedding", slice(col("embedding"), 1, 3))
    val ex = intercept[IllegalArgumentException](
      Similarity.ivfIndexAppend(spark, d, bad, "vec_id", "embedding"))
    assert(ex.getMessage.contains("dim"), ex.getMessage)
  }

  test("paragraph minhash pairs duplicates across and inside documents") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 8).select("doc_id", "text")
    // doc 0: unique ++ boiler; doc 1: boiler ++ unique2; doc 2: twice the
    // SAME paragraph (intra-document duplicate)
    val boiler = docs.filter(col("doc_id") === 7).head().getString(1)
    val composed = docs.filter(col("doc_id") < 3).select(col("doc_id"),
      when(col("doc_id") === 0, concat_ws("\n\n", col("text"), lit(boiler)))
        .when(col("doc_id") === 1, concat_ws("\n\n", lit(boiler), col("text")))
        .otherwise(concat_ws("\n\n", lit(boiler), lit(boiler))).as("text"))
    val pairs = Dedup.paragraphMinHashPairs(composed, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getInt(1)),
        (r.getLong(2), r.getInt(3)), r.getDouble(4))).toSet
    // all 4 boiler copies pair: (0,1)x(1,0),(0,1)x(2,0),(0,1)x(2,1),
    // (1,0)x(2,0),(1,0)x(2,1) and the INTRA-doc (2,0)x(2,1)
    assert(pairs.size == 6, pairs.toString)
    assert(pairs.contains(((2L, 0), (2L, 1), 1.0)), "intra-doc pair missing")
    assert(pairs.forall(_._3 == 1.0))
    assert(pairs.forall(p => p._1._1 < p._2._1 ||
      (p._1._1 == p._2._1 && p._1._2 < p._2._2)), "pair ordering")
  }

  test("unimax waterfill: epoch cap binds ascending, leftover flows to the head") {
    import graft.operators.Sampling
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val tok = size(split(lower(col("text")), " "))
    val caps = docs.groupBy("lang").agg(sum(tok.cast("long")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // budget sized from the data so the uniform share strictly exceeds
    // the smallest key's 3-epoch cap — the cap must bind there
    val budget = caps.size * (3L * caps.values.min + 500L)
    val plan = Sampling.unimaxPlan(docs, "lang", tok,
      budgetTokens = budget, maxEpochs = 3.0)
    // every key at most 3 epochs; allocation never exceeds the budget
    plan.foreach { case (k, cap, full, rem) =>
      assert(cap == caps(k))
      assert(full * cap + rem <= 3L * cap, s"$k over the epoch cap")
      assert(rem < cap, s"$k remainder must be a partial epoch")
    }
    val allocated = plan.map { case (_, cap, f, r) => f * cap + r }.sum
    assert(allocated <= budget)
    // the budget is big enough that low-resource keys hit the cap exactly
    val capped = plan.filter { case (_, cap, f, r) => f * cap + r == 3L * cap }
    assert(capped.nonEmpty, "fixture budget should bind the cap somewhere")
    // and the head key absorbs the leftover as a partial epoch
    val en = plan.find(_._1 == "en").get
    assert(en._3 >= 1L && en._4 > 0L, en.toString)
    // materialization: per-key copy totals equal the plan's epochs
    val sampled = Sampling.unimaxSample(docs, "lang", "doc_id", tok,
      budgetTokens = budget, maxEpochs = 3.0)
    val nDocs = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    plan.foreach { case (k, _, full, rem) =>
      assert(rows.getOrElse(k, 0L) >= full * nDocs(k),
        s"$k must carry $full full epochs")
      if (rem == 0) assert(rows(k) == full * nDocs(k), s"$k partial unexpected")
      else assert(rows(k) > full * nDocs(k) && rows(k) <= (full + 1) * nDocs(k))
    }
  }

  test("doremi EG fold: hand-computable updates, clipping, smoothing") {
    import graft.operators.Sampling
    val spark2 = spark
    import spark2.implicits._
    // step 0: A excess ln2 -> lambda (2/3, 1/3); step 1: B excess ln4 ->
    // bumped (2/3, 4/3), z=2 -> (1/3, 2/3). Step-average = (1/2, 1/2),
    // which smoothing maps to itself — exact closed form.
    val losses = Seq(
      (0L, "A", math.log(2.0)), (0L, "B", 0.0),
      (1L, "A", 0.0), (1L, "B", math.log(4.0))
    ).toDF("step", "domain", "excess")
    val w = Sampling.doremiWeights(losses, "step", "domain", "excess",
      eta = 1.0, smoothing = 0.1).toMap
    assert(math.abs(w("A") - 0.5) < 1e-12, w.toString)
    assert(math.abs(w("B") - 0.5) < 1e-12, w.toString)
    // negative excess clips to zero: a domain already below the reference
    // never gains weight, so a one-sided run tilts monotonically
    val tilted = Sampling.doremiWeights(Seq(
      (0L, "A", 1.0), (0L, "B", -5.0)).toDF("step", "domain", "excess"),
      "step", "domain", "excess", eta = 1.0, smoothing = 0.0).toMap
    assert(tilted("A") > 0.7 && tilted("B") < 0.3, tilted.toString)
    assert(math.abs(tilted.values.sum - 1.0) < 1e-12)
  }

  test("incremental clustered OPTIMIZE rewrites only unclustered files") {
    val d = tempDir("inc-cluster")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val half = orders.filter(col("o_orderkey") % 2 === 0)
    var t = DeltaTable.forPath(d).write(half.repartition(4))
    val sortBy = Seq("o_orderkey", "o_custkey")
    t = t.compact(spark, sortBy = sortBy, zOrder = true, incremental = true)
    val v1 = t.version
    val clustered = t.dlog.addActions.values.toSeq
    assert(clustered.forall(a =>
      DeltaTable.clusterSpecOf(a).contains("morton:o_orderkey,o_custkey")),
      "clustered outputs must carry the spec tag")
    // idempotent: everything already clustered under this spec — no-op,
    // decided from the LOG alone (no data read, no commit)
    val t2 = DeltaTable.forPath(d)
      .compact(spark, sortBy = sortBy, zOrder = true, incremental = true)
    assert(t2.version == v1, "re-OPTIMIZE of a clustered table must no-op")
    // new appends: only THEY rewrite; the clustered cube is untouched
    val more = orders.filter(col("o_orderkey") % 2 === 1)
    val t3 = DeltaTable.forPath(d).write(more.repartition(3))
    val preserved = t3.dlog.addActions.keySet
      .intersect(clustered.map(_.path).toSet)
    val t4 = t3.compact(spark, sortBy = sortBy, zOrder = true,
      incremental = true)
    assert(t4.dlog.addActions.keySet.intersect(preserved) == preserved,
      "incremental OPTIMIZE must not rewrite the existing cube")
    val removed = t3.dlog.addActions.keySet -- t4.dlog.addActions.keySet
    assert(removed.size == 3, s"only the 3 appended files rewrite: $removed")
    // rows survive the whole sequence; a FULL (non-incremental) OPTIMIZE
    // still rewrites everything when asked
    assertSameRows(t4.toDF(spark), orders)
    val t5 = t4.compact(spark, sortBy = sortBy, zOrder = true)
    assert(t5.version == t4.version + 1)
    assertSameRows(t5.toDF(spark), orders)
  }

  test("ivf index query scans only the probed cell partitions") {
    val d = tempDir("ivf-prune")
    Similarity.ivfIndexBuild(spark, d, emb, "vec_id", "embedding",
      nCells = 8, iters = 1)
    val totalFiles = DeltaTable.forPath(s"$d/cells").dlog.addActions.size
    assert(totalFiles >= 4, s"fixture too small to show pruning: $totalFiles")
    val df = Similarity.ivfIndexTopK(spark, d,
      emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 1,
      nProbe = 2)
    val qe = df.queryExecution
    qe.executedPlan.executeCollect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case r: ReusedExchangeExec    => Seq(r.child)
        case other                    => other.children
      }
      p +: kids.flatMap(flatten)
    }
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] =
      flatten(p).collect { case s: FileSourceScanExec => s }
    // the cells scan (the one whose output carries the partition column)
    val cellScans = scansOf(qe.executedPlan)
      .filter(_.output.exists(_.name == "cell"))
    assert(cellScans.nonEmpty, "expected a pruned scan of the cells table")
    cellScans.foreach { s =>
      assert(s.metrics("numFiles").value < totalFiles,
        s"probe must partition-prune: read ${s.metrics("numFiles").value} " +
          s"of $totalFiles files")
    }
  }
}
