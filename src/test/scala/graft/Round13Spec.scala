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
