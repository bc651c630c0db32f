package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Closed-form linear model fitting as ONE Spark aggregation — the
  * quality-classifier-calibration shape of a curation pipeline (fit a
  * cheap linear scorer on document features, score the corpus): ridge
  * regression by the normal equations, where the Gram matrix Xᵀ X and
  * moment vector Xᵀ y are d(d+1)/2 + d codegen'd `sum()` aggregates in
  * one pass (d is the FEATURE count, single digits — the d×d solve is
  * driver-side arithmetic on a handful of doubles).
  *
  * Scale shape: the corpus is touched exactly once, map-side-combined
  * into one (tiny, fixed-width) row; no iteration, no shuffle beyond the
  * one aggregate exchange, no driver data. Contrast with gradient
  * methods, which pay one job PER step for the same model class.
  */
object Regression {

  /** Ridge coefficients β = (Xᵀ X + λI)⁻¹ Xᵀ y, fit in one aggregation.
    * Include an explicit `lit(1.0)` feature for an intercept (it is
    * regularized like every other coordinate — document the convention
    * to the caller). Coefficients round to 8 decimals so a refit's
    * summation-order ulp noise cannot leak into downstream rounded
    * scores.
    */
  def ridgeFit(df: DataFrame, features: Seq[Column], target: Column,
      lambda: Double = 1.0): Array[Double] = {
    val d = features.size
    require(d >= 1 && d <= 32, s"feature count must be in [1, 32]: $d")
    val gramCols =
      (for (i <- 0 until d; j <- i until d)
        yield sum(features(i) * features(j)).as(s"g_${i}_$j")) ++
        (0 until d).map(i => sum(features(i) * target).as(s"m_$i"))
    val row = df.agg(gramCols.head, gramCols.tail: _*).head()
    val g = Array.ofDim[Double](d, d)
    var c = 0
    for (i <- 0 until d; j <- i until d) {
      g(i)(j) = row.getDouble(c); g(j)(i) = g(i)(j); c += 1
    }
    val m = Array.tabulate(d)(i => row.getDouble(c + i))
    for (i <- 0 until d) g(i)(i) += lambda
    solve(g, m).map(x =>
      BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  /** L2-regularized logistic regression by IRLS — the fastText-style
    * quality CLASSIFIER shape (fit on labeled docs, score the corpus with
    * a probability). Each Newton step is ONE map-side-combined aggregation
    * (the weighted Gram `Σ w·xᵢ·xⱼ` and moment `Σ xᵢ·(w·xβ + y − p)` as
    * codegen'd sums over the current β as literals) plus a driver-side
    * d×d solve — `iters` passes total, no per-row driver data, no
    * shuffle beyond each pass's aggregate exchange. A FIXED iteration
    * count (not a convergence test) keeps refits deterministic; λ > 0
    * bounds β when classes are separable. Coefficients round to 8
    * decimals for the same refit-noise reason as [[ridgeFit]].
    */
  def logisticFit(df: DataFrame, features: Seq[Column], label: Column,
      lambda: Double = 1.0, iters: Int = 8): Array[Double] = {
    val d = features.size
    require(d >= 1 && d <= 32, s"feature count must be in [1, 32]: $d")
    require(iters >= 1 && iters <= 64, s"iters must be in [1, 64]: $iters")
    // materialize (features, label) ONCE: the passes differ only in the
    // β literals, so iterating over the raw frame would re-run the whole
    // feature pipeline (text parsing, typically) `iters` times — cached,
    // each Newton step reads d+1 doubles per row (narrow, column-pruned)
    val mat = df.select(
      features.zipWithIndex.map { case (f, i) => f.cast("double").as(s"_x$i") } :+
        label.cast("double").as("_y"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val xs = (0 until d).map(i => col(s"_x$i"))
      var beta = Array.fill(d)(0.0)
      for (_ <- 0 until iters) {
        val xb = xs.zip(beta).map { case (f, b) => f * lit(b) }.reduce(_ + _)
        val p = lit(1.0) / (lit(1.0) + exp(-xb))
        val w = p * (lit(1.0) - p)
        val z = w * xb + col("_y") - p
        val aggCols =
          (for (i <- 0 until d; j <- i until d)
            yield sum(w * xs(i) * xs(j)).as(s"g_${i}_$j")) ++
            (0 until d).map(i => sum(xs(i) * z).as(s"m_$i"))
        val row = mat.agg(aggCols.head, aggCols.tail: _*).head()
        val g = Array.ofDim[Double](d, d)
        var c = 0
        for (i <- 0 until d; j <- i until d) {
          g(i)(j) = row.getDouble(c); g(j)(i) = g(i)(j); c += 1
        }
        val m = Array.tabulate(d)(i => row.getDouble(c + i))
        for (i <- 0 until d) g(i)(i) += lambda
        beta = solve(g, m)
      }
      beta.map(x =>
        BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble)
    } finally { mat.unpersist(); () }
  }

  /** σ(x·β) as a codegen'd column — the classifier's probability. */
  def scoreLogistic(features: Seq[Column], coefs: Array[Double]): Column =
    lit(1.0) / (lit(1.0) + exp(-score(features, coefs)))

  /** x·β as a codegen'd column over the same feature expressions. */
  def score(features: Seq[Column], coefs: Array[Double]): Column = {
    require(features.size == coefs.length, "feature/coefficient arity mismatch")
    features.zip(coefs).map { case (f, b) => f * lit(b) }.reduce(_ + _)
  }

  /** Gaussian elimination with partial pivoting (d ≤ 32 — driver-side). */
  private def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val d = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    for (p <- 0 until d) {
      var best = p
      for (r <- p + 1 until d) if (math.abs(a(r)(p)) > math.abs(a(best)(p))) best = r
      val tmp = a(p); a(p) = a(best); a(best) = tmp
      val tb = b(p); b(p) = b(best); b(best) = tb
      require(math.abs(a(p)(p)) > 1e-12,
        s"singular normal equations at pivot $p (collinear features?)")
      for (r <- p + 1 until d) {
        val f = a(r)(p) / a(p)(p)
        for (cc <- p until d) a(r)(cc) -= f * a(p)(cc)
        b(r) -= f * b(p)
      }
    }
    val x = new Array[Double](d)
    for (p <- d - 1 to 0 by -1) {
      var s = b(p)
      for (cc <- p + 1 until d) s -= a(p)(cc) * x(cc)
      x(p) = s / a(p)(p)
    }
    x
  }
}
