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
