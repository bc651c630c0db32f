package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd IVF cell probe: the indices of the `nProbe` centroids
  * most cosine-similar to the vector, in descending similarity (ties by
  * lower index). With nProbe=1 this is the assignment step of an IVF
  * index; with nProbe>1 it is the multi-probe query step.
  *
  * Same rationale as [[LshSignature]]: the centroid matrix is a constant
  * reference object and the cells x dims loop runs inside whole-stage
  * codegen — this is the per-row hot loop of IVF indexing, where HOF
  * formulations pay interpreted dispatch per element.
  */
final case class NearestCentroids(child: Expression,
    centroids: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression {

  require(nProbe >= 1 && nProbe <= centroids.length,
    s"nProbe must be in [1, ${centroids.length}]: $nProbe")

  // Centroid norms are row-invariant; computing them inside the per-row
  // loop would add O(cells x dims) redundant work to the hot path. sqrt is
  // taken once here; a zero-norm centroid gets 1.0 so the division is a
  // no-op on its (necessarily zero) dot product.
  private val invNorms: Array[Double] =
    centroids.map { cent =>
      var nc = 0.0; var i = 0
      while (i < cent.length) { nc += cent(i) * cent(i); i += 1 }
      if (nc > 0) 1.0 / math.sqrt(nc) else 1.0
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroids expects array<float|double>, got $other")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Similarity of `arr` to every centroid (cosine numerator over centroid
    * norm; the vector's own norm is constant per row and can't change the
    * ordering, so it is skipped).
    */
  private def sims(arr: ArrayData): Array[Double] = {
    val f = isFloat
    val out = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = math.min(arr.numElements(), cent.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (f) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += x * cent(i)
        i += 1
      }
      out(c) = dot * invNorms(c)
      c += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any = {
    val s = sims(v.asInstanceOf[ArrayData])
    val used = new Array[Boolean](s.length)
    val picks = new Array[Int](nProbe)
    var p = 0
    while (p < nProbe) {
      var best = -1
      var c = 0
      while (c < s.length) {
        if (!used(c) && (best < 0 || s(c) > s(best))) best = c
        c += 1
      }
      used(best) = true
      picks(p) = best
      p += 1
    }
    new GenericArrayData(picks)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    val normRef = ctx.addReferenceObj("ivfInvNorms", invNorms, "double[]")
    val getter =
      if (isFloat) (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      else (arr: String, i: String) => s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val cent = ctx.freshName("cent")
      val s = ctx.freshName("sims"); val used = ctx.freshName("used")
      val picks = ctx.freshName("picks"); val p = ctx.freshName("p")
      val best = ctx.freshName("best")
      s"""
         |double[] $s = new double[$centRef.length];
         |for (int $c = 0; $c < $centRef.length; $c++) {
         |  double[] $cent = $centRef[$c];
         |  int $n = java.lang.Math.min($v.numElements(), $cent.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ${getter(v, i)} * $cent[$i];
         |  }
         |  $s[$c] = $dot * $normRef[$c];
         |}
         |boolean[] $used = new boolean[$s.length];
         |int[] $picks = new int[$nProbe];
         |for (int $p = 0; $p < $nProbe; $p++) {
         |  int $best = -1;
         |  for (int $c = 0; $c < $s.length; $c++) {
         |    if (!$used[$c] && ($best < 0 || $s[$c] > $s[$best])) $best = $c;
         |  }
         |  $used[$best] = true;
         |  $picks[$p] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($picks);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}
