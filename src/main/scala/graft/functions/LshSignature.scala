package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd sign-random-projection LSH signature: bit p of the
  * result is set iff `vec . planes(p) > 0`.
  *
  * Why a custom Expression (SURVEY.md §4): higher-order functions don't
  * participate in whole-stage codegen, so the HOF formulation pays
  * per-element interpreted lambda dispatch across planes x dims work per
  * row — the dominant cost of the ANN/near-dup blocking stage. This fuses
  * the whole plane loop into one generated method over the raw `ArrayData`
  * with the plane matrix held as a constant reference object.
  *
  * Bit-compatible with the HOF composition: projections accumulate
  * left-to-right in doubles over min(vecLen, planeDim) elements (zip_with
  * null-padding + coalesce-to-0 contributes nothing beyond the shorter
  * length), and bit p is set on strictly-positive projection.
  */
final case class LshSignature(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  // `1L << p` wraps mod 64 in Java: a 65th plane would silently alias bit 0
  // and degrade recall with no error, so reject it at construction.
  require(planes.length <= 64,
    s"lsh_signature packs bits into one long; got ${planes.length} planes (max 64)")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_signature expects array<float|double>, got $other")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val f = isFloat
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(arr.numElements(), plane.length)
      var proj = 0.0
      var i = 0
      while (i < n) {
        val x = if (f) arr.getFloat(i).toDouble else arr.getDouble(i)
        proj += x * plane(i)
        i += 1
      }
      if (proj > 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    val getter =
      if (isFloat) (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      else (arr: String, i: String) => s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val proj = ctx.freshName("proj")
      val plane = ctx.freshName("plane")
      val sig = ctx.freshName("sig")
      s"""
         |long $sig = 0L;
         |for (int $p = 0; $p < $planesRef.length; $p++) {
         |  double[] $plane = $planesRef[$p];
         |  int $n = java.lang.Math.min($v.numElements(), $plane.length);
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $proj += ${getter(v, i)} * $plane[$i];
         |  }
         |  if ($proj > 0) $sig |= 1L << $p;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)
}
