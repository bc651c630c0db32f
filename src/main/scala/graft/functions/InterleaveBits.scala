package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.types._

/** Morton (Z-order) code: interleaves the low bits of N non-negative
  * int/long rank columns into one long, so sorting by the result clusters
  * rows that are close in EVERY dimension — the multi-dimensional
  * file-clustering key behind Z-ordered OPTIMIZE. With k dims, each
  * contributes the low ⌊64/k⌋ bits; inputs are expected to be bounded
  * rank buckets (e.g. `ntile` output), not raw values.
  *
  * A linear sort on (a, b) clusters perfectly on `a` and not at all on
  * `b`; the Morton order degrades gracefully across all dims, which is
  * what makes per-file min/max stats selective for predicates on ANY
  * subset of the clustered columns.
  *
  * Null-tolerant: a null rank contributes 0 bits (sorts first, matching
  * NULLS FIRST).
  */
final case class InterleaveBits(children: Seq[Expression]) extends Expression {

  require(children.nonEmpty && children.size <= 8,
    s"interleave_bits supports 1..8 dimensions, got ${children.size}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(c => c.dataType == IntegerType || c.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"interleave_bits expects int/long ranks, got ${children.map(_.dataType).mkString(",")}")

  private def bitsPerDim: Int = 64 / children.size

  override def eval(input: InternalRow): Any = {
    val k = children.size
    val bits = bitsPerDim
    var out = 0L
    var d = 0
    while (d < k) {
      val v = children(d).eval(input)
      if (v != null) {
        val r = v match {
          case i: Int => i.toLong
          case l: Long => l
        }
        var b = 0
        while (b < bits) {
          out |= ((r >>> b) & 1L) << (b * k + d)
          b += 1
        }
      }
      d += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = children.size
    val bits = bitsPerDim
    val out = ctx.freshName("morton")
    val evals = children.map(_.genCode(ctx))
    val body = evals.zipWithIndex.map { case (e, d) =>
      val r = ctx.freshName("r")
      val b = ctx.freshName("b")
      s"""
         |if (!${e.isNull}) {
         |  long $r = (long) ${e.value};
         |  for (int $b = 0; $b < $bits; $b++) {
         |    $out |= (($r >>> $b) & 1L) << ($b * $k + $d);
         |  }
         |}
       """.stripMargin
    }.mkString("\n")
    val childCode = evals.map(_.code).reduce(_ + _)
    ev.copy(
      code = childCode + code"""
        |long $out = 0L;
        |$body
       """.stripMargin,
      isNull = FalseLiteral,
      value = JavaCode.variable(out, LongType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBits =
    copy(children = newChildren)
}
