package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The first 60 bits of md5 as a non-negative long — the engine-independent
  * hash behind SimHash signatures and deterministic splits. Identical to
  * DuckDB's `('0x' || substr(md5(x), 1, 15))::BIGINT` (15 hex digits = the
  * digest's first 7.5 bytes = the big-endian first-8-bytes value >>> 4).
  *
  * Why a custom Expression: the composable formulation
  * `conv(substring(md5(x), 1, 15), 16, 10)` pays a 32-char hex-string
  * allocation plus a radix-conversion parse per value on top of the digest
  * itself — measured ~2x the work of the digest. This computes the long
  * straight from the digest bytes and stays inside whole-stage codegen.
  */
final case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_prefix60 expects string or binary, got $other")
    }

  private def isString: Boolean = child.dataType == StringType

  override def nullSafeEval(v: Any): Any = {
    val bytes =
      if (isString) v.asInstanceOf[UTF8String].getBytes
      else v.asInstanceOf[Array[Byte]]
    Md5Prefix60.hash(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val toBytes =
      if (isString) (v: String) => s"$v.getBytes()"
      else (v: String) => v
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Md5Prefix60.hash(${toBytes(v)});")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {

  // MessageDigest is stateful; one instance per task thread
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Big-endian value of the digest's first 8 bytes, >>> 4: exactly the
    * first 15 hex digits' value, always non-negative.
    */
  def hash(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc >>> 4
  }
}
