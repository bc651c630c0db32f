package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** SimHash signature aggregate: per group, bit j of the result is the sign
  * of Σ_rows (bit j of the input hash ? +1 : -1).
  *
  * Why a custom aggregate: the column-algebra formulation is `numBits`
  * separate `sum(when(bitAND...))` aggregate expressions — 60 aggregate
  * buffers and 60 expression evaluations per input row, a shape wide
  * enough to fall off codegen limits. This is ONE
  * TypedImperativeAggregate whose buffer is a long[numBits] updated in a
  * tight loop per row (same ObjectHashAggregate execution path as Spark's
  * own `percentile`), with map-side partial aggregation intact: the
  * shuffle carries one serialized counter array per (partition, doc), not
  * token rows.
  *
  * Bit-identical to the sum/when formulation: counters accumulate ±1 in
  * the same orientation and ties (counter == 0) produce a 0 bit.
  */
final case class SimHashAgg(child: Expression, numBits: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits >= 1 && numBits <= 64, s"numBits must be in [1,64]: $numBits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_agg expects a 64-bit hash column, got $other")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < numBits) {
        buf(j) += (((h >>> j) & 1L) << 1) - 1L // +1 if bit set, else -1
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numBits) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var j = 0
    while (j < numBits) {
      if (buf(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}
