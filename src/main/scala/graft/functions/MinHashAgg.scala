package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** MinHash signature aggregate: per group, element i of the result array is
  * `min over rows of xxhash64(hash, i)` — the `numHashes` permutation
  * minima of one document's shingle-hash set, computed in ONE buffer.
  *
  * Why a custom aggregate: the column-algebra formulation is `numHashes`
  * separate `min(xxhash64(_s, i))` aggregate expressions — 64 aggregate
  * buffers per group, and 64 independent XxHash64 evaluations per input
  * row each re-hashing the shingle from scratch. This buffer is a
  * long[numHashes] updated in a tight loop that hashes the shingle ONCE
  * and derives the 64 permutation hashes from that state (exactly how
  * Spark's XxHash64 folds its children), on the same ObjectHashAggregate
  * path as Spark's `percentile`, with map-side partial aggregation intact:
  * the shuffle carries one serialized minima array per (partition, doc).
  *
  * Bit-identical to `min(xxhash64(col, lit(i)))`: XxHash64 over the pair
  * (long col, int literal i) evaluates hashInt(i, hashLong(col, 42)).
  */
final case class MinHashAgg(child: Expression, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numHashes >= 1, s"numHashes must be positive: $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_agg"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_agg expects a 64-bit shingle-hash column, got $other")
    }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    // Spark's XxHash64 SKIPS null children, so xxhash64(null, lit(i))
    // evaluates to hashInt(i, seed) — a null row still contributes that
    // constant per permutation. Folding the same way keeps the
    // bit-identical-to-`min(xxhash64(col, lit(i)))` contract for any input.
    val h0 = if (v != null) XXH64.hashLong(v.asInstanceOf[Long], 42L) else 42L
    var i = 0
    while (i < numHashes) {
      val h = XXH64.hashInt(i, h0)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}
