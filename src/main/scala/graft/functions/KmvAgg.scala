package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded k-minimum-values state shared by [[KmvAgg]] and [[KmvMergeAgg]]:
  * the k smallest DISTINCT hash values seen so far. TreeSet gives dedup +
  * ordered eviction in one structure; k is small (≤ a few thousand), so the
  * boxing cost is bounded by k, not by input size.
  */
private[functions] object Kmv {
  type Buf = java.util.TreeSet[java.lang.Long]

  def insert(buf: Buf, v: Long, k: Int): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) {
      if (buf.add(v)) { buf.remove(buf.last); () }
    }

  def merge(b1: Buf, b2: Buf, k: Int): Buf = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next(), k)
    b1
  }

  def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 8)
    buf.forEach(v => { bb.putLong(v); () })
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Buf
    while (bb.hasRemaining) buf.add(bb.getLong)
    buf
  }

  def evalSorted(buf: Buf): GenericArrayData = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** K-minimum-values distinct-count sketch aggregate: per group, the k
  * smallest DISTINCT values of a 60-bit hash column (ascending array).
  * `(k-1) · 2^60 / sketch[k-1]` estimates the group's distinct count with
  * ~1/√k relative error — and because `min_k(A ∪ B) = min_k(min_k(A) ∪
  * min_k(B))`, sketches MERGE losslessly: per-shard/per-day sketch rows
  * union into corpus-wide cardinalities without rescanning history (the
  * same store pattern as the MinHash signature table).
  *
  * Why a custom aggregate: Spark's `approx_count_distinct` (HLL++) keeps a
  * mergeable binary state too, but its register layout is
  * implementation-defined — no other engine can replay it. KMV's state is
  * just "k smallest distinct md5-prefix hashes", which DuckDB reproduces
  * bit-for-bit (`('0x' || substr(md5(x),1,15))::BIGINT`), so sketches AND
  * estimates oracle-check exactly. The buffer is a bounded TreeSet on the
  * same ObjectHashAggregate path as `percentile`, with map-side partial
  * aggregation: the shuffle carries ≤k longs per (partition, group).
  */
final case class KmvAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Kmv.Buf] with UnaryLike[Expression] {

  require(k >= 2, s"k must be >= 2: $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_agg expects a 64-bit hash column, got $other")
  }

  override def createAggregationBuffer(): Kmv.Buf = new Kmv.Buf

  override def update(buf: Kmv.Buf, input: InternalRow): Kmv.Buf = {
    val v = child.eval(input)
    // nulls carry no identity — a null never contributes a hash (matches
    // count(DISTINCT col)'s null semantics, unlike the MinHash fold)
    if (v != null) Kmv.insert(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(b1: Kmv.Buf, b2: Kmv.Buf): Kmv.Buf = Kmv.merge(b1, b2, k)
  override def eval(buf: Kmv.Buf): Any = Kmv.evalSorted(buf)
  override def serialize(buf: Kmv.Buf): Array[Byte] = Kmv.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Kmv.Buf = Kmv.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

/** Union of stored KMV sketches (array&lt;long&gt; rows → one sketch): the
  * re-aggregation side of the sketch-store pattern. Identical state and
  * estimator as [[KmvAgg]]; correctness rests on min-k composability.
  */
final case class KmvMergeAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Kmv.Buf] with UnaryLike[Expression] {

  require(k >= 2, s"k must be >= 2: $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_merge_agg expects array<bigint> sketches, got $other")
  }

  override def createAggregationBuffer(): Kmv.Buf = new Kmv.Buf

  override def update(buf: Kmv.Buf, input: InternalRow): Kmv.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) Kmv.insert(buf, arr.getLong(i), k)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Kmv.Buf, b2: Kmv.Buf): Kmv.Buf = Kmv.merge(b1, b2, k)
  override def eval(buf: Kmv.Buf): Any = Kmv.evalSorted(buf)
  override def serialize(buf: Kmv.Buf): Array[Byte] = Kmv.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Kmv.Buf = Kmv.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMergeAgg =
    copy(child = newChild)
}
