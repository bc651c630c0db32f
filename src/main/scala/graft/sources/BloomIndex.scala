package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import graft.functions.BloomAgg
import graft.log.{AddFile, Json}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file Bloom-filter point-lookup index, carried in `AddFile.extra`.
  *
  * Min/max stats prune range predicates on CLUSTERED columns; they are
  * useless for `id = X` on a high-cardinality column in a hash-scattered
  * layout, where every file's [min,max] spans the whole domain — the
  * needle-in-100-TB lookup reads every file. A per-file Bloom filter
  * answers "is this value definitely absent from this file?" in the
  * driver, before any plan exists, pruning to the handful of files that
  * can contain the probed key (false positives only cost an extra file
  * read; false negatives cannot happen).
  *
  * Storage: `extra("bloom") = { "<column>": {"bits":n,"k":h,"data":b64} }`
  * on a dataChange=false re-add — rides log replay, checkpoints and
  * clones exactly like deletion-vector refs; other extra keys (e.g. a
  * `deletionVector`) are preserved. Dead rows of a DV'd file stay in its
  * filter — false-positive-only, so correctness is unaffected.
  *
  * Hash parity: the build side feeds Spark's codegen'd `xxhash64` (seed
  * 42) of the column (integrals cast to LONG first) into [[BloomAgg]];
  * the probe recomputes the identical hash driver-side ([[hashOf]]).
  */
object BloomIndex {

  val ExtraKey = "bloom"

  final case class BloomRef(bits: Int, k: Int, words: Array[Long]) {
    def mayContain(hash: Long): Boolean = BloomAgg.mayContain(words, hash, bits, k)
  }

  /** Column types the index supports (probe hashing must match Spark's
    * xxhash64 of the BUILD expression, see [[buildExpr]]).
    */
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType => true
    case _ => false
  }

  /** The column expression whose xxhash64 both sides agree on. */
  def buildExpr(name: String, dt: DataType): org.apache.spark.sql.Column = {
    val c = org.apache.spark.sql.functions.col(name)
    dt match {
      case ByteType | ShortType | IntegerType => c.cast(LongType)
      case _ => c
    }
  }

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Driver-side Spark-xxhash64 of a literal probing a column of
    * `columnType` — None (no exclusion) unless the literal's type FAMILY
    * matches the indexed column's: the filter was built in the column's
    * hash domain, so a type-coerced comparison (long column = '4321')
    * hashed in the literal's own domain would wrongly prove absence and
    * silently drop matching files. NULL never equals anything.
    */
  def hashOf(raw: Any, columnType: DataType): Option[Long] = (raw, columnType) match {
    case (null, _) => None
    case (v: Byte, t) if integral(t) => Some(XXH64.hashLong(v.toLong, 42L))
    case (v: Short, t) if integral(t) => Some(XXH64.hashLong(v.toLong, 42L))
    case (v: Int, t) if integral(t) => Some(XXH64.hashLong(v.toLong, 42L))
    case (v: Long, t) if integral(t) => Some(XXH64.hashLong(v, 42L))
    case (v: UTF8String, StringType) =>
      Some(XXH64.hashUnsafeBytes(v.getBaseObject, v.getBaseOffset, v.numBytes, 42L))
    case (v: String, StringType) =>
      val u = UTF8String.fromString(v)
      Some(XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L))
    case _ => None
  }

  /** The add's Bloom ref for `column`, if indexed. */
  def refOf(add: AddFile, column: String): Option[BloomRef] =
    add.extra.get(ExtraKey).flatMap { node =>
      val c = node.path(column)
      if (c.isMissingNode) None
      else for {
        bits <- Json.longOpt(c, "bits").map(_.toInt)
        k <- Json.longOpt(c, "k").map(_.toInt)
        data <- Json.strOpt(c, "data")
      } yield BloomRef(bits, k, decode(data))
    }

  /** Re-add carrying the filter; other extra keys and dataChange=false are
    * preserved (an index build changes no data).
    */
  def withBloom(add: AddFile, column: String, bits: Int, k: Int,
      words: Array[Long]): AddFile = {
    val colNode = Json.obj()
    colNode.put("bits", bits)
    colNode.put("k", k)
    colNode.put("data", encode(words))
    val node = add.extra.get(ExtraKey) match {
      case Some(existing: com.fasterxml.jackson.databind.node.ObjectNode) =>
        existing.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
      case _ => Json.obj()
    }
    node.set[JsonNode](column, colNode)
    add.copy(extra = add.extra + (ExtraKey -> (node: JsonNode)), dataChange = false)
  }

  // one shared longs<->bytes framing (BloomAgg's shuffle serialization),
  // Base64-wrapped for the JSON log
  def encode(words: Array[Long]): String =
    java.util.Base64.getEncoder.encodeToString(BloomAgg.toBytes(words))

  def decode(data: String): Array[Long] =
    BloomAgg.fromBytes(java.util.Base64.getDecoder.decode(data))
}
