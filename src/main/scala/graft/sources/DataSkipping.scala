package graft.sources

import graft.log.{AddFile, Json}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.time.{Instant, LocalDate}

/** Driver-side data skipping: evaluate a predicate conservatively against
  * each live file's log-recorded partition values and min/max/nullCount
  * statistics, and drop files that provably contain no matching row —
  * BEFORE any Spark plan is built.
  *
  * This exceeds the reference (which collects stats but leaves using them
  * as a TODO, xdlake/__init__.py:104) and is the decisive 100 TB lever: a
  * selective predicate on a sorted/partitioned column turns a full-table
  * scan into a handful of file reads, and DELETE's find-touched-files
  * phase (SURVEY.md §3.3) only opens candidate files.
  *
  * Semantics: `mayMatch` must never return false for a file that could
  * hold a matching row. Unknown expressions, missing stats, and
  * unsupported types all return true (keep the file); exact filtering
  * still happens in the scan, so skipping is purely an optimization.
  */
object DataSkipping {

  /** Per-column stats parsed from an add's JSON `stats` string, normalized
    * to the comparison domain (Long / Double / String / Boolean; dates →
    * epoch day Long, timestamps → epoch micros Long).
    */
  final case class FileStats(
      numRecords: Option[Long],
      min: Map[String, Any],
      max: Map[String, Any],
      nullCount: Map[String, Long])

  def parseStats(add: AddFile, schema: StructType): FileStats = {
    add.stats.flatMap { s =>
      try {
        val root = Json.mapper.readTree(s)
        // nested stats objects (delta's shape for struct columns) flatten
        // to dotted keys, matching the pruner's attribute paths
        def side(field: String, isMax: Boolean): Map[String, Any] = {
          def walk(prefix: String, node: com.fasterxml.jackson.databind.JsonNode,
              st: StructType): Seq[(String, Any)] =
            st.fields.toSeq.flatMap { f =>
              val v = node.path(f.name)
              val key = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
              f.dataType match {
                case nested: StructType if v.isObject => walk(key, v, nested)
                case dt =>
                  if (v.isMissingNode || v.isNull) None
                  else normalizeStat(v, dt).map { n =>
                    key -> (if (isMax) widenTruncatedMax(v, dt, n) else n)
                  }
              }
            }
          walk("", root.path(field), schema).toMap
        }
        val nulls = {
          def walk(prefix: String, node: com.fasterxml.jackson.databind.JsonNode,
              st: StructType): Seq[(String, Long)] =
            st.fields.toSeq.flatMap { f =>
              val v = node.path(f.name)
              val key = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
              f.dataType match {
                case nested: StructType if v.isObject => walk(key, v, nested)
                case _ => if (v.isIntegralNumber) Some(key -> v.asLong()) else None
              }
            }
          walk("", root.path("nullCount"), schema).toMap
        }
        Some(FileStats(
          if (root.path("numRecords").isIntegralNumber) Some(root.path("numRecords").asLong()) else None,
          side("minValues", isMax = false), side("maxValues", isMax = true), nulls))
      } catch { case _: Exception => None }
    }.getOrElse(FileStats(None, Map.empty, Map.empty, Map.empty))
  }

  /** A timestamp max written with fewer than 6 fractional-second digits
    * (delta-rs/delta-spark truncate to milliseconds; Delta's own spec
    * rounds max UP by 1 ms for exactly this reason) may be floored below
    * the file's true maximum. Widen it to the end of its millisecond so
    * the bound is conservative: a widened max only ever KEEPS files.
    * Min truncation floors downward, which is already conservative.
    */
  private def widenTruncatedMax(v: com.fasterxml.jackson.databind.JsonNode,
      dt: DataType, normalized: Any): Any = dt match {
    case _: TimestampType | _: TimestampNTZType =>
      (normalized, fractionalDigits(v.asText())) match {
        case (micros: Long, d) if d < 6 =>
          // d fractional digits → truncation grain 10^(6-d) µs; widen to
          // the end of that grain (ms-truncated "….999" → +999 µs,
          // second-truncated "…:00" → +999999 µs)
          micros + (math.pow(10, 6 - d).toLong - 1L)
        case _ => normalized
      }
    case _ => normalized
  }

  /** Count fractional-second digits in an ISO-8601 timestamp string. */
  private def fractionalDigits(s: String): Int = {
    val dot = s.indexOf('.')
    if (dot < 0) 0
    else s.drop(dot + 1).takeWhile(_.isDigit).length
  }

  /** Stats JSON value → comparison-domain value for the column's type. */
  private def normalizeStat(v: com.fasterxml.jackson.databind.JsonNode,
      dt: DataType): Option[Any] = try {
    dt match {
      case ByteType | ShortType | IntegerType | LongType => Some(v.asLong())
      case FloatType | DoubleType => Some(v.asDouble())
      case StringType => Some(v.asText())
      case BooleanType => Some(v.asBoolean())
      case DateType => Some(LocalDate.parse(v.asText()).toEpochDay)
      case _: TimestampType | _: TimestampNTZType =>
        val inst = java.time.OffsetDateTime.parse(v.asText()).toInstant
        Some(inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
      case _ => None
    }
  } catch { case _: Exception => None }

  /** Catalyst literal value → the same comparison domain. */
  private def normalizeLit(value: Any, dt: DataType): Option[Any] = value match {
    case null => None
    case u: UTF8String => Some(u.toString)
    case b: Byte => Some(b.toLong)
    case s: Short => Some(s.toLong)
    case i: Int => dt match {
      case DateType => Some(i.toLong) // epoch days
      case _ => Some(i.toLong)
    }
    case l: Long => Some(l) // micros for timestamp types
    case f: Float => Some(f.toDouble)
    case d: Double => Some(d)
    case b: Boolean => Some(b)
    case d: java.math.BigDecimal => Some(d.doubleValue())
    case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
    case _ => None
  }

  private[sources] def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case (x: Long, y: Double) => Some(java.lang.Double.compare(x.toDouble, y))
    case (x: Double, y: Long) => Some(java.lang.Double.compare(x, y.toDouble))
    case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  /** Hive partition string → comparison domain for the column's type. */
  private def normalizePartition(s: String, dt: DataType): Option[Any] = try {
    dt match {
      case ByteType | ShortType | IntegerType | LongType => Some(s.toLong)
      case FloatType | DoubleType => Some(s.toDouble)
      case StringType => Some(s)
      case BooleanType => Some(s.toBoolean)
      case DateType => Some(LocalDate.parse(s).toEpochDay)
      case _: TimestampType | _: TimestampNTZType =>
        val inst =
          try java.time.OffsetDateTime.parse(s).toInstant
          catch { case _: Exception =>
            java.time.LocalDateTime.parse(s.replace(' ', 'T'))
              .toInstant(java.time.ZoneOffset.UTC)
          }
        Some(inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
      case _ => None
    }
  } catch { case _: Exception => None }

  /** Evaluate a foldable scalar subexpression (e.g. `Cast(Literal, ts)`),
    * supplying the session timezone to tz-aware casts.
    */
  private def evalFoldable(e: Expression): Option[(Any, DataType)] = try {
    val withTz = e.transformUp {
      case c: Cast if c.needsTimeZone && c.timeZoneId.isEmpty => c.withTimeZone("UTC")
    }
    if (withTz.foldable) Option(withTz.eval(null)).map(_ -> withTz.dataType)
    else None
  } catch { case _: Exception => None }

  private def attrName(e: Expression): Option[String] = e match {
    // FULL dotted path, not nameParts.last: `col("s.a")` must resolve
    // against the NESTED leaf's stats — taking the last part would prune
    // s.a predicates with an unrelated top-level column a's bounds
    case a: UnresolvedAttribute => Some(a.nameParts.mkString("."))
    case a: AttributeReference => Some(a.name)
    case g: org.apache.spark.sql.catalyst.expressions.GetStructField =>
      attrName(g.child).map(p => s"$p.${g.extractFieldName}")
    case _ => None
  }

  /** The classic Column DSL reaches the converter as `UnresolvedFunction`
    * nodes named "=", "<", "and", … — rewrite the known predicate shapes
    * into their Catalyst counterparts so the pruner can pattern-match.
    */
  private[sources] def normalize(e: Expression): Expression = e match {
    case f: UnresolvedFunction =>
      val as = f.arguments.map(normalize)
      (f.nameParts.last.toLowerCase, as) match {
        case ("=" | "==", Seq(l, r)) => EqualTo(l, r)
        case ("<=>", Seq(l, r)) => EqualNullSafe(l, r)
        case ("<", Seq(l, r)) => LessThan(l, r)
        case ("<=", Seq(l, r)) => LessThanOrEqual(l, r)
        case (">", Seq(l, r)) => GreaterThan(l, r)
        case (">=", Seq(l, r)) => GreaterThanOrEqual(l, r)
        case ("and", Seq(l, r)) => And(l, r)
        case ("or", Seq(l, r)) => Or(l, r)
        case ("!" | "not", Seq(c)) => Not(c)
        case ("in", l +: rest) if rest.nonEmpty => In(l, rest)
        case ("isnull", Seq(c)) => IsNull(c)
        case ("isnotnull", Seq(c)) => IsNotNull(c)
        case ("startswith", Seq(l, r)) => StartsWith(l, r)
        case _ => f.copy(arguments = as)
      }
    case other => other.mapChildren(normalize)
  }

  /** Per-file conservative predicate evaluator. */
  final class FilePruner(schema: StructType, partitionColumns: Seq[String]) {

    // top-level fields PLUS nested struct leaves under their dotted path
    // (the StructField's name IS the dotted path, so stats lookups and
    // error messages stay uniform)
    private val fieldByLower: Map[String, StructField] = {
      def entries(prefix: String, st: StructType): Seq[StructField] =
        st.fields.toSeq.flatMap { f =>
          val key = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
          f.dataType match {
            case nested: StructType =>
              StructField(key, f.dataType, f.nullable) +: entries(key, nested)
            case _ => Seq(StructField(key, f.dataType, f.nullable))
          }
        }
      entries("", schema).map(f => f.name.toLowerCase -> f).toMap
    }
    private val partitionLower = partitionColumns.map(_.toLowerCase).toSet

    def mayMatch(pred: Expression, add: AddFile): Boolean = {
      lazy val stats = parseStats(add, schema)
      eval(pred, add, stats)
    }

    def allMatch(pred: Expression, add: AddFile): Boolean = {
      lazy val stats = parseStats(add, schema)
      evalAll(pred, add, stats)
    }

    // Dual of `eval`: true only when EVERY row of the file PROVABLY
    // satisfies `e` (three-valued TRUE — a null predicate row is a miss,
    // so data columns additionally need nullCount == 0 evidence).
    // Default false: unknown shapes, missing stats, unsupported types
    // all prove nothing. Widened maxima / truncated minima (X200, the
    // timestamp-grain widening) stay safe in this direction too: stats
    // max ≥ true max, so max < v still implies every row < v; stats
    // min ≤ true min symmetric.
    private def evalAll(e: Expression, add: AddFile, st: FileStats): Boolean = e match {
      case Literal(true, BooleanType) => true
      case And(l, r) => evalAll(l, add, st) && evalAll(r, add, st)
      // sufficient, not necessary (rows may split between the branches) —
      // conservative in the right direction
      case Or(l, r) => evalAll(l, add, st) || evalAll(r, add, st)
      case EqualTo(a, v) if attrName(a).isDefined =>
        provablyConstantEqual(a, v, add, st)
      case EqualTo(v, a) if attrName(a).isDefined =>
        provablyConstantEqual(a, v, add, st)
      case EqualNullSafe(a, v) if attrName(a).isDefined =>
        provablyConstantEqual(a, v, add, st)
      case EqualNullSafe(v, a) if attrName(a).isDefined =>
        provablyConstantEqual(a, v, add, st)
      case LessThan(a, v) if attrName(a).isDefined => allBinary(a, v, add, st)(allLt)
      case LessThan(v, a) if attrName(a).isDefined => allBinary(a, v, add, st)(allGt)
      case LessThanOrEqual(a, v) if attrName(a).isDefined => allBinary(a, v, add, st)(allLe)
      case LessThanOrEqual(v, a) if attrName(a).isDefined => allBinary(a, v, add, st)(allGe)
      case GreaterThan(a, v) if attrName(a).isDefined => allBinary(a, v, add, st)(allGt)
      case GreaterThan(v, a) if attrName(a).isDefined => allBinary(a, v, add, st)(allLt)
      case GreaterThanOrEqual(a, v) if attrName(a).isDefined => allBinary(a, v, add, st)(allGe)
      case GreaterThanOrEqual(v, a) if attrName(a).isDefined => allBinary(a, v, add, st)(allLe)
      case In(a, vs) if attrName(a).isDefined =>
        vs.exists(v => provablyConstantEqual(a, v, add, st))
      // every row != v: the whole [min, max] range lies strictly on one
      // side of v (for a partition column: the value simply differs)
      case Not(EqualTo(a, v)) if attrName(a).isDefined =>
        allBinary(a, v, add, st)(allNe)
      case Not(EqualTo(v, a)) if attrName(a).isDefined =>
        allBinary(a, v, add, st)(allNe)
      case IsNull(a) => provablyAllNull(a, add, st)
      case Not(IsNotNull(a)) => provablyAllNull(a, add, st)
      case IsNotNull(a) => provablyNoNulls(a, add, st)
      case Not(IsNull(a)) => provablyNoNulls(a, add, st)
      case _ => false
    }

    private def provablyAllNull(a: Expression, add: AddFile, st: FileStats): Boolean =
      attrName(a).flatMap(n => fieldByLower.get(n.toLowerCase)).exists { f =>
        if (partitionLower.contains(f.name.toLowerCase))
          add.partitionValues.collectFirst {
            case (k, pv) if k.equalsIgnoreCase(f.name) => pv
          }.exists(_.isEmpty)
        else (st.nullCount.get(f.name), st.numRecords) match {
          case (Some(n), Some(total)) => n == total
          case _ => false
        }
      }

    private def provablyNoNulls(a: Expression, add: AddFile, st: FileStats): Boolean =
      attrName(a).flatMap(n => fieldByLower.get(n.toLowerCase)).exists { f =>
        if (partitionLower.contains(f.name.toLowerCase))
          add.partitionValues.collectFirst {
            case (k, pv) if k.equalsIgnoreCase(f.name) => pv
          }.exists(_.nonEmpty)
        else st.nullCount.get(f.name).contains(0L)
      }

    private def allLt(lo: Option[Any], hi: Option[Any], v: Any): Boolean =
      hi.exists(h => cmp(h, v).exists(_ < 0))
    private def allLe(lo: Option[Any], hi: Option[Any], v: Any): Boolean =
      hi.exists(h => cmp(h, v).exists(_ <= 0))
    private def allGt(lo: Option[Any], hi: Option[Any], v: Any): Boolean =
      lo.exists(l => cmp(l, v).exists(_ > 0))
    private def allGe(lo: Option[Any], hi: Option[Any], v: Any): Boolean =
      lo.exists(l => cmp(l, v).exists(_ >= 0))
    private def allNe(lo: Option[Any], hi: Option[Any], v: Any): Boolean =
      lo.exists(l => cmp(l, v).exists(_ > 0)) ||
        hi.exists(h => cmp(h, v).exists(_ < 0))

    /** `binary`'s dual: missing attribute, unparseable literal, missing
      * stats side, or surviving nulls all prove NOTHING (false).
      */
    private def allBinary(a: Expression, v: Expression, add: AddFile,
        st: FileStats)(test: (Option[Any], Option[Any], Any) => Boolean): Boolean =
      (attrName(a), evalFoldable(v)) match {
        case (Some(name), Some((raw, dt))) =>
          fieldByLower.get(name.toLowerCase) match {
            case None => false
            case Some(field) =>
              normalizeLit(raw, dt) match {
                case None => false
                case Some(value) =>
                  if (partitionLower.contains(field.name.toLowerCase))
                    add.partitionValues.collectFirst {
                      case (k, pv) if k.equalsIgnoreCase(field.name) => pv
                    }.flatten.flatMap(normalizePartition(_, field.dataType))
                      .exists(pv => test(Some(pv), Some(pv), value))
                  else st.nullCount.get(field.name).contains(0L) &&
                    test(st.min.get(field.name), st.max.get(field.name), value)
              }
          }
        case _ => false
      }

    // three-valued not needed: conservative boolean (true = can't exclude)
    private def eval(e: Expression, add: AddFile, st: FileStats): Boolean = e match {
      case And(l, r) => eval(l, add, st) && eval(r, add, st)
      case Or(l, r) => eval(l, add, st) || eval(r, add, st)
      case EqualTo(l, r) =>
        if (attrName(l).isDefined) binary(l, r, add, st)(eq) && !bloomExcludes(l, r, add)
        else binary(r, l, add, st)(eq) && !bloomExcludes(r, l, add)
      case EqualNullSafe(l, r) =>
        if (attrName(l).isDefined) binary(l, r, add, st)(eq) && !bloomExcludes(l, r, add)
        else binary(r, l, add, st)(eq) && !bloomExcludes(r, l, add)
      case LessThan(a, v) if attrName(a).isDefined => binary(a, v, add, st)(ltOp)
      case LessThan(v, a) => binary(a, v, add, st)(gtOp)
      case LessThanOrEqual(a, v) if attrName(a).isDefined => binary(a, v, add, st)(leOp)
      case LessThanOrEqual(v, a) => binary(a, v, add, st)(geOp)
      case GreaterThan(a, v) if attrName(a).isDefined => binary(a, v, add, st)(gtOp)
      case GreaterThan(v, a) => binary(a, v, add, st)(ltOp)
      case GreaterThanOrEqual(a, v) if attrName(a).isDefined => binary(a, v, add, st)(geOp)
      case GreaterThanOrEqual(v, a) => binary(a, v, add, st)(leOp)
      case In(a, vs) if attrName(a).isDefined =>
        vs.exists(v => binary(a, v, add, st)(eq) && !bloomExcludes(a, v, add))
      case IsNull(a) => attrName(a) match {
        case Some(name) =>
          val f = fieldByLower.get(name.toLowerCase)
          if (f.isEmpty) true
          else if (partitionLower.contains(name.toLowerCase))
            add.partitionValues.get(f.get.name).orElse(
              add.partitionValues.collectFirst {
                case (k, v) if k.equalsIgnoreCase(name) => v
              }).forall(_.isEmpty)
          else st.nullCount.get(f.get.name).forall(_ > 0)
        case None => true
      }
      case IsNotNull(a) => attrName(a) match {
        case Some(name) =>
          val f = fieldByLower.get(name.toLowerCase)
          if (f.isEmpty) true
          else if (partitionLower.contains(name.toLowerCase))
            add.partitionValues.collectFirst {
              case (k, v) if k.equalsIgnoreCase(name) => v
            }.forall(_.nonEmpty)
          else (st.nullCount.get(f.get.name), st.numRecords) match {
            case (Some(n), Some(total)) => n < total
            case _ => true
          }
        case None => true
      }
      // Not(attr = v): skippable only when the file provably contains ONLY
      // v (min == max == v and no nulls) — then no row can satisfy the Not
      case Not(EqualTo(a, v)) if attrName(a).isDefined =>
        !provablyConstantEqual(a, v, add, st)
      case Not(EqualTo(v, a)) if attrName(a).isDefined =>
        !provablyConstantEqual(a, v, add, st)
      case StartsWith(a, v) if attrName(a).isDefined =>
        (attrName(a), evalFoldable(v)) match {
          case (Some(name), Some((raw: UTF8String, _))) =>
            fieldByLower.get(name.toLowerCase) match {
              case Some(f) if f.dataType == StringType &&
                  !partitionLower.contains(f.name.toLowerCase) =>
                val prefix = raw.toString
                // [min, max] must intersect the prefix range
                val lo = st.min.get(f.name).collect { case s: String => s }
                val hi = st.max.get(f.name).collect { case s: String => s }
                lo.forall(l => l.take(prefix.length) <= prefix) &&
                  hi.forall(h => h.take(prefix.length) >= prefix)
              case _ => true
            }
          case _ => true
        }
      case _ => true // unknown shape: never skip
    }

    /** File provably holds only value v in column a: min == max == v and
      * zero nulls (or a partition column equal to v).
      */
    private def provablyConstantEqual(a: Expression, v: Expression,
        add: AddFile, st: FileStats): Boolean = {
      (attrName(a), evalFoldable(v)) match {
        case (Some(name), Some((raw, dt))) =>
          fieldByLower.get(name.toLowerCase) match {
            case None => false
            case Some(field) =>
              normalizeLit(raw, dt) match {
                case None => false
                case Some(value) =>
                  if (partitionLower.contains(field.name.toLowerCase))
                    add.partitionValues.collectFirst {
                      case (k, pv) if k.equalsIgnoreCase(field.name) => pv
                    }.flatten.flatMap(normalizePartition(_, field.dataType))
                      .exists(pv => cmp(pv, value).contains(0))
                  else {
                    val noNulls = st.nullCount.get(field.name).contains(0L)
                    val constant = for {
                      lo <- st.min.get(field.name)
                      hi <- st.max.get(field.name)
                    } yield cmp(lo, value).contains(0) && cmp(hi, value).contains(0)
                    noNulls && constant.getOrElse(false)
                  }
              }
          }
        case _ => false
      }
    }

    private def eq(lo: Option[Any], hi: Option[Any], v: Any): Boolean =
      lo.forall(l => cmp(l, v).forall(_ <= 0)) &&
        hi.forall(h => cmp(v, h).forall(_ <= 0))
    private def ltOp(lo: Option[Any], hi: Option[Any], v: Any): Boolean =
      lo.forall(l => cmp(l, v).forall(_ < 0))
    private def leOp(lo: Option[Any], hi: Option[Any], v: Any): Boolean =
      lo.forall(l => cmp(l, v).forall(_ <= 0))
    private def gtOp(lo: Option[Any], hi: Option[Any], v: Any): Boolean =
      hi.forall(h => cmp(v, h).forall(_ < 0))
    private def geOp(lo: Option[Any], hi: Option[Any], v: Any): Boolean =
      hi.forall(h => cmp(v, h).forall(_ <= 0))

    /** Compare attribute `a`'s file range against foldable value `v` with
      * the operator's interval test. Missing info → keep the file.
      */
    // decoded per-file filters memoized for the pruner's lifetime (one
    // prune pass): an IN-list over N files would otherwise Base64-decode
    // the same kilobytes k·N times
    private val bloomCache =
      scala.collection.mutable.HashMap.empty[(String, String), Option[BloomIndex.BloomRef]]

    /** True iff the add carries a Bloom index for the probed column and
      * the filter proves the literal ABSENT (false-positive-only: never
      * excludes a file that holds the value). Missing index, partition
      * column, type-family mismatch with the indexed column, unsupported
      * literal → false (no exclusion).
      */
    private def bloomExcludes(a: Expression, v: Expression, add: AddFile): Boolean =
      (for {
        name <- attrName(a)
        field <- fieldByLower.get(name.toLowerCase)
        if !partitionLower.contains(field.name.toLowerCase)
        ref <- bloomCache.getOrElseUpdate((add.path, field.name),
          BloomIndex.refOf(add, field.name))
        rawDt <- evalFoldable(v)
        h <- BloomIndex.hashOf(rawDt._1, field.dataType)
      } yield !ref.mayContain(h)).getOrElse(false)

    private def binary(a: Expression, v: Expression, add: AddFile,
        st: FileStats)(test: (Option[Any], Option[Any], Any) => Boolean): Boolean = {
      (attrName(a), evalFoldable(v)) match {
        case (Some(name), Some((raw, dt))) =>
          fieldByLower.get(name.toLowerCase) match {
            case None => true
            case Some(field) =>
              normalizeLit(raw, dt) match {
                case None => true
                case Some(value) =>
                  if (partitionLower.contains(field.name.toLowerCase)) {
                    add.partitionValues.collectFirst {
                      case (k, pv) if k.equalsIgnoreCase(field.name) => pv
                    }.flatten match {
                      case Some(pvStr) => normalizePartition(pvStr, field.dataType) match {
                        case Some(pv) => test(Some(pv), Some(pv), value)
                        case None => true
                      }
                      case None => false // null partition value never compares true
                    }
                  } else {
                    val lo = st.min.get(field.name)
                    val hi = st.max.get(field.name)
                    if (lo.isEmpty && hi.isEmpty) true else test(lo, hi, value)
                  }
              }
          }
        case _ => true
      }
    }
  }

  /** Prune an add-list with a user predicate (public entry point). */
  def prune(adds: Seq[AddFile], pred: Column, schema: StructType,
      partitionColumns: Seq[String]): Seq[AddFile] = {
    val pruner = new FilePruner(schema, partitionColumns)
    val e = normalize(ColumnShim.expression(pred))
    adds.filter(pruner.mayMatch(e, _))
  }

  /** Dual of [[prune]]: the subset of `adds` whose EVERY physical row
    * provably satisfies `pred` per log-recorded partition values and
    * min/max/nullCount stats — complete evidence only, so a DELETE may
    * drop the file from the log without ever opening it (delta-spark's
    * metadata-only delete, generalized from partition predicates to any
    * stats-proven range). Physical rows ⊇ live rows, so the proof holds
    * for DV'd files too.
    */
  def provablyAllMatch(adds: Seq[AddFile], pred: Column, schema: StructType,
      partitionColumns: Seq[String]): Seq[AddFile] = {
    val pruner = new FilePruner(schema, partitionColumns)
    val e = normalize(ColumnShim.expression(pred))
    adds.filter(pruner.allMatch(e, _))
  }

  /** The EXACT file set matching an (already-resolved) predicate, when
    * stats can prove it: every may-match file must also be provably
    * all-match — then pruning is a partition of the add-list, not an
    * approximation, and metadata-only answers over the kept files are
    * exact. A single straddling file returns None (caller must scan).
    */
  def exactMatchingFiles(adds: Seq[AddFile], pred: Expression,
      schema: StructType, partitionColumns: Seq[String]): Option[Seq[AddFile]] = {
    val pruner = new FilePruner(schema, partitionColumns)
    val e = normalize(pred)
    val kept = adds.filter(pruner.mayMatch(e, _))
    if (kept.forall(pruner.allMatch(e, _))) Some(kept) else None
  }

  /** Hive partition string → comparison domain (exposed for the
    * metadata-only aggregate rule; partition values are exact, so they
    * may serve MIN/MAX answers types the truncatable file stats cannot).
    */
  def partitionValueOf(s: String, dt: DataType): Option[Any] =
    normalizePartition(s, dt)

  /** EXACT timestamp stat in micros, or None: the recorded bound counts
    * as attained only when it carries full microsecond precision — a
    * foreign ms-truncated maximum is floored (then conservatively
    * widened for pruning), and a truncated minimum is floored below the
    * attained value, so neither may serve a metadata-only MIN/MAX.
    * `field` is the dotted stats key; `side` "minValues"/"maxValues".
    */
  def exactTimestampStat(add: AddFile, field: String, side: String): Option[Long] =
    add.stats.flatMap { s =>
      try {
        val root = Json.mapper.readTree(s)
        val v = field.split('.').foldLeft(root.path(side))((n, p) => n.path(p))
        if (!v.isTextual || fractionalDigits(v.asText()) != 6) None
        else {
          val inst = java.time.OffsetDateTime.parse(v.asText()).toInstant
          Some(inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
        }
      } catch { case _: Exception => None }
    }
}
