package graft.sources

import graft.log.Generated
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.types._

/** Partition-filter derivation for GENERATED partition columns —
  * delta-spark's `OptimizeGeneratedColumn` rule, expressed as a pure
  * function both pruning paths share.
  *
  * A table partitioned on `event_date GENERATED ALWAYS AS (CAST(ts AS
  * DATE))` is usually queried by `ts` alone — the producer-facing
  * column — and a filter on `ts` is a DATA filter: it prunes files only
  * where per-file footer stats exist. The generation invariant
  * (`event_date = g(ts)` holds for every row, computed or validated at
  * write time) lets us derive an implied PARTITION predicate, which
  * prunes from log-recorded partition values alone: exact, stats-free,
  * and alive for zero-copy imports whose footers carry no usable stats.
  * At 10⁵ partitions this is the difference between a metadata-pruned
  * scan and a full listing of every file's stats.
  *
  * Soundness: derived filters only REMOVE partitions, and Spark
  * re-applies the original data filter per row in survivors, so a
  * derivation is admissible iff removed partitions provably hold no
  * matching row:
  *
  *  - equality / IN derive for ANY recognized shape: `src = L` implies
  *    `part = g(L)` directly from the invariant;
  *  - range predicates derive only for MONOTONIC non-decreasing shapes
  *    (`CAST(src AS DATE)`, `year(src)`, `date_trunc(u, src)`,
  *    `trunc(src, fmt)`): `src <= L` implies `part <= g(L)`, and the
  *    comparison stays non-strict even for strict sources (`src < L`
  *    still admits `part = g(L)`);
  *  - cyclic shapes (`month`, `day`, `hour`) never derive ranges — month
  *    is not ordered across years;
  *  - NULL `src` lands in the NULL partition and matches no comparison,
  *    and a derived `part <= g(L)` evaluates null→false there — pruned,
  *    correctly, because the source rows match nothing either.
  *
  * Timezone: `g` is evaluated under the session timezone, the same zone
  * the write path used to compute the stored partition values —
  * delta-spark's behavior and caveat alike.
  *
  * Column mapping: generation SQL references LOGICAL names while scans
  * bind PHYSICAL ones. Rename/drop of a generation source is rejected at
  * DDL time and physical names are assigned only on rename, so a source
  * name that resolves in the physical schema IS that column; when it
  * does not resolve, derivation is skipped (safe no-op).
  */
object GeneratedPruning {

  /** One recognized generation shape over a single source column. */
  private final case class Shape(
      source: String,
      resultType: DataType,
      monotonic: Boolean,
      apply: Expression => Expression)

  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case u: UnresolvedAttribute if u.nameParts.length == 1 => Some(u.nameParts.head)
    case _ => None
  }

  /** Parse a generation SQL into a recognized shape, or None. */
  private def shapeOf(sql: String, tz: String): Option[Shape] = {
    val parsed =
      try CatalystSqlParser.parseExpression(sql)
      catch { case _: Exception => return None }
    def date(e: Expression): Expression = Cast(e, DateType, Some(tz))
    def ts(e: Expression): Expression = Cast(e, TimestampType, Some(tz))
    parsed match {
      case c: Cast if c.dataType == DateType =>
        attrName(c.child).map(n => Shape(n, DateType, monotonic = true, date))
      case f: UnresolvedFunction =>
        val name = f.nameParts.map(_.toLowerCase).mkString(".")
        (name, f.arguments) match {
          case ("year", Seq(a)) => attrName(a).map(n =>
            Shape(n, IntegerType, monotonic = true, e => Year(date(e))))
          case ("month", Seq(a)) => attrName(a).map(n =>
            Shape(n, IntegerType, monotonic = false, e => Month(date(e))))
          case ("day" | "dayofmonth", Seq(a)) => attrName(a).map(n =>
            Shape(n, IntegerType, monotonic = false, e => DayOfMonth(date(e))))
          case ("hour", Seq(a)) => attrName(a).map(n =>
            Shape(n, IntegerType, monotonic = false, e => Hour(ts(e), Some(tz))))
          case ("date_trunc", Seq(Literal(fmt, StringType), a)) => attrName(a).map(n =>
            Shape(n, TimestampType, monotonic = true,
              e => TruncTimestamp(Literal(fmt, StringType), ts(e), Some(tz))))
          case ("trunc", Seq(a, Literal(fmt, StringType))) => attrName(a).map(n =>
            Shape(n, DateType, monotonic = true,
              e => TruncDate(date(e), Literal(fmt, StringType))))
          case _ => None
        }
      case _ => None
    }
  }

  /** g(L) as an internal-value Literal; None when evaluation fails or
    * yields null (an unevaluable bound must not prune anything).
    */
  private def evalAt(shape: Shape, lit: Literal): Option[Literal] =
    try {
      val v = shape.apply(lit).eval(null)
      if (v == null) None else Some(Literal(v, shape.resultType))
    } catch { case _: Exception => None }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** Derived partition-filter expressions implied by `dataFilters` for
    * every generated partition column of `schema`. Attributes in the
    * result are plain `AttributeReference(partitionCol)` — callers bind
    * them by name, exactly like user-written partition filters.
    */
  def derive(dataFilters: Seq[Expression], schema: StructType,
      partitionCols: Seq[String], tz: String): Seq[Expression] = {
    if (dataFilters.isEmpty) return Seq.empty
    val gen = Generated.expressions(schema)
    val shapes: Seq[(String, Shape)] = partitionCols.flatMap { p =>
      gen.get(p).flatMap(shapeOf(_, tz))
        // the source must resolve in THIS schema (see mapping note above),
        // and the declared partition type must be the shape's result type —
        // a mismatch would compare internal values across representations
        .filter(s => schema.fieldNames.contains(s.source) &&
          schema.fields.find(_.name == p).exists(_.dataType == s.resultType))
        // range derivation additionally requires a source ORDERED like its
        // derived value: true for date/timestamp sources, FALSE for e.g.
        // strings — "2024-1-5" sorts above "2024-02-01" lexicographically
        // while its date sorts below, so `src <= L` does not bound
        // `cast(src AS DATE)`. Equality/IN stay valid for any source.
        .map { s =>
          val srcOrdered = schema.fields.find(_.name == s.source)
            .exists(f => f.dataType == DateType ||
              f.dataType == TimestampType || f.dataType == TimestampNTZType)
          p -> (if (srcOrdered) s else s.copy(monotonic = false))
        }
    }
    if (shapes.isEmpty) return Seq.empty
    // Column-built predicates arrive as UnresolvedFunction("<", ...) etc.;
    // normalize folds them into the comparison nodes matched below (a
    // no-op on already-resolved planner filters)
    val atoms = dataFilters.map(DataSkipping.normalize).flatMap(conjuncts)
    shapes.flatMap { case (p, shape) =>
      val part = AttributeReference(p, shape.resultType, nullable = true)()
      def g(l: Literal): Option[Literal] = evalAt(shape, l)
      atoms.flatMap { atom =>
        val derived: Option[Expression] = atom match {
          case EqualTo(a, l: Literal) if attrName(a).contains(shape.source) =>
            g(l).map(EqualTo(part, _))
          case EqualTo(l: Literal, a) if attrName(a).contains(shape.source) =>
            g(l).map(EqualTo(part, _))
          case In(a, vs) if attrName(a).contains(shape.source) &&
              vs.forall(_.isInstanceOf[Literal]) =>
            val bounds = vs.map(v => g(v.asInstanceOf[Literal]))
            if (bounds.exists(_.isEmpty)) None
            else Some(In(part, bounds.map(_.get).distinct))
          case LessThan(a, l: Literal) if shape.monotonic &&
              attrName(a).contains(shape.source) =>
            g(l).map(LessThanOrEqual(part, _))
          case LessThanOrEqual(a, l: Literal) if shape.monotonic &&
              attrName(a).contains(shape.source) =>
            g(l).map(LessThanOrEqual(part, _))
          case GreaterThan(a, l: Literal) if shape.monotonic &&
              attrName(a).contains(shape.source) =>
            g(l).map(GreaterThanOrEqual(part, _))
          case GreaterThanOrEqual(a, l: Literal) if shape.monotonic &&
              attrName(a).contains(shape.source) =>
            g(l).map(GreaterThanOrEqual(part, _))
          // literal-on-the-left ranges: flip the comparison
          case LessThan(l: Literal, a) if shape.monotonic &&
              attrName(a).contains(shape.source) =>
            g(l).map(GreaterThanOrEqual(part, _))
          case LessThanOrEqual(l: Literal, a) if shape.monotonic &&
              attrName(a).contains(shape.source) =>
            g(l).map(GreaterThanOrEqual(part, _))
          case GreaterThan(l: Literal, a) if shape.monotonic &&
              attrName(a).contains(shape.source) =>
            g(l).map(LessThanOrEqual(part, _))
          case GreaterThanOrEqual(l: Literal, a) if shape.monotonic &&
              attrName(a).contains(shape.source) =>
            g(l).map(LessThanOrEqual(part, _))
          case _ => None
        }
        derived
      }
    }
  }
}
