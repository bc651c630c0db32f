package graft.sources

import graft.log.AddFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Answer whole-table `COUNT(*)` / `COUNT(col)` / `MIN(col)` / `MAX(col)`
  * from the transaction log's per-file statistics — no file is opened
  * (delta-spark's OptimizeMetadataOnlyDeltaQuery, re-derived over the
  * graft log). At 100 TB the difference is a row-count dashboard query
  * costing one log replay instead of a 10⁵-file scan.
  *
  * The rewrite fires only when the answer is PROVABLY exact:
  *
  *  - every live file carries `numRecords` (graft always writes it);
  *    COUNT subtracts deletion-vector cardinality per file;
  *  - `MIN`/`MAX` require DV-free files (a dead row may hold the
  *    extremum), stats present (or the file provably all-null), and a
  *    type whose recorded bound is attained: integral/double/date/bool
  *    data columns; strings only below the 32-char truncation horizon;
  *    timestamps when recorded at full microsecond precision (graft's
  *    own stats) or as partition values — a foreign ms-truncated bound
  *    is floored/widened, not attained; NaN-free doubles (parquet
  *    footers omit double stats when a NaN is present, so presence
  *    implies absence);
  *  - an optional WHERE must split the file set EXACTLY: every may-match
  *    file provably all-match ([[DataSkipping.exactMatchingFiles]]) —
  *    partition predicates and stats-disjoint range predicates qualify,
  *    a straddling file falls back to the scan;
  *  - `COUNT(col)` uses per-file `nullCount` (partition columns: the
  *    partition value's null-ness times live rows).
  *
  * Anything unprovable leaves the plan untouched. Disable with
  * `spark.graft.metadataOnlyAggregates=false`.
  */
final class MetadataOnlyAggregates(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    session.conf.get("spark.graft.metadataOnlyAggregates", "true") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg @ Aggregate(Nil, aggExprs, child, _)
          if aggExprs.forall(_.deterministic) =>
        unwrap(child, None) match {
          case Some((idx, filter)) =>
            answer(idx, filter, aggExprs) match {
              case Some(row) => LocalRelation(agg.output, Seq(row))
              case None => agg
            }
          case None => agg
        }
      // grouped flavor: GROUP BY over PARTITION columns only — each
      // group is a set of whole files, so every whole-table rule applies
      // per group ("rows per day" on a date-partitioned 100 TB table is
      // a log-only query)
      case agg @ Aggregate(groupings, aggExprs, child, _)
          if groupings.nonEmpty && groupings.forall(_.isInstanceOf[AttributeReference]) &&
            aggExprs.forall(_.deterministic) =>
        unwrap(child, None) match {
          case Some((idx, filter)) =>
            answerGrouped(idx, filter,
              groupings.map(_.asInstanceOf[AttributeReference]), aggExprs) match {
              case Some(rows) => LocalRelation(agg.output, rows)
              case None => agg
            }
          case None => agg
        }
    }
  }

  /** Partition-grouped metadata answer: rows in group order of first
    * appearance, or None when unprovable (a grouping column that is not
    * a partition column, an unparseable partition value, or any
    * per-group aggregate the whole-table rules refuse).
    */
  private def answerGrouped(idx: GraftFileIndex, filter: Option[Expression],
      groupings: Seq[AttributeReference],
      aggExprs: Seq[NamedExpression]): Option[Seq[InternalRow]] = {
    val schema = idx.statsSchema
    val partCols = idx.partitionColumnNames
    val gFields = groupings.map { g =>
      val f = fieldOf(schema, g.name).getOrElse(return None)
      if (!partCols.exists(_.equalsIgnoreCase(f.name))) return None
      f
    }
    val files: Seq[AddFile] = filter match {
      case None => idx.liveAdds
      case Some(f) =>
        DataSkipping.exactMatchingFiles(idx.liveAdds, f, schema, partCols)
          .getOrElse(return None)
    }
    val memo = MetadataOnlyAggregates.memoFor(idx)
    // group files by their partition tuple for the grouping columns;
    // a missing partition key bails, an empty value is a NULL group key
    val grouped = scala.collection.mutable.LinkedHashMap
      .empty[Seq[Option[String]], Vector[AddFile]]
    files.foreach { a =>
      val key = gFields.map(f => partitionValue(a, f).getOrElse(return None))
      grouped.updateWith(key)(v => Some(v.getOrElse(Vector.empty) :+ a))
    }
    val rows = grouped.flatMap { case (key, group) =>
      // a group whose files hold zero live rows (empty create-commit
      // files, numRecords==0 foreign adds, fully-DV-dead files) emits NO
      // row from a real scan — skip it here too; an unknown row count
      // makes live-ness unprovable, so bail entirely
      val liveTotal = group.foldLeft(Option(0L))((acc, a) =>
        for { s <- acc; n <- liveOf(a) } yield s + n).getOrElse(return None)
      if (liveTotal == 0L) Nil else {
      val keyInternal: Map[String, Any] = gFields.zip(key).map { case (f, pv) =>
        f.name.toLowerCase -> pv.filter(_.nonEmpty)
          .map(s => DataSkipping.partitionValueOf(s, f.dataType)
            .map(toInternal(_, f.dataType)).getOrElse(return None))
          .orNull
      }.toMap
      val values = aggExprs.map {
        case Alias(l: Literal, _) => l.value
        case l: Literal => l.value
        case a: AttributeReference => keyInternal.getOrElse(
          a.name.toLowerCase, return None)
        case Alias(a: AttributeReference, _) => keyInternal.getOrElse(
          a.name.toLowerCase, return None)
        case Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
          aggValue(fn, group, schema, partCols, memo).getOrElse(return None)
        case _ => return None
      }
      Seq(InternalRow.fromSeq(values))
      }
    }.toSeq
    Some(rows)
  }

  /** Peel attribute-only Projects and deterministic Filters down to a
    * graft log-backed relation. Any other operator (joins, DV anti-join,
    * column-mapping renames) disqualifies the rewrite.
    */
  private def unwrap(plan: LogicalPlan, filter: Option[Expression])
      : Option[(GraftFileIndex, Option[Expression])] = plan match {
    case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(c, filter)
    case Filter(cond, c) if cond.deterministic =>
      unwrap(c, Some(filter.map(And(_, cond)).getOrElse(cond)))
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case g: GraftFileIndex => Some((g, filter))
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  private def answer(idx: GraftFileIndex, filter: Option[Expression],
      aggExprs: Seq[NamedExpression]): Option[InternalRow] = {
    val schema = idx.statsSchema
    val partCols = idx.partitionColumnNames
    val files: Seq[AddFile] = filter match {
      case None => idx.liveAdds
      case Some(f) =>
        DataSkipping.exactMatchingFiles(idx.liveAdds, f, schema, partCols)
          .getOrElse(return None)
    }
    val memo = MetadataOnlyAggregates.memoFor(idx)
    val values = aggExprs.map {
      case Alias(l: Literal, _) => l.value
      case l: Literal => l.value
      case Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
        aggValue(fn, files, schema, partCols, memo).getOrElse(return None)
      case _ => return None
    }
    Some(InternalRow.fromSeq(values))
  }

  private def dvCard(a: AddFile): Long =
    DeletionVectors.refOf(a).map(_.cardinality).getOrElse(0L)

  private def liveOf(a: AddFile): Option[Long] = a.numRecords.map(_ - dvCard(a))

  private def fieldOf(schema: StructType, name: String): Option[StructField] =
    schema.fields.find(_.name.equalsIgnoreCase(name))

  private def partitionValue(a: AddFile, field: StructField): Option[Option[String]] =
    a.partitionValues.collectFirst {
      case (k, pv) if k.equalsIgnoreCase(field.name) => pv
    }

  private def aggValue(fn: AggregateFunction, files: Seq[AddFile],
      schema: StructType, partCols: Seq[String],
      memo: MetadataOnlyAggregates.StatsMemo): Option[Any] = fn match {
    case Count(Seq(l: Literal)) if l.value != null =>
      // COUNT(*) / COUNT(1): live rows
      files.foldLeft(Option(0L))((acc, a) =>
        for { s <- acc; n <- liveOf(a) } yield s + n)
    case Count(Seq(attr: AttributeReference)) =>
      val f = fieldOf(schema, attr.name).getOrElse(return None)
      if (partCols.exists(_.equalsIgnoreCase(f.name)))
        files.foldLeft(Option(0L))((acc, a) =>
          for {
            s <- acc
            pv <- partitionValue(a, f)
            n <- if (pv.exists(_.nonEmpty)) liveOf(a) else Some(0L)
          } yield s + n)
      else
        // dead rows' null-ness is unrecorded → DV disqualifies
        files.foldLeft(Option(0L))((acc, a) =>
          for {
            s <- acc
            if dvCard(a) == 0L
            n <- a.numRecords
            st = memo.of(a)
            nc <- st.nullCount.get(f.name)
          } yield s + (n - nc))
    case Min(attr: AttributeReference) =>
      extremum(files, schema, partCols, attr, isMax = false, memo)
    case Max(attr: AttributeReference) =>
      extremum(files, schema, partCols, attr, isMax = true, memo)
    case _ => None
  }

  /** MIN/MAX over the file set, or None when unprovable. Some(null) is a
    * legitimate answer (no live non-null rows).
    */
  private def extremum(files: Seq[AddFile], schema: StructType,
      partCols: Seq[String], attr: AttributeReference,
      isMax: Boolean, memo: MetadataOnlyAggregates.StatsMemo): Option[Any] = {
    val f = fieldOf(schema, attr.name).getOrElse(return None)
    val isPartition = partCols.exists(_.equalsIgnoreCase(f.name))
    // recorded stats bounds are attained only for these; partition
    // values are exact for any parseable type
    val statsTypeOk = f.dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | DateType | BooleanType => true
      case _ => false
    }
    var best: Option[Any] = None
    files.foreach { a =>
      // null = this file contributes nothing (all-null / zero live rows)
      val contrib: Any =
        if (isPartition) partitionValue(a, f) match {
          case Some(pv) =>
            if (pv.forall(_.isEmpty)) null // null partition value: no contribution
            else liveOf(a) match {
              case None => return None // unknown row count: pv may be unattained
              case Some(0L) => null // fully-dead or empty file
              case Some(_) => pv.flatMap(
                DataSkipping.partitionValueOf(_, f.dataType))
                .getOrElse(return None)
            }
          case None => return None
        }
        else {
          if (dvCard(a) > 0L) return None
          val st = memo.of(a)
          // stat absent (or timestamp not exactly recorded): a provable
          // all-null file contributes nothing, anything else bails
          def allNullOrBail: Any =
            (st.nullCount.get(f.name), st.numRecords) match {
              case (Some(nc), Some(n)) if nc == n => null
              case _ => return None
            }
          f.dataType match {
            case _: TimestampType | _: TimestampNTZType =>
              // exact only at full microsecond precision (a foreign
              // ms-truncated bound is floored/widened, never attained)
              DataSkipping.exactTimestampStat(a, f.name,
                  if (isMax) "maxValues" else "minValues")
                .getOrElse(allNullOrBail)
            case _ =>
              val side = if (isMax) st.max else st.min
              side.get(f.name) match {
                case Some(v) =>
                  if (!statsTypeOk) {
                    // strings: exact below the 32-char truncation horizon
                    if (f.dataType != StringType) return None
                    val s = v.asInstanceOf[String]
                    if (s.length >= 32) return None
                  }
                  v match {
                    case d: Double if d.isNaN => return None
                    case _ =>
                  }
                  v
                case None => allNullOrBail
              }
          }
        }
      if (contrib != null) best = best match {
        case None => Some(contrib)
        case Some(cur) =>
          val c = DataSkipping.cmp(contrib, cur).getOrElse(return None)
          if ((isMax && c > 0) || (!isMax && c < 0)) Some(contrib) else Some(cur)
      }
    }
    Some(best.map(toInternal(_, f.dataType)).orNull)
  }

  /** Comparison-domain value → Catalyst internal value. */
  private def toInternal(v: Any, dt: DataType): Any = dt match {
    case LongType => v.asInstanceOf[Long]
    case IntegerType => v.asInstanceOf[Long].toInt
    case ShortType => v.asInstanceOf[Long].toShort
    case ByteType => v.asInstanceOf[Long].toByte
    case DoubleType => v.asInstanceOf[Double]
    case FloatType => v.asInstanceOf[Double].toFloat
    case BooleanType => v
    case DateType => v.asInstanceOf[Long].toInt
    case StringType => UTF8String.fromString(v.asInstanceOf[String])
    case _: TimestampType | _: TimestampNTZType => v.asInstanceOf[Long]
    case other => throw new IllegalStateException(s"unreachable: $other")
  }
}

object MetadataOnlyAggregates {

  /** Per-snapshot stats-parse memo: COUNT(col)/MIN/MAX each walk the file
    * list, so an N-agg query over an M-file snapshot parsed each stats
    * JSON N times (measured 0.6 s of driver time at M = 10⁵, PLANNER
    * probe), and every re-query of the same DataFrame re-parsed all M.
    * One parse per file per index instead, keyed WEAKLY on index identity
    * (an index embodies one immutable snapshot; its `liveAdds` Seq is
    * stable), so the memo dies with the index.
    */
  private[sources] final class StatsMemo(schema: StructType) {
    private val cache = new java.util.IdentityHashMap[AddFile, DataSkipping.FileStats]()
    def of(a: AddFile): DataSkipping.FileStats = synchronized {
      val hit = cache.get(a)
      if (hit != null) hit
      else { val v = DataSkipping.parseStats(a, schema); cache.put(a, v); v }
    }
  }

  private val memos = new java.util.WeakHashMap[GraftFileIndex, StatsMemo]()

  private[sources] def memoFor(idx: GraftFileIndex): StatsMemo =
    memos.synchronized {
      val hit = memos.get(idx)
      if (hit != null) hit
      else {
        val m = new StatsMemo(idx.statsSchema)
        memos.put(idx, m)
        m
      }
    }
}
