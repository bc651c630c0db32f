package graft.sql

import graft.DeltaTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel,
  UnresolvedIdentifier, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{ColumnDefinition,
  CreateTable, CreateTableAsSelect, InsertIntoStatement, LogicalPlan,
  MergeIntoTable, ReplaceTable, ReplaceTableAsSelect, SubqueryAlias,
  TableSpec, TableSpecBase, UnresolvedTableSpec}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.StringType

/** Resolves `graft.`/path`` (and the delta-spark spelling `delta.`/path``)
  * table references inside ANY SQL statement to log-backed snapshot scans
  * — the `ResolveDeltaPathTable` analogue. With it, plain
  * `spark.sql("SELECT … FROM graft.`/warehouse/events` …")` works,
  * including joins across graft tables and Spark's own time-travel
  * syntax: `VERSION AS OF n` / `TIMESTAMP AS OF '…'` map to the same log
  * replay the Scala API uses.
  *
  * Applied by [[GraftSqlParser]] POST-PARSE rather than as an injected
  * analyzer rule: `graft` is a registered v1 DataSource name, so Spark's
  * own `ResolveSQLOnFile` claims `graft.`path`` references FIRST and
  * fails analysis ("unsupported data source type for direct query")
  * before any extended resolution rule runs — rewriting the freshly
  * parsed tree sidesteps that ordering; analyzed snapshot subtrees embed
  * in an unanalyzed plan exactly like a DataFrame union's children.
  *
  * Only references that LOOK like paths (absolute or URI) AND carry a
  * delta log resolve here; everything else stays unresolved so catalog
  * resolution and its error messages are untouched. Resolution cost is
  * the driver-side log replay every scan pays — no extra analysis work.
  */
class GraftPathResolution(session: SparkSession) extends Rule[LogicalPlan] {

  private def pathOf(parts: Seq[String]): Option[String] = parts match {
    case Seq(scheme, p)
      if (scheme.equalsIgnoreCase("graft") || scheme.equalsIgnoreCase("delta")) &&
        (p.startsWith("/") || p.contains("://")) => Some(p)
    case _ => None
  }

  /** None when no log exists at the path — the reference falls through to
    * the catalog, whose not-found error names the identifier.
    */
  private def open(path: String): Option[DeltaTable] = {
    val t = DeltaTable.forPath(path, conf = ColumnShim.hadoopConf(session))
    if (t.version < 0) None else Some(t)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // INSERTs first, and top-down: the table child must NOT be rewritten
    // into a raw file relation (Spark would then plan a bare parquet
    // write into the table directory — files with no log commit, i.e.
    // corruption). The captured command is a LEAF, so the read rewrite
    // below cannot descend into it — its query is rewritten here.
    val afterInserts = plan.transformDown {
      case i: InsertIntoStatement => i.table match {
        case u: UnresolvedRelation if pathOf(u.multipartIdentifier).isDefined =>
          val path = pathOf(u.multipartIdentifier).get
          require(i.partitionSpec.isEmpty && !i.ifPartitionNotExists,
            "INSERT into a graft path table supports no PARTITION spec " +
              "(partitioning is table metadata; use the table's own layout)")
          GraftInsertCommand(path, rewriteReads(i.query), i.overwrite,
            i.byName, i.userSpecifiedCols)
        case _ => i
      }
      // CREATE/REPLACE TABLE a graft path (schema-only and AS SELECT):
      // same corruption guard — a CTAS target must never become a raw
      // file write. The CTAS query is read-rewritten at capture.
      case ct: CreateTable if identPath(ct.name).isDefined =>
        createCmd(identPath(ct.name).get, Some(ct.columns), ct.partitioning,
          ct.tableSpec, None, orReplace = false, ifNotExists = ct.ignoreIfExists)
      case ct: CreateTableAsSelect if identPath(ct.name).isDefined =>
        createCmd(identPath(ct.name).get, None, ct.partitioning, ct.tableSpec,
          Some(rewriteReads(ct.query)), orReplace = false,
          ifNotExists = ct.ignoreIfExists)
      case rt: ReplaceTable if identPath(rt.name).isDefined =>
        createCmd(identPath(rt.name).get, Some(rt.columns), rt.partitioning,
          rt.tableSpec, None, orReplace = true, ifNotExists = false)
      case rt: ReplaceTableAsSelect if identPath(rt.name).isDefined =>
        createCmd(identPath(rt.name).get, None, rt.partitioning, rt.tableSpec,
          Some(rewriteReads(rt.query)), orReplace = true, ifNotExists = false)
      // MERGE INTO a graft path: same top-down capture as INSERT — the
      // target must never fall through to the read rewrite (a merge
      // against a raw file relation would plan a log-bypassing write).
      // The command is a LEAF, so only its source is read-rewritten here.
      case m: MergeIntoTable =>
        val (tgtAlias, tgtPath) = m.targetTable match {
          case SubqueryAlias(id, u: UnresolvedRelation) =>
            (Some(id.name), pathOf(u.multipartIdentifier))
          case u: UnresolvedRelation => (None, pathOf(u.multipartIdentifier))
          case _ => (None, None)
        }
        tgtPath match {
          case None => m
          case Some(path) =>
            val srcAlias = m.sourceTable match {
              case SubqueryAlias(id, _) => Some(id.name)
              case _ => None
            }
            GraftMergeCommand(path, rewriteReads(m.sourceTable), tgtAlias,
              srcAlias,
              new MergeSpecHolder(m.mergeCondition, m.matchedActions,
                m.notMatchedActions, m.notMatchedBySourceActions),
              m.schemaEvolutionEnabled)
        }
    }
    rewriteReads(afterInserts)
  }

  private def identPath(name: LogicalPlan): Option[String] = name match {
    case u: UnresolvedIdentifier => pathOf(u.nameParts)
    case _ => None
  }

  /** Build the create command from the parsed v2 pieces, validating that
    * nothing unsupported (a LOCATION differing from the path address,
    * a non-graft provider, non-identity partition transforms) slips
    * through silently.
    */
  private def createCmd(path: String,
      columns: Option[Seq[ColumnDefinition]],
      partitioning: Seq[org.apache.spark.sql.connector.expressions.Transform],
      spec: TableSpecBase, query: Option[LogicalPlan], orReplace: Boolean,
      ifNotExists: Boolean): LogicalPlan = {
    val (props, provider, location) = spec match {
      case s: TableSpec => (s.properties, s.provider, s.location)
      case s: UnresolvedTableSpec => (s.properties, s.provider, s.location)
      case other => throw new IllegalArgumentException(
        s"unsupported table spec: $other")
    }
    provider.foreach(p => require(
      p.equalsIgnoreCase("graft") || p.equalsIgnoreCase("delta") ||
        p.equalsIgnoreCase("parquet"),
      s"CREATE TABLE over a graft path supports USING graft, got USING $p"))
    location.foreach(l => require(l == path,
      s"LOCATION '$l' conflicts with the path address '$path'"))
    // CLUSTER BY arrives as a ClusterByTransform among the partitioning
    // transforms; everything else must be a plain identity column ref
    val (clusterTs, partTs) = partitioning.partition {
      case org.apache.spark.sql.connector.expressions.ClusterByTransform(_) => true
      case _ => false
    }
    val clusterCols = clusterTs.flatMap {
      case org.apache.spark.sql.connector.expressions.ClusterByTransform(refs) =>
        refs.map(_.fieldNames.mkString("."))
    }
    val partCols = partTs.map { t =>
      require(t.name == "identity" && t.references.length == 1,
        s"only PARTITIONED BY (column) is supported, got: $t")
      t.references.head.fieldNames.mkString(".")
    }
    // GENERATED ALWAYS AS (expr) / AS IDENTITY ride the parsed column
    // definitions; they hand off to the engine's pre-create declarations
    val colDefs = columns.getOrElse(Seq.empty)
    val generated = colDefs.flatMap(c => c.generationExpression.map(c.name -> _))
    val identity = colDefs.flatMap(c => c.identityColumnSpec.map(s =>
      (c.name, s.getStart, s.getStep, s.isAllowExplicitInsert)))
    val schemaJson = columns.filter(_.nonEmpty).map { cols =>
      org.apache.spark.sql.types.StructType(cols.map { c =>
        val base = org.apache.spark.sql.types.StructField(
          c.name, c.dataType, c.nullable)
        c.comment.map(cm => base.copy(metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .putString("comment", cm).build())).getOrElse(base)
      }).json
    }
    GraftCreateTableCommand(path, schemaJson, partCols, props, query,
      orReplace, ifNotExists, generated, identity, clusterCols)
  }

  private def rewriteReads(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, version) =>
      pathOf(u.multipartIdentifier).flatMap(open).map { t =>
        val resolved = (ts, version) match {
          case (None, Some(v)) => t.loadAsVersion(v.toLong)
          case (Some(Literal(s, StringType)), None) =>
            val str = s.toString
            val millis = GraftSqlCommands.parseTsLiteral(session, str)
            t.loadAsTimestamp(millis)
          case _ => throw new IllegalArgumentException(
            s"unsupported time-travel spec for graft path table: $tt")
        }
        resolved.toDF(session).queryExecution.analyzed
      }.getOrElse(tt)
    case u: UnresolvedRelation =>
      pathOf(u.multipartIdentifier).flatMap(open)
        .map(_.toDF(session).queryExecution.analyzed)
        .getOrElse(u)
  }
}

/** `INSERT INTO | OVERWRITE graft.`/path`` as one atomic log commit
  * through [[DeltaTable.write]] — never a bare file write into the table
  * directory. Position-based column binding unless the statement was
  * `BY NAME`; a log-less target is created by the first insert (the same
  * create-on-first-write contract as the Scala API).
  */
case class GraftInsertCommand(path: String, queryPlan: LogicalPlan,
    overwrite: Boolean, byName: Boolean, cols: Seq[String] = Seq.empty)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
    val df = ColumnShim.ofRows(spark, queryPlan)
    val t = DeltaTable.forPath(path, conf = ColumnShim.hadoopConf(spark))
    val aligned =
      if (cols.nonEmpty) {
        // explicit column list: positional under the GIVEN names; columns
        // left out fall to the write path's fill machinery (generated /
        // identity / DEFAULT / null backfill) — the delta INSERT shape
        require(df.schema.length == cols.length,
          s"INSERT arity ${df.schema.length} != column list arity ${cols.length}")
        val named = df.toDF(cols.toIndexedSeq: _*)
        if (t.version >= 0) {
          val sch = t.dlog.schema
          val known = sch.fieldNames.toSet
          cols.foreach(c => require(known.contains(c),
            s"INSERT column list names unknown column: $c"))
          // cast to the declared types (Spark's own INSERT coercion —
          // a VALUES literal arrives as decimal/int, not the column type)
          named.select(cols.map(c => org.apache.spark.sql.functions.col(c)
            .cast(sch(c).dataType).as(c)).toIndexedSeq: _*)
        } else named
      }
      else if (byName || t.version < 0) df
      else {
        val names = t.dlog.schema.fieldNames
        require(df.schema.length == names.length,
          s"INSERT arity ${df.schema.length} != table arity ${names.length}")
        df.toDF(names.toIndexedSeq: _*)
      }
    t.write(aligned,
      mode = if (overwrite) graft.log.WriteMode.Overwrite
        else graft.log.WriteMode.Append)
    Seq.empty
  }
}
