package graft.sql

import graft.DeltaTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel,
  UnresolvedIdentifier, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{ColumnDefinition,
  CreateTable, CreateTableAsSelect, DropTable, InsertIntoStatement,
  LogicalPlan, MergeIntoTable, ReplaceTable, ReplaceTableAsSelect,
  SubqueryAlias, TableSpec, TableSpecBase, UnresolvedTableSpec}
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

  /** Table address from a multipart identifier: a path spelling, or a
    * CATALOG-REGISTERED name (X204). Temp views shadow registered names —
    * Spark's own precedence — and an unregistered name stays unresolved so
    * the session catalog's error messages are untouched.
    */
  private def addrOf(parts: Seq[String]): Option[String] =
    pathOf(parts).orElse {
      if (isTempView(parts)) None else GraftCatalog.resolve(session, parts)
    }

  private def isTempView(parts: Seq[String]): Boolean =
    try session.sessionState.catalog.isTempView(parts)
    catch { case _: Exception => false }

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
        case u: UnresolvedRelation if addrOf(u.multipartIdentifier).isDefined =>
          val path = addrOf(u.multipartIdentifier).get
          require(i.partitionSpec.isEmpty && !i.ifPartitionNotExists,
            "INSERT into a graft path table supports no PARTITION spec " +
              "(partitioning is table metadata; use the table's own layout)")
          GraftInsertCommand(path, rewriteReads(i.query), i.overwrite,
            i.byName, i.userSpecifiedCols)
        case _ => i
      }
      // CREATE/REPLACE TABLE a graft path (schema-only and AS SELECT) or
      // a catalog NAME with `USING graft` (X204 — the name registers in
      // GraftCatalog at run time): same corruption guard — a CTAS target
      // must never become a raw file write. Query read-rewritten at capture.
      case ct: CreateTable if createAddr(ct.name, ct.tableSpec).isDefined =>
        val (p, reg) = createAddr(ct.name, ct.tableSpec).get
        createCmd(p, reg, Some(ct.columns), ct.partitioning,
          ct.tableSpec, None, orReplace = false, ifNotExists = ct.ignoreIfExists)
      case ct: CreateTableAsSelect if createAddr(ct.name, ct.tableSpec).isDefined =>
        val (p, reg) = createAddr(ct.name, ct.tableSpec).get
        createCmd(p, reg, None, ct.partitioning, ct.tableSpec,
          Some(rewriteReads(ct.query)), orReplace = false,
          ifNotExists = ct.ignoreIfExists)
      case rt: ReplaceTable if createAddr(rt.name, rt.tableSpec).isDefined =>
        val (p, reg) = createAddr(rt.name, rt.tableSpec).get
        createCmd(p, reg, Some(rt.columns), rt.partitioning,
          rt.tableSpec, None, orReplace = true, ifNotExists = false)
      case rt: ReplaceTableAsSelect if createAddr(rt.name, rt.tableSpec).isDefined =>
        val (p, reg) = createAddr(rt.name, rt.tableSpec).get
        createCmd(p, reg, None, rt.partitioning, rt.tableSpec,
          Some(rewriteReads(rt.query)), orReplace = true, ifNotExists = false)
      // DROP TABLE of a REGISTERED name: unregister, and for a managed
      // table (data under the warehouse default path) delete the data too
      // — delta's managed/external split. Unregistered names stay Spark's.
      case dt @ DropTable(child, _, purge) =>
        val parts = child match {
          case u: UnresolvedIdentifier => Some(u.nameParts)
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
            Some(u.multipartIdentifier)
          case _ => None
        }
        parts.filterNot(isTempView).flatMap(GraftCatalog.key)
          .filter(GraftCatalog.all(session).contains) match {
          case Some(k) => GraftDropTableCommand(k, purge)
          case None => dt
        }
      // MERGE INTO a graft path: same top-down capture as INSERT — the
      // target must never fall through to the read rewrite (a merge
      // against a raw file relation would plan a log-bypassing write).
      // The command is a LEAF, so only its source is read-rewritten here.
      case m: MergeIntoTable =>
        val (tgtAlias, tgtPath) = m.targetTable match {
          case SubqueryAlias(id, u: UnresolvedRelation) =>
            (Some(id.name), addrOf(u.multipartIdentifier))
          case u: UnresolvedRelation => (None, addrOf(u.multipartIdentifier))
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

  /** CREATE-target address: a path spelling (any provider the command
    * validates), or — with an explicit `USING graft|delta` — a catalog
    * name, whose path is the LOCATION clause (external) or the warehouse
    * default (managed). The second tuple slot is the registry key to
    * write at run time; a name already registered to a LIVE table reuses
    * its registered path (so IF NOT EXISTS / REPLACE see the real state).
    */
  private def createAddr(name: LogicalPlan,
      spec: TableSpecBase): Option[(String, Option[String])] = name match {
    case u: UnresolvedIdentifier =>
      pathOf(u.nameParts).map(p => (p, Option.empty[String])).orElse {
        val (provider, location) = spec match {
          case s: TableSpec => (s.provider, s.location)
          case s: UnresolvedTableSpec => (s.provider, s.location)
          case _ => (None, None)
        }
        if (!provider.exists(p => p.equalsIgnoreCase("graft") ||
            p.equalsIgnoreCase("delta")) || isTempView(u.nameParts)) None
        else GraftCatalog.key(u.nameParts).map { k =>
          val registered = GraftCatalog.all(session).get(k)
            .filter(p => open(p).isDefined) // stale registry ≠ existing
          (registered.orElse(location)
            .getOrElse(GraftCatalog.defaultPath(session, k)), Some(k))
        }
      }
    case _ => None
  }

  /** Build the create command from the parsed v2 pieces, validating that
    * nothing unsupported (a LOCATION differing from the path address,
    * a non-graft provider, non-identity partition transforms) slips
    * through silently.
    */
  private def createCmd(path: String, registerName: Option[String],
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
      orReplace, ifNotExists, generated, identity, clusterCols, registerName)
  }

  private def rewriteReads(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, version) =>
      addrOf(u.multipartIdentifier).flatMap(open).map { t =>
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
      addrOf(u.multipartIdentifier).flatMap(open)
        .map(_.toDF(session).queryExecution.analyzed)
        .getOrElse(u)
    // delta-spark's CDF table-valued function:
    //   table_changes('<path|graft.`path`|registered name>', start [, end])
    // start/end are versions (ints) or timestamp literals; start is
    // INCLUSIVE (maps to the engine's exclusive-from changesBetween).
    // Only engages when the address resolves to a graft log — any other
    // table_changes stays unresolved for Spark's own error wording.
    case tvf: org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
        if tvf.name.map(_.toLowerCase) == Seq("table_changes") && !tvf.isStreaming =>
      tableChangesPlan(tvf).getOrElse(tvf)
  }

  private def tableChangesPlan(
      tvf: org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction)
      : Option[LogicalPlan] = {
    def litStr(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      e match { case Literal(s, StringType) if s != null => Some(s.toString); case _ => None }
    def litLong(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      e match {
        case Literal(v: Int, _) => Some(v.toLong)
        case Literal(v: Long, _) => Some(v)
        case _ => None
      }
    val args = tvf.functionArgs
    if (args.isEmpty || args.size > 3) return None
    val PathSpelling = """(?is)\s*(?:graft|delta)\.`([^`]+)`\s*""".r
    val addr = litStr(args.head).flatMap {
      case PathSpelling(p) => Some(p)
      case p if p.startsWith("/") || p.contains("://") => Some(p)
      case n => GraftCatalog.resolve(session, n.split('.').toSeq)
    }.getOrElse(return None)
    val t = open(addr).getOrElse(return None)
    // a timestamp start resolves to the FIRST version committed at or
    // after it; a timestamp end to the LAST at or before (delta's rule)
    def versionOf(e: org.apache.spark.sql.catalyst.expressions.Expression,
        isStart: Boolean): Option[Long] =
      litLong(e).orElse(litStr(e).map { s =>
        val ms = GraftSqlCommands.parseTsLiteral(session, s)
        val hist = t.history
        // a bound outside the table's commit-time range fails LOUDLY
        // (delta-spark's table_changes out-of-range error) — a silently
        // empty feed turns a misconfigured audit query into "no changes"
        def outOfRange(side: String): Nothing =
          throw new IllegalArgumentException(
            s"table_changes $side timestamp '$s' is outside the " +
            s"table's commit range [${hist.map(_._2.effectiveTimestamp).min}, " +
            s"${hist.map(_._2.effectiveTimestamp).max}] for $addr")
        if (isStart)
          hist.filter(_._2.effectiveTimestamp >= ms).map(_._1)
            .minOption.getOrElse(outOfRange("start"))
        else
          hist.filter(_._2.effectiveTimestamp <= ms).map(_._1)
            .maxOption.getOrElse(outOfRange("end"))
      })
    val start = args.lift(1).flatMap(versionOf(_, isStart = true)).getOrElse(0L)
    val end = args.lift(2).flatMap(versionOf(_, isStart = false)).getOrElse(t.version)
    Some(t.changesBetween(session, start - 1, end, includeTimestamp = true)
      .queryExecution.analyzed)
  }
}

/** `DROP TABLE <registered name>` — removes the registry entry; a MANAGED
  * table (its data lives at the warehouse default path for the name, i.e.
  * no LOCATION was given at create) also deletes the table directory,
  * delta's managed/external split. PURGE forces the data delete for
  * external tables too.
  */
case class GraftDropTableCommand(name: String, purge: Boolean)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
    GraftCatalog.resolveName(spark, name).foreach { p =>
      val managed = p == GraftCatalog.defaultPath(spark, name)
      GraftCatalog.unregister(spark, name)
      if (managed || purge) {
        val loc = graft.storage.Location(p, ColumnShim.hadoopConf(spark))
        if (loc.exists) loc.delete(recursive = true)
      }
    }
    Seq.empty
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
