package graft.sql

import graft.DeltaTable
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.sql.{Row, SparkSession}

/** SQL surface for graft's table-maintenance verbs — the delta-spark
  * `DeltaSparkSessionExtension` analogue: a [[ParserInterface]] wrapper
  * recognizes the path-addressed commands SQL has no standard syntax for
  * (`DESCRIBE HISTORY`, `OPTIMIZE … ZORDER BY`, `VACUUM … RETAIN n HOURS`,
  * `RESTORE … TO VERSION AS OF`, `GENERATE symlink_format_manifest`,
  * `CONVERT TO GRAFT`) and delegates EVERYTHING else to Spark's own parser,
  * so the session keeps full ANSI SQL.
  *
  * Scale shape: every command here is driver-side log metadata work plus
  * (for OPTIMIZE/CONVERT) a distributed rewrite that goes through the same
  * `DeltaTable` code paths the Scala API uses — the parser adds zero
  * execution machinery of its own. Commands execute eagerly as
  * [[LeafRunnableCommand]]s, the same contract Spark's built-in DDL uses,
  * so `spark.sql("VACUUM …")` returns its result rows like any DataFrame.
  */
class GraftSqlParser(delegate: ParserInterface,
    session: Option[SparkSession] = None) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan = {
    val plan = GraftSqlCommands.parse(sqlText, delegate,
        session.map(NameResolver.forSession).getOrElse(NameResolver.none))
      .getOrElse(delegate.parsePlan(sqlText))
    // post-parse path-table rewrite (see GraftPathResolution for why the
    // analyzer is too late); active sessions only — the parser is also
    // constructible session-less for command-grammar tests
    session.map(s => new GraftPathResolution(s).apply(plan)).getOrElse(plan)
  }
  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
}

/** Name → address resolution for the command grammar (X204). `existing`
  * answers only for REGISTERED names not shadowed by a temp view — an
  * unresolved name makes the whole command fall through to Spark's parser,
  * so catalog-table/temp-view errors keep Spark's own wording. `creatable`
  * additionally derives a fresh warehouse path for an unregistered name
  * (the CLONE-destination case).
  */
trait NameResolver {
  def existing(name: String): Option[String]
  def creatable(name: String): Option[(String, Option[String])]
}

object NameResolver {
  val none: NameResolver = new NameResolver {
    def existing(name: String): Option[String] = None
    def creatable(name: String): Option[(String, Option[String])] = None
  }

  def forSession(spark: SparkSession): NameResolver = new NameResolver {
    def existing(name: String): Option[String] = {
      val ps = GraftSqlCommands.splitIdent(name)
      if (isTempView(spark, ps)) None else GraftCatalog.resolve(spark, ps)
    }
    def creatable(name: String): Option[(String, Option[String])] = {
      val ps = GraftSqlCommands.splitIdent(name)
      if (isTempView(spark, ps)) None
      else GraftCatalog.key(ps).map { k =>
        val reg = GraftCatalog.all(spark).get(k)
          .filter(p => GraftSqlCommands.open(spark, p).version >= 0)
        (reg.getOrElse(GraftCatalog.defaultPath(spark, k)), Some(k))
      }
    }
  }

  private def isTempView(spark: SparkSession, ps: Seq[String]): Boolean =
    try spark.sessionState.catalog.isTempView(ps)
    catch { case _: Exception => false }
}

object GraftSqlCommands {
  // the table address: 'path', "graft.`path`" or "delta.`path`" (the
  // delta-spark spelling, accepted for drop-in familiarity), or a bare
  // 1-3 part identifier resolved through the name registry (X204)
  private val P = """(?:(?:graft|delta)\.`([^`]+)`|'([^']+)'|((?:`[^`]+`|[A-Za-z_]\w*)(?:\.(?:`[^`]+`|[A-Za-z_]\w*)){0,2}))"""

  private val HistoryRe =
    s"""(?is)\\s*(?:DESC|DESCRIBE)\\s+HISTORY\\s+$P\\s*;?\\s*""".r
  private val DetailRe =
    s"""(?is)\\s*(?:DESC|DESCRIBE)\\s+DETAIL\\s+$P\\s*;?\\s*""".r
  private val OptimizeRe =
    s"""(?is)\\s*OPTIMIZE\\s+$P(?:\\s+(FULL))?(?:\\s+WHERE\\s+(.+?))??(?:\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\))?\\s*;?\\s*""".r
  private val VacuumRe =
    s"""(?is)\\s*VACUUM\\s+$P(?:\\s+LITE)?(?:\\s+RETAIN\\s+(\\d+)\\s+HOURS?)?(\\s+DRY\\s+RUN)?\\s*;?\\s*""".r
  // delta 4.0's LITE mode must be detected separately (the main regex
  // accepts it so the address groups stay aligned)
  private val VacuumLiteRe =
    s"""(?is)\\s*VACUUM\\s+$P\\s+LITE\\b.*""".r
  private val RestoreVerRe =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$P\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*""".r
  private val RestoreTsRe =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$P\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*""".r
  private val GenerateRe =
    s"""(?is)\\s*GENERATE\\s+symlink_format_manifest\\s+FOR\\s+TABLE\\s+$P\\s*;?\\s*""".r
  private val ConvertRe =
    s"""(?is)\\s*CONVERT\\s+TO\\s+(?:GRAFT|DELTA)\\s+parquet\\.`([^`]+)`\\s*;?\\s*""".r
  private val ShowPartitionsRe =
    s"""(?is)\\s*SHOW\\s+PARTITIONS\\s+$P\\s*;?\\s*""".r
  private val DeleteRe =
    s"""(?is)\\s*DELETE\\s+FROM\\s+$P(?:\\s+WHERE\\s+(.+?))?\\s*;?\\s*""".r
  // TRUNCATE TABLE = the metadata-only no-predicate DELETE (one log
  // commit, zero file reads on a fully-statted table)
  private val TruncateRe =
    s"""(?is)\\s*TRUNCATE\\s+TABLE\\s+$P\\s*;?\\s*""".r
  // delta-spark's predicate-scoped atomic overwrite; the inner query
  // starts at the first top-level query keyword after the predicate
  private val InsertReplaceWhereRe =
    s"""(?is)\\s*INSERT\\s+INTO\\s+$P\\s+REPLACE\\s+WHERE\\s+(.+?)\\s+((?:SELECT|WITH|VALUES|TABLE|FROM)\\b.+?)\\s*;?\\s*""".r
  // idempotent bulk file loading (the delta COPY INTO verb)
  private val CopyIntoRe =
    s"""(?is)\\s*COPY\\s+INTO\\s+$P\\s+FROM\\s+'([^']+)'\\s+FILEFORMAT\\s*=\\s*(PARQUET|JSON|CSV)(?:\\s+PATTERN\\s*=\\s*'([^']+)')?(?:\\s+FORMAT_OPTIONS\\s*\\((.*?)\\))?(?:\\s+COPY_OPTIONS\\s*\\((.*?)\\))?\\s*;?\\s*""".r
  private val UpdateRe =
    s"""(?is)\\s*UPDATE\\s+$P\\s+SET\\s+(.+?)(?:\\s+WHERE\\s+(.+?))?\\s*;?\\s*""".r
  private val ReorgRe =
    s"""(?is)\\s*REORG\\s+TABLE\\s+$P(?:\\s+WHERE\\s+(.+?))?\\s+APPLY\\s*\\(\\s*PURGE\\s*\\)\\s*;?\\s*""".r
  private val FsckRe =
    s"""(?is)\\s*FSCK\\s+REPAIR\\s+TABLE\\s+$P(\\s+DRY\\s+RUN)?\\s*;?\\s*""".r
  // delta's CLONE verb is not in Spark's grammar, so it parses here; the
  // schema/CTAS CREATE forms parse with Spark's own grammar and intercept
  // as plans in GraftPathResolution
  private val CloneRe =
    s"""(?is)\\s*CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?$P\\s+(SHALLOW|DEEP)\\s+CLONE\\s+$P(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?(?:\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)')?\\s*;?\\s*""".r
  private val CloneIfNotExistsRe =
    s"""(?is)\\s*CREATE\\s+TABLE\\s+IF\\s+NOT\\s+EXISTS\\s+$P\\s+(?:SHALLOW|DEEP)\\s+CLONE\\s+.*""".r
  private val ShowTblPropsRe =
    s"""(?is)\\s*SHOW\\s+TBLPROPERTIES\\s+$P\\s*;?\\s*""".r
  private val ShowCreateRe =
    s"""(?is)\\s*SHOW\\s+CREATE\\s+TABLE\\s+$P\\s*;?\\s*""".r
  private val DescribeTableRe =
    s"""(?is)\\s*(?:DESC|DESCRIBE)\\s+(?:TABLE\\s+)?$P\\s*;?\\s*""".r
  // ALTER TABLE family — each verb routes to the engine API that already
  // owns its semantics (schema evolution, mapping-mode renames, widening)
  private val AlterAddColsRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$P\\s+ADD\\s+COLUMNS?\\s*\\((.+)\\)\\s*;?\\s*""".r
  private val AlterAddColRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$P\\s+ADD\\s+COLUMNS?\\s+([^()]+?)\\s*;?\\s*""".r
  private val AlterSetPropsRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$P\\s+SET\\s+TBLPROPERTIES\\s*\\((.+)\\)\\s*;?\\s*""".r
  private val AlterUnsetPropsRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$P\\s+UNSET\\s+TBLPROPERTIES\\s*\\((.+)\\)\\s*;?\\s*""".r
  private val AlterRenameColRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$P\\s+RENAME\\s+COLUMN\\s+`?([^`\\s]+)`?\\s+TO\\s+`?([^`\\s]+)`?\\s*;?\\s*""".r
  private val AlterDropColRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$P\\s+DROP\\s+COLUMN\\s+`?([^`\\s]+)`?\\s*;?\\s*""".r
  // delta 4.0's protocol downgrade verb; must match before DROP COLUMN
  // never sees it (distinct keyword, but kept adjacent for clarity)
  private val AlterDropFeatureRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$P\\s+DROP\\s+FEATURE\\s+`?([\\w.-]+)`?(\\s+TRUNCATE\\s+HISTORY)?\\s*;?\\s*""".r
  private val AlterColTypeRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$P\\s+(?:ALTER|CHANGE)\\s+COLUMN\\s+`?([^`\\s]+)`?\\s+TYPE\\s+(.+?)\\s*;?\\s*""".r
  private val AlterColSetDefaultRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$P\\s+(?:ALTER|CHANGE)\\s+COLUMN\\s+`?([^`\\s]+)`?\\s+SET\\s+DEFAULT\\s+(.+?)\\s*;?\\s*""".r
  private val AlterColDropDefaultRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$P\\s+(?:ALTER|CHANGE)\\s+COLUMN\\s+`?([^`\\s]+)`?\\s+DROP\\s+DEFAULT\\s*;?\\s*""".r
  private val AlterAddConstraintRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$P\\s+ADD\\s+CONSTRAINT\\s+`?([^`\\s]+)`?\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*""".r
  private val AlterDropConstraintRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$P\\s+DROP\\s+CONSTRAINT\\s+`?([^`\\s]+)`?\\s*;?\\s*""".r
  private val AlterClusterByRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$P\\s+CLUSTER\\s+BY\\s*\\(([^)]+)\\)\\s*;?\\s*""".r
  private val AlterClusterByNoneRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$P\\s+CLUSTER\\s+BY\\s+NONE\\s*;?\\s*""".r
  private val ShowGraftTablesRe =
    """(?is)\s*SHOW\s+GRAFT\s+TABLES\s*;?\s*""".r

  /** The graft grammar; None → not ours, let Spark parse it. An address
    * that is a BARE NAME resolves through `resolver` at parse time; an
    * unregistered (or temp-view-shadowed) name turns the match into None
    * so Spark's own parser — and its error wording — handles the statement.
    */
  def parse(sqlText: String, delegate: ParserInterface,
      resolver: NameResolver = NameResolver.none): Option[LogicalPlan] = {
    // address of an existing table: path spelling, or registered name
    def A(a: String, b: String, n: String): Option[String] =
      if (a != null) Some(a) else if (b != null) Some(b)
      else resolver.existing(n)
    sqlText match {
      case HistoryRe(a, b, n) => A(a, b, n).map(DescribeHistoryCommand(_))
      case DetailRe(a, b, n) => A(a, b, n).map(DescribeDetailCommand(_))
      case OptimizeRe(a, b, n, full, where, zcols) =>
        val cols = Option(zcols).toSeq.flatMap(_.split(",").toSeq)
          .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
        A(a, b, n).map(OptimizeCommand(_, cols, Option(where).map(_.trim),
          full = full != null))
      case VacuumRe(a, b, n, hours, dry) =>
        val lite = VacuumLiteRe.matches(sqlText)
        A(a, b, n).map(VacuumCommand(_, Option(hours).map(_.toLong),
          dry != null, lite = lite))
      case RestoreVerRe(a, b, n, v) =>
        A(a, b, n).map(RestoreCommand(_, Left(v.toLong)))
      case RestoreTsRe(a, b, n, ts) =>
        A(a, b, n).map(RestoreCommand(_, Right(ts)))
      case GenerateRe(a, b, n) => A(a, b, n).map(GenerateManifestCommand(_))
      case ConvertRe(src) => Some(ConvertCommand(src))
      case ShowGraftTablesRe() => Some(ShowGraftTablesCommand())
      case ShowPartitionsRe(a, b, n) => A(a, b, n).map(ShowPartitionsCommand(_))
      case DeleteRe(a, b, n, where) =>
        A(a, b, n).map(DeleteCommand(_, Option(where).map(_.trim)))
      case TruncateRe(a, b, n) =>
        A(a, b, n).map(DeleteCommand(_, None))
      case InsertReplaceWhereRe(a, b, n, cond, query) =>
        // the regex splits the predicate from the inner query at a query
        // keyword, so a predicate with a subquery (k IN (SELECT …)) either
        // gets truncated at the inner SELECT (unbalanced parens in the
        // capture) or swallows the whole subquery (a query keyword inside
        // the capture) — refuse both clearly instead of failing expression
        // parsing or binding the wrong query
        if (cond.count(_ == '(') != cond.count(_ == ')') ||
            """(?i)\b(SELECT|WITH|VALUES|TABLE)\b""".r
              .findFirstIn(cond).isDefined)
          throw new IllegalArgumentException(
            "subqueries are not supported in a REPLACE WHERE predicate; " +
            s"got: ${cond.trim}")
        A(a, b, n).map(InsertReplaceWhereCommand(_, cond.trim, query.trim))
      case CopyIntoRe(a, b, n, src, fmt, pattern, fmtOpts, copyOpts) =>
        A(a, b, n).map(CopyIntoCommand(_, src, fmt.toLowerCase,
          Option(pattern), quotedOptions(Option(fmtOpts)),
          quotedOptions(Option(copyOpts)).get("force")
            .exists(_.equalsIgnoreCase("true"))))
      case UpdateRe(a, b, n, sets, where) =>
        A(a, b, n).map(UpdateCommand(_, sets.trim, Option(where).map(_.trim)))
      case AlterAddColsRe(a, b, n, cols) =>
        A(a, b, n).map(AlterAddColumnsCommand(_,
          splitTopLevel(cols, trackAngles = true)))
      case AlterAddColRe(a, b, n, spec) =>
        A(a, b, n).map(AlterAddColumnsCommand(_, Seq(spec.trim)))
      case AlterSetPropsRe(a, b, n, props) =>
        A(a, b, n).map(AlterPropertiesCommand(_, splitTopLevel(props), set = true))
      case AlterUnsetPropsRe(a, b, n, keys) =>
        A(a, b, n).map(AlterPropertiesCommand(_, splitTopLevel(keys), set = false))
      case AlterAddConstraintRe(a, b, n, name, expr) =>
        A(a, b, n).map(AlterConstraintCommand(_, name, Some(expr.trim)))
      case AlterDropConstraintRe(a, b, n, name) =>
        A(a, b, n).map(AlterConstraintCommand(_, name, None))
      case AlterClusterByNoneRe(a, b, n) =>
        A(a, b, n).map(AlterClusterByCommand(_, Seq.empty))
      case AlterClusterByRe(a, b, n, cols) =>
        A(a, b, n).map(AlterClusterByCommand(_, cols.split(",").toSeq
          .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)))
      case AlterRenameColRe(a, b, n, from, to) =>
        A(a, b, n).map(AlterRenameColumnCommand(_, from, to))
      case AlterDropFeatureRe(a, b, n, feature, truncate) =>
        A(a, b, n).map(AlterDropFeatureCommand(_, feature,
          truncate != null))
      case AlterDropColRe(a, b, n, name) =>
        A(a, b, n).map(AlterDropColumnCommand(_, name))
      // DEFAULT forms must match before the TYPE form never sees them
      case AlterColSetDefaultRe(a, b, n, name, expr) =>
        A(a, b, n).map(AlterColumnDefaultCommand(_, name, Some(expr.trim)))
      case AlterColDropDefaultRe(a, b, n, name) =>
        A(a, b, n).map(AlterColumnDefaultCommand(_, name, None))
      case AlterColTypeRe(a, b, n, name, tpe) =>
        A(a, b, n).map(AlterColumnTypeCommand(_, name, tpe.trim))
      case CloneRe(da, db, dn, kind, sa, sb, sn, ver, ts) =>
        // the DESTINATION may be a fresh name (registers at run time);
        // the source must already exist
        val dst =
          if (da != null) Some((da: String, Option.empty[String]))
          else if (db != null) Some((db, Option.empty[String]))
          else resolver.creatable(dn)
        for { (dPath, dReg) <- dst; sPath <- A(sa, sb, sn) }
          yield GraftCloneCommand(dPath, sPath,
            deep = kind.equalsIgnoreCase("DEEP"),
            version = Option(ver).map(_.toLong), timestamp = Option(ts),
            ifNotExists = CloneIfNotExistsRe.matches(sqlText),
            registerName = dReg)
      case ShowTblPropsRe(a, b, n) => A(a, b, n).map(ShowTblPropertiesCommand(_))
      case ShowCreateRe(a, b, n) => A(a, b, n).map(ShowCreateTableCommand(_))
      case ReorgRe(a, b, n, where) =>
        A(a, b, n).map(ReorgPurgeCommand(_, Option(where).map(_.trim)))
      case FsckRe(a, b, n, dry) =>
        A(a, b, n).map(FsckRepairCommand(_, dry != null))
      case DescribeTableRe(a, b, n) => A(a, b, n).map(DescribeTableCommand(_))
      case _ => None
    }
  }

  /** Split a dotted identifier into parts, honoring backtick quoting. */
  private[sql] def splitIdent(name: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder; var inBt = false
    name.foreach {
      case '`' => inBt = !inBt
      case '.' if !inBt => out += sb.toString; sb.clear()
      case c => sb += c
    }
    out += sb.toString
    out.toSeq
  }

  private[sql] def open(spark: SparkSession, path: String): DeltaTable =
    DeltaTable.forPath(path, conf = ColumnShim.hadoopConf(spark))

  /** `'key' = 'value'[, …]` option lists (COPY INTO's FORMAT_OPTIONS /
    * COPY_OPTIONS). Malformed entries refuse loudly.
    */
  private[sql] def quotedOptions(s: Option[String]): Map[String, String] = {
    val Pair = """\s*'([^']+)'\s*=\s*'([^']*)'\s*""".r
    s.map(splitTopLevel(_).map {
      case Pair(k, v) => k -> v
      case other => throw new IllegalArgumentException(
        s"malformed option entry (expected 'key' = 'value'): $other")
    }.toMap).getOrElse(Map.empty)
  }

  /** Parse a `TIMESTAMP AS OF` literal in the SESSION timezone (what
    * delta-spark does), not the JVM default — `Timestamp.valueOf` would
    * shift a pinned clone/restore by the host tz offset. Accepts Spark's
    * full timestamp literal grammar plus ISO instants with `Z`.
    */
  private[graft] def parseTsLiteral(spark: SparkSession, ts: String): Long = {
    val zone = org.apache.spark.sql.catalyst.util.DateTimeUtils
      .getZoneId(spark.sessionState.conf.sessionLocalTimeZone)
    org.apache.spark.sql.catalyst.util.DateTimeUtils
      .stringToTimestamp(
        org.apache.spark.unsafe.types.UTF8String.fromString(ts), zone)
      .map(micros => Math.floorDiv(micros, 1000L))
      .getOrElse(java.time.Instant.parse(ts).toEpochMilli)
  }

  /** Split at commas outside any paren/bracket nesting and outside
    * single-quoted strings. `trackAngles` additionally nests on `<`/`>`
    * so parameterized type spellings (MAP<STRING, INT>, STRUCT<...>)
    * survive — opt-in because general expressions (UPDATE SET) use bare
    * `<` as a comparison operator.
    */
  private[graft] def splitTopLevel(s: String,
      trackAngles: Boolean = false): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inStr = false; var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inStr = !inStr
        case '(' | '[' if !inStr => depth += 1
        case ')' | ']' if !inStr => depth -= 1
        case '<' if trackAngles && !inStr => depth += 1
        case '>' if trackAngles && !inStr && depth > 0 => depth -= 1
        case ',' if !inStr && depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }
}

/** `DESCRIBE HISTORY '<path>'` — commit log, newest first (metadata only). */
case class DescribeHistoryCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("timestamp", TimestampType)(),
    AttributeReference("operation", StringType)(),
    AttributeReference("clientVersion", StringType)(),
    AttributeReference("readVersion", LongType)())
  override def run(spark: SparkSession): Seq[Row] =
    GraftSqlCommands.open(spark, path).history.map { case (v, c) =>
      Row(v, new java.sql.Timestamp(c.effectiveTimestamp), c.operation,
        c.clientVersion, c.readVersion.map(Long.box).orNull)
    }
}

/** `DESCRIBE DETAIL '<path>'` — one metadata row, no data scan. */
case class DescribeDetailCommand(path: String) extends LeafRunnableCommand {
  // schema is data-independent; build it once against the table-less shape
  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType)(),
    AttributeReference("id", StringType)(),
    AttributeReference("name", StringType)(),
    AttributeReference("description", StringType)(),
    AttributeReference("location", StringType)(),
    AttributeReference("createdAt", TimestampType)(),
    AttributeReference("lastModified", TimestampType)(),
    AttributeReference("partitionColumns", org.apache.spark.sql.types.ArrayType(StringType))(),
    AttributeReference("numFiles", LongType)(),
    AttributeReference("sizeInBytes", LongType)(),
    AttributeReference("properties", org.apache.spark.sql.types.MapType(StringType, StringType))(),
    AttributeReference("minReaderVersion", org.apache.spark.sql.types.IntegerType)(),
    AttributeReference("minWriterVersion", org.apache.spark.sql.types.IntegerType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val df = GraftSqlCommands.open(spark, path).detail(spark)
    // realign by name: detail() owns the column set, the command owns order
    val names = output.map(_.name)
    df.collect().toSeq.map { r =>
      Row.fromSeq(names.map(n => r.get(r.fieldIndex(n))))
    }
  }
}

/** `OPTIMIZE '<path>' [FULL] [WHERE …] [ZORDER BY (…)]` — distributed
  * rewrite via [[DeltaTable.compact]]; the result row reports the
  * file-count change. Delta's liquid-clustering contract: a plain
  * OPTIMIZE on a CLUSTERED table is INCREMENTAL (already-clustered
  * files tag-skip, X195); `FULL` forces the total re-cluster. On
  * unclustered tables the flag is inert (no spec tag exists).
  */
case class OptimizeCommand(path: String, zOrderBy: Seq[String],
    where: Option[String], full: Boolean = false) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType)(),
    AttributeReference("numFilesBefore", LongType)(),
    AttributeReference("numFilesAfter", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlCommands.open(spark, path)
    val before = t.dlog.addActions.size.toLong
    val pred = where.map(w => ColumnShim.column(
      spark.sessionState.sqlParser.parseExpression(w)))
    // incremental ONLY for the liquid path (declared clustering columns,
    // no explicit ZORDER BY) — an explicit ZORDER BY stays a full
    // rewrite, delta's legacy-Z-order parity
    val after = t.compact(spark, sortBy = zOrderBy,
      zOrder = zOrderBy.length > 1, where = pred,
      incremental = !full && zOrderBy.isEmpty)
      .dlog.addActions.size.toLong
    Seq(Row(path, before, after))
  }
}

/** `VACUUM '<path>' [RETAIN n HOURS] [DRY RUN]` — one row per affected
  * file (delta-spark's shape); deletion fan-out happens in
  * [[DeltaTable.vacuum]], not here.
  */
case class VacuumCommand(path: String, retainHours: Option[Long],
    dryRun: Boolean, lite: Boolean = false) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("path", StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val retention = retainHours.map(_ * 3600L * 1000L).getOrElse(Long.MinValue)
    val t = GraftSqlCommands.open(spark, path)
    // LITE (delta 4.0): reclaim exactly the log's expired tombstones —
    // no table-directory listing at all (X112's engine path)
    val removed = if (lite) t.vacuumLite(retention, dryRun)
      else t.vacuum(retention, dryRun)
    removed.map(Row(_))
  }
}

/** `RESTORE [TABLE] '<path>' TO VERSION|TIMESTAMP AS OF …`. */
case class RestoreCommand(path: String,
    target: Either[Long, String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restoredVersion", LongType)(),
    AttributeReference("numFiles", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlCommands.open(spark, path)
    val (restored, targetVersion) = target match {
      case Left(v) => (t.restore(v), v)
      case Right(ts) =>
        val millis = GraftSqlCommands.parseTsLiteral(spark, ts)
        (t.restoreToTimestamp(millis), t.versionAt(millis))
    }
    Seq(Row(targetVersion, restored.dlog.addActions.size.toLong))
  }
}

/** `GENERATE symlink_format_manifest FOR TABLE '<path>'`. */
case class GenerateManifestCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("manifest", StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    GraftSqlCommands.open(spark, path).generateSymlinkManifest()
    Seq(Row(s"$path/_symlink_format_manifest/manifest"))
  }
}

/** `SHOW PARTITIONS '<path>'` — Hive's `k1=v1/k2=v2` string shape (one
  * static column, so the schema needs no parse-time table open); values
  * come from the LOG's partitionValues, no file listing, no data scan.
  */
case class ShowPartitionsCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("partition", StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlCommands.open(spark, path)
    val cols = t.dlog.partitionColumns
    require(cols.nonEmpty, s"$path is not a partitioned table")
    t.dlog.addActions.values
      .map(a => cols.map(c => s"$c=${a.partitionValues.get(c).flatten
        .getOrElse("__HIVE_DEFAULT_PARTITION__")}").mkString("/"))
      .toSeq.distinct.sorted.map(Row(_))
  }
}

/** `DELETE FROM '<path>' [WHERE …]` — the copy-on-write delete commit
  * ([[DeltaTable.delete]]: stats-pruned two-phase rewrite), with the
  * predicate parsed by the session's own expression parser. Catalog-table
  * DELETEs never reach here: the grammar requires a path-shaped address.
  */
case class DeleteCommand(path: String,
    where: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq.empty
  override def run(spark: SparkSession): Seq[Row] = {
    val pred = where.map(w => ColumnShim.column(
      spark.sessionState.sqlParser.parseExpression(w)))
    GraftSqlCommands.open(spark, path).delete(spark, pred)
    Seq.empty
  }
}

/** `INSERT INTO '<path>' REPLACE WHERE <cond> <query>` — delta-spark's
  * predicate-scoped atomic overwrite: ONE commit replaces exactly the
  * rows matching the predicate with the query's rows
  * ([[graft.DeltaTable.replaceWhere]] — every inserted row must satisfy
  * the predicate, the scoping contract that keeps concurrent disjoint
  * backfills logically independent). The inner query parses in the
  * session, so it may itself reference graft tables.
  */
case class InsertReplaceWhereCommand(path: String, cond: String,
    query: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq.empty
  override def run(spark: SparkSession): Seq[Row] = {
    val pred = ColumnShim.column(
      spark.sessionState.sqlParser.parseExpression(cond))
    GraftSqlCommands.open(spark, path).replaceWhere(spark, pred, spark.sql(query))
    Seq.empty
  }
}

/** `COPY INTO '<path>' FROM '<dir>' FILEFORMAT = PARQUET|JSON|CSV
  * [PATTERN = '<glob>'] [FORMAT_OPTIONS('k'='v', …)]
  * [COPY_OPTIONS('force'='true')]` — delta's idempotent bulk loader: a
  * source file already loaded into the table is SKIPPED on re-run, so a
  * scheduled `COPY INTO` over a landing directory is exactly-once per
  * file without any external bookkeeping. Loaded-file memory rides the
  * commit's custom metadata (`copyIntoFiles` in commitInfo, M8's
  * round-trip) and is reconstructed by one history replay — it therefore
  * reaches only as far back as retained history, like delta's own.
  * `force` reloads regardless; the returned row reports loaded/skipped
  * file counts and inserted rows.
  */
case class CopyIntoCommand(path: String, srcDir: String, format: String,
    pattern: Option[String], formatOptions: Map[String, String],
    force: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("num_loaded_files", LongType, nullable = false)(),
    AttributeReference("num_skipped_files", LongType, nullable = false)(),
    AttributeReference("num_inserted_rows", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    import graft.log.Json
    val hconf = ColumnShim.hadoopConf(spark)
    val src = new org.apache.hadoop.fs.Path(srcDir)
    val fs = src.getFileSystem(hconf)
    val matcher = pattern.map(g =>
      java.nio.file.FileSystems.getDefault.getPathMatcher("glob:" + g))
    val files = fs.listStatus(src).toSeq.filter(_.isFile)
      .map(_.getPath)
      .filter { fp =>
        val nm = fp.getName
        !nm.startsWith("_") && !nm.startsWith(".") &&
          matcher.forall(_.matches(java.nio.file.Paths.get(nm)))
      }
      .map(_.toUri.toString).sorted
    val t0 = GraftSqlCommands.open(spark, path)
    val already: Set[String] =
      if (force || t0.version < 0) Set.empty
      else t0.history.flatMap(_._2.extra.get("copyIntoFiles")).flatMap { n =>
        if (!n.isArray) Seq.empty
        else (0 until n.size).map(i => n.get(i).asText)
      }.toSet
    val todo = files.filterNot(already)
    if (todo.isEmpty)
      return Seq(Row(0L, files.size.toLong, 0L))
    val df = spark.read.options(formatOptions).format(format).load(todo: _*)
    val beforePaths = if (t0.version < 0) Set.empty[String]
      else t0.dlog.addActions.keySet
    val t1 = t0.write(df, customMetadata = Map(
      "copyIntoFiles" -> Json.arr(todo.map(Json.text)),
      "copyIntoSource" -> Json.text(srcDir)))
    val inserted = t1.dlog.addActions.collect {
      case (p, a) if !beforePaths.contains(p) => a.numRecords.getOrElse(0L)
    }.sum
    Seq(Row(todo.size.toLong, (files.size - todo.size).toLong, inserted))
  }
}

/** `UPDATE '<path>' SET c = expr[, …] [WHERE …]` — [[DeltaTable.update]]'s
  * copy-on-write rewrite. Assignments split at TOP-LEVEL commas only
  * (a `SET c = greatest(a, b)` clause carries commas of its own).
  */
case class UpdateCommand(path: String, sets: String,
    where: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq.empty
  override def run(spark: SparkSession): Seq[Row] = {
    val parser = spark.sessionState.sqlParser
    val assignments = GraftSqlCommands.splitTopLevel(sets).map { a =>
      val eq = a.indexOf('=')
      require(eq > 0, s"malformed SET assignment: $a")
      val name = a.substring(0, eq).trim.stripPrefix("`").stripSuffix("`")
      name -> ColumnShim.column(parser.parseExpression(a.substring(eq + 1).trim))
    }.toMap
    val pred = where.map(w => ColumnShim.column(parser.parseExpression(w)))
    GraftSqlCommands.open(spark, path).update(spark, pred, assignments)
    Seq.empty
  }
}

/** `ALTER TABLE '<path>' ADD COLUMN[S] …` — each `name type [COMMENT 'c']
  * [AFTER col]` entry routes to [[DeltaTable.addColumn]] (nullable,
  * metadata-only commit; existing files null-fill on read). Types parse
  * with the session's own DataType parser, so every Spark SQL type
  * spelling works.
  */
case class AlterAddColumnsCommand(path: String,
    colSpecs: Seq[String]) extends LeafRunnableCommand {
  private val SpecRe =
    """(?is)\s*`?([^`\s]+)`?\s+(.+?)(?:\s+COMMENT\s+'([^']*)')?(?:\s+AFTER\s+`?([^`\s]+)`?)?\s*""".r
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    var t = GraftSqlCommands.open(spark, path)
    colSpecs.foreach {
      case SpecRe(name, tpe, comment, after) =>
        t = t.addColumn(name, spark.sessionState.sqlParser.parseDataType(tpe),
          after = Option(after), comment = Option(comment))
      case other => throw new IllegalArgumentException(
        s"malformed ADD COLUMN entry: $other")
    }
    Seq(Row(t.version))
  }
}

/** `ALTER TABLE '<path>' SET|UNSET TBLPROPERTIES (…)` —
  * [[DeltaTable.setTableProperties]] / [[DeltaTable.unsetTableProperties]]
  * (one metadata commit; retention/appendOnly/DV gates live behind these
  * keys, so the SQL spelling reaches the same protocol checks).
  */
case class AlterPropertiesCommand(path: String, entries: Seq[String],
    set: Boolean) extends LeafRunnableCommand {
  private val PairRe = """(?is)\s*'([^']+)'\s*=\s*'([^']*)'\s*""".r
  private val KeyRe = """(?is)\s*'([^']+)'\s*""".r
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlCommands.open(spark, path)
    val out =
      if (set) t.setTableProperties(entries.map {
        case PairRe(k, v) => k -> v
        case other => throw new IllegalArgumentException(
          s"malformed TBLPROPERTIES pair: $other (want 'k' = 'v')")
      }.toMap)
      else t.unsetTableProperties(entries.map {
        case KeyRe(k) => k
        case other => throw new IllegalArgumentException(
          s"malformed TBLPROPERTIES key: $other (want 'k')")
      })
    Seq(Row(out.version))
  }
}

/** `ALTER TABLE '<path>' RENAME COLUMN a TO b` —
  * [[DeltaTable.renameColumn]] (column-mapping name mode: physical files
  * never rewrite; the rename is a mapping-metadata commit).
  */
case class AlterRenameColumnCommand(path: String, from: String,
    to: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(GraftSqlCommands.open(spark, path).renameColumn(from, to).version))
}

/** `ALTER TABLE '<path>' DROP COLUMN a` — [[DeltaTable.dropColumn]]
  * (mapping mode; metadata-only, data files untouched).
  */
/** `ALTER TABLE '<path>' DROP FEATURE f [TRUNCATE HISTORY]` —
  * [[DeltaTable.dropFeature]] (delta 4.0's protocol downgrade verb:
  * retire a declared feature once no live state needs it; reader-scoped
  * features protect or truncate the feature-bearing history).
  */
case class AlterDropFeatureCommand(path: String, feature: String,
    truncateHistory: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(GraftSqlCommands.open(spark, path)
      .dropFeature(feature, truncateHistory).version))
}

case class AlterDropColumnCommand(path: String,
    name: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(GraftSqlCommands.open(spark, path).dropColumn(name).version))
}

/** `ALTER TABLE '<path>' ALTER COLUMN a SET DEFAULT expr | DROP DEFAULT`
  * — [[DeltaTable.setColumnDefault]] / [[DeltaTable.dropColumnDefault]]
  * (delta's `allowColumnDefaults` writer feature; the default fills
  * omitted columns at write time).
  */
case class AlterColumnDefaultCommand(path: String, name: String,
    defaultExpr: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlCommands.open(spark, path)
    val out = defaultExpr match {
      case Some(e) => t.setColumnDefault(name, e)
      case None    => t.dropColumnDefault(name)
    }
    Seq(Row(out.version))
  }
}

/** `ALTER TABLE '<path>' ALTER COLUMN a TYPE t` —
  * [[DeltaTable.alterColumnType]] (lossless widenings only; anything else
  * refuses, same as the Scala surface).
  */
case class AlterColumnTypeCommand(path: String, name: String,
    tpe: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(GraftSqlCommands.open(spark, path)
      .alterColumnType(name, spark.sessionState.sqlParser.parseDataType(tpe))
      .version))
}

/** `ALTER TABLE '<path>' ADD CONSTRAINT name CHECK (expr)` /
  * `… DROP CONSTRAINT name` — [[DeltaTable.addConstraint]] (existing rows
  * validated in one scan before the metadata commit; later writes gate on
  * it) / [[DeltaTable.dropConstraint]].
  */
case class AlterConstraintCommand(path: String, name: String,
    checkExpr: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlCommands.open(spark, path)
    Seq(Row(checkExpr match {
      case Some(e) => t.addConstraint(spark, name, e).version
      case None => t.dropConstraint(name).version
    }))
  }
}

/** `ALTER TABLE '<path>' CLUSTER BY (c1, c2)` / `… CLUSTER BY NONE` —
  * [[DeltaTable.clusterBy]]: metadata-only re-declaration; layout
  * happens incrementally on the next OPTIMIZE (liquid-style).
  */
case class AlterClusterByCommand(path: String,
    cols: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(GraftSqlCommands.open(spark, path).clusterBy(cols).version))
}

/** `REORG TABLE '<path>' [WHERE pp] APPLY (PURGE)` —
  * [[DeltaTable.purge]]: rewrite DV'd files without their dead rows so
  * the vectors (and soft-deleted bytes) can be vacuumed.
  */
case class ReorgPurgeCommand(path: String,
    where: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType)(),
    AttributeReference("version", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val pred = where.map(w => ColumnShim.column(
      spark.sessionState.sqlParser.parseExpression(w)))
    Seq(Row(path, GraftSqlCommands.open(spark, path).purge(spark, pred).version))
  }
}

/** `FSCK REPAIR TABLE '<path>' [DRY RUN]` — [[DeltaTable.fsckRepair]]:
  * one row per missing data file (delta-spark's shape); without DRY RUN
  * the ghosts are committed away as removes.
  */
case class FsckRepairCommand(path: String,
    dryRun: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("file", StringType)())
  override def run(spark: SparkSession): Seq[Row] =
    GraftSqlCommands.open(spark, path).fsckRepair(spark, dryRun).map(Row(_))
}

/** `SHOW GRAFT TABLES` — the name registry (X204): one (name, path) row
  * per registered table, names sorted. Registry-file read only; no table
  * logs open.
  */
case class ShowGraftTablesCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("name", StringType)(),
    AttributeReference("path", StringType)())
  override def run(spark: SparkSession): Seq[Row] =
    GraftCatalog.all(spark).toSeq.sortBy(_._1).map { case (n, p) => Row(n, p) }
}

/** `CONVERT TO GRAFT parquet.`<path>`` — in-place log mint over existing
  * parquet (zero data movement, [[DeltaTable.convert]]).
  */
case class ConvertCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType)(),
    AttributeReference("version", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = DeltaTable.convert(spark, path)
    Seq(Row(path, t.version))
  }
}

/** Runtime enablement for an already-running session: injects the graft
  * parser (and functions) into the session's extension registry once, then
  * returns a sibling session — same SparkContext, shared state and
  * catalog-less temp scope — whose lazily-built `SessionState` picks the
  * parser up. (A `SessionState` is immutable once built, so the original
  * session object keeps its stock parser; cluster-wide installs use
  * `spark.sql.extensions=graft.functions.GraftExtensions` instead and need
  * none of this.)
  */
object GraftSql {
  private val injected =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSessionExtensions, java.lang.Boolean]())

  def enable(spark: SparkSession): SparkSession = {
    val ext = ColumnShim.extensions(spark)
    injected.synchronized {
      if (injected.add(ext)) new graft.functions.GraftExtensions().apply(ext)
    }
    spark.newSession()
  }
}
