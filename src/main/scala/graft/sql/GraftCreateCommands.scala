package graft.sql

import graft.DeltaTable
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.{Row, SparkSession}

/** SQL `CREATE [OR REPLACE] TABLE [IF NOT EXISTS] graft.`/path``
  * — schema-only create (one metadata commit, zero data files) or CTAS
  * (one atomic create-with-data commit through [[DeltaTable.write]]),
  * with `PARTITIONED BY` mapping to the table's hive layout and
  * `TBLPROPERTIES` landing as a follow-up SetProperties commit.
  *
  * Captured from Spark's own parsed `CreateTable` / `CreateTableAsSelect`
  * / `ReplaceTable(AsSelect)` plans in [[GraftPathResolution]] — the same
  * top-down interception as INSERT/MERGE, so the target never resolves to
  * a raw file relation. The CTAS query subtree is read-rewritten at
  * capture, so graft path sources inside it resolve normally.
  *
  * REPLACE keeps the existing table's partitioning (the engine's
  * overwrite preserves layout); a REPLACE that asks for different
  * partition columns refuses loudly rather than silently relayouting.
  */
case class GraftCreateTableCommand(path: String, schemaJson: Option[String],
    partitionBy: Seq[String], properties: Map[String, String],
    queryPlan: Option[LogicalPlan], orReplace: Boolean,
    ifNotExists: Boolean,
    generated: Seq[(String, String)] = Seq.empty,
    identity: Seq[(String, Long, Long, Boolean)] = Seq.empty,
    clusterBy: Seq[String] = Seq.empty,
    registerName: Option[String] = None) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType)(),
    AttributeReference("version", LongType)())

  override def run(spark: SparkSession): Seq[Row] = {
    var t = DeltaTable.forPath(path, conf = ColumnShim.hadoopConf(spark))
    val exists = t.version >= 0
    // name registration is idempotent and happens even on the IF NOT
    // EXISTS early return: `CREATE TABLE IF NOT EXISTS n USING graft
    // LOCATION p` over a live table ADOPTS it under the name (delta's
    // external-table-over-existing-data contract)
    def register(): Unit =
      registerName.foreach(n => GraftCatalog.register(spark, n, path))
    if (exists && ifNotExists) { register(); return Seq(Row(path, t.version)) }
    if (exists && !orReplace)
      throw new java.nio.file.FileAlreadyExistsException(
        s"table already exists at $path (use OR REPLACE or IF NOT EXISTS)")
    if (exists && partitionBy.nonEmpty &&
        t.dlog.partitionColumns != partitionBy)
      throw new IllegalArgumentException(
        s"REPLACE cannot change partitioning ${t.dlog.partitionColumns} " +
          s"-> $partitionBy; write a new table instead")
    if (exists && (generated.nonEmpty || identity.nonEmpty))
      throw new IllegalArgumentException(
        "REPLACE cannot (re)declare GENERATED/IDENTITY columns on an " +
          "existing table — their fill state belongs to the create")
    if (!exists) {
      generated.foreach { case (n, e) => t = t.withGeneratedColumn(n, e) }
      identity.foreach { case (n, start, step, allow) =>
        t = t.withIdentityColumn(n, start, step, allow) }
    }
    val part = if (partitionBy.nonEmpty) Some(partitionBy) else None
    val df = queryPlan match {
      case Some(q) => ColumnShim.ofRows(spark, q)
      case None =>
        val schema = DataTypes.fromJson(schemaJson.getOrElse(
          throw new IllegalArgumentException(
            "CREATE TABLE needs a column list or an AS SELECT query")))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], schema)
    }
    t = t.write(df,
      mode = if (exists) graft.log.WriteMode.Overwrite
        else graft.log.WriteMode.Append,
      partitionBy = part)
    if (clusterBy.nonEmpty) t = t.clusterBy(clusterBy)
    if (properties.nonEmpty) t = t.setTableProperties(properties)
    register()
    Seq(Row(path, t.version))
  }

  private object DataTypes {
    def fromJson(json: String): StructType =
      org.apache.spark.sql.types.DataType.fromJson(json).asInstanceOf[StructType]
  }
}

/** `CREATE TABLE graft.`/dst`` SHALLOW|DEEP CLONE graft.`/src``
  * [VERSION AS OF n | TIMESTAMP AS OF 'ts']` — delta-spark's CLONE verb.
  * SHALLOW copies the log with file refs rewritten absolute (zero data
  * movement; a version pin clones the truncated history ≤ n, exactly what
  * a `loadAsVersion` handle's log holds); DEEP copies the pinned
  * snapshot's live bytes executor-distributed and mints a fresh
  * version-0 table ([[DeltaTable.deepCloneTo]]).
  */
case class GraftCloneCommand(dstPath: String, srcPath: String, deep: Boolean,
    version: Option[Long], timestamp: Option[String],
    ifNotExists: Boolean,
    registerName: Option[String] = None) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType)(),
    AttributeReference("version", LongType)())

  override def run(spark: SparkSession): Seq[Row] = {
    def register(): Unit =
      registerName.foreach(n => GraftCatalog.register(spark, n, dstPath))
    val existing = DeltaTable.forPath(dstPath, conf = ColumnShim.hadoopConf(spark))
    if (existing.version >= 0) {
      if (ifNotExists) { register(); return Seq(Row(dstPath, existing.version)) }
      throw new java.nio.file.FileAlreadyExistsException(
        s"clone target already exists at $dstPath")
    }
    val src = DeltaTable.forPath(srcPath, conf = ColumnShim.hadoopConf(spark))
    require(src.version >= 0, s"clone source $srcPath does not exist")
    val pinned = (version, timestamp) match {
      case (Some(v), _) => src.loadAsVersion(v)
      case (_, Some(ts)) =>
        val millis = GraftSqlCommands.parseTsLiteral(spark, ts)
        src.loadAsTimestamp(millis)
      case _ => src
    }
    val cloned =
      if (deep) pinned.deepCloneTo(spark, dstPath)
      else pinned.cloneTo(dstPath)
    register()
    Seq(Row(dstPath, cloned.version))
  }
}

/** `SHOW TBLPROPERTIES '<path>'` — Spark's (key, value) shape, values
  * straight from the log's latest metaData configuration.
  */
case class ShowTblPropertiesCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", StringType)(),
    AttributeReference("value", StringType)())
  override def run(spark: SparkSession): Seq[Row] =
    GraftSqlCommands.open(spark, path).tableProperties.toSeq.sortBy(_._1)
      .map { case (k, v) => Row(k, v) }
}

/** `SHOW CREATE TABLE '<path>'` — the statement that would recreate this
  * table through the X187 surface: column list with comments, USING
  * graft, PARTITIONED BY, TBLPROPERTIES. One row, Spark's
  * `createtab_stmt` shape.
  */
case class ShowCreateTableCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("createtab_stmt", StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlCommands.open(spark, path)
    require(t.version >= 0, s"no table at $path")
    val cols = t.schema.fields.map { f =>
      val comment =
        if (f.metadata.contains("comment"))
          s" COMMENT '${f.metadata.getString("comment").replace("'", "''")}'"
        else ""
      s"  ${f.name} ${f.dataType.sql}$comment"
    }.mkString(",\n")
    val parts = t.dlog.partitionColumns
    val partClause =
      if (parts.isEmpty) "" else s"\nPARTITIONED BY (${parts.mkString(", ")})"
    val props = t.tableProperties
    val propClause =
      if (props.isEmpty) ""
      else props.toSeq.sortBy(_._1).map { case (k, v) =>
        s"'${k.replace("'", "''")}' = '${v.replace("'", "''")}'"
      }.mkString("\nTBLPROPERTIES (", ", ", ")")
    Seq(Row(
      s"CREATE TABLE graft.`$path` (\n$cols)\nUSING graft$partClause$propClause"))
  }
}

/** `DESCRIBE [TABLE] '<path>'` — Spark's three-column schema listing,
  * with the partition-information section delta-spark appends.
  */
case class DescribeTableCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("col_name", StringType)(),
    AttributeReference("data_type", StringType)(),
    AttributeReference("comment", StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlCommands.open(spark, path)
    val cols = t.schema.fields.toSeq.map { f =>
      val comment =
        if (f.metadata.contains("comment")) f.metadata.getString("comment")
        else null
      Row(f.name, f.dataType.simpleString, comment)
    }
    val parts = t.dlog.partitionColumns
    val partSection =
      if (parts.isEmpty) Seq.empty
      else Row("# Partition Information", "", null) +:
        parts.map(p => Row(p,
          t.schema.fields.find(_.name == p).map(_.dataType.simpleString)
            .getOrElse(""), null))
    cols ++ partSection
  }
}
