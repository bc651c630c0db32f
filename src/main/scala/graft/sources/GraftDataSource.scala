package graft.sources

import graft.log.{ColumnMapping, WriteMode}
import graft.DeltaTable
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}

/** `format("graft")` — the Spark DataSource registration (delta-spark's
  * own V1 surface), making graft tables first-class citizens of the
  * DataFrame reader/writer and SQL DDL:
  *
  * {{{
  *   spark.read.format("graft").load(path)                      // scan
  *   spark.read.format("graft").option("versionAsOf", 3).load(path)
  *   df.write.format("graft").mode("append").save(path)         // commit
  *   df.writeStream.format("graft").option("checkpointLocation", c)
  *     .start(path)                                             // exactly-once
  *   sql(s"CREATE TABLE t USING graft LOCATION '$path'")        // SQL DDL
  * }}}
  *
  * Reads plan through the log-backed [[GraftFileIndex]] (planner-time
  * stats skipping, zero listing). Snapshots that need scan-side rewrites
  * a bare relation cannot express — active column mapping (physical→
  * logical aliasing) or deletion vectors (anti-join) — are rejected with
  * a pointer to `DeltaTable.forPath(...).toDF`, never served wrong.
  *
  * The streaming sink commits each micro-batch through
  * [[DeltaTable.writeWithTxn]] keyed on (appId, batchId) — Delta's
  * SetTransaction handshake — so a replayed batch (driver retry,
  * checkpoint recovery) commits exactly once.
  */
class GraftDataSource extends RelationProvider with CreatableRelationProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("format(\"graft\") requires a path"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val t = DeltaTable.forPath(pathOf(parameters),
      version = parameters.get("versionAsOf").map(_.toLong))
    val sch = t.dlog.schema
    require(ColumnMapping.isIdentity(ColumnMapping.logicalToPhysical(sch)),
      "this table uses column mapping (renamed/dropped columns); read it " +
        "with DeltaTable.forPath(...).toDF, which aliases physical names")
    val adds = t.dlog.addActions.values.toSeq
    require(!adds.exists(a => DeletionVectors.refOf(a).isDefined),
      "this snapshot carries deletion vectors; read it with " +
        "DeltaTable.forPath(...).toDF, which applies them")
    GraftFileIndex.baseRelation(sqlContext.sparkSession, t.loc, sch,
      t.dlog.partitionColumns, adds, t.conf)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val wm = mode match {
      case SaveMode.Append => WriteMode.Append
      case SaveMode.Overwrite => WriteMode.Overwrite
      case SaveMode.ErrorIfExists => WriteMode.ErrorIfExists
      case SaveMode.Ignore => WriteMode.Ignore
    }
    // V1 CreatableRelationProvider doesn't forward writer.partitionBy —
    // accept it as an option, like delta's early V1 surface
    val partitionBy = parameters.get("partitionBy")
      .map(_.split(",").map(_.trim).toSeq)
    DeltaTable.forPath(pathOf(parameters))
      .write(data, mode = wm, partitionBy = partitionBy)
    createRelation(sqlContext, parameters)
  }

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val path = pathOf(parameters)
    require(outputMode == OutputMode.Append() || outputMode == OutputMode.Update(),
      s"graft sink supports Append/Update output modes, not $outputMode")
    // the idempotence key defaults to the checkpoint location — the same
    // identity Spark uses for the stream's progress — overridable for
    // multi-sink topologies
    val appId = parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation"))
      .getOrElse(s"graft-sink:$path")
    val pb = if (partitionColumns.nonEmpty) Some(partitionColumns) else None
    new Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        val batch = org.apache.spark.sql.graftshim.ColumnShim.asBatch(data)
        DeltaTable.forPath(path).writeWithTxn(batch, appId, batchId, pb)
      }
      override def toString: String = s"GraftSink[$path]"
    }
  }
}
