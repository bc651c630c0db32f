package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ColumnNodeToExpressionConverter

/** Bridge to `private[sql]` Column internals (the same package-location
  * technique delta-spark uses): graft's driver-side data skipping walks the
  * Catalyst expression tree of a user predicate before any plan exists.
  * The eager converter (not `ExpressionUtils.expression`, which returns a
  * lazy `ColumnNodeExpression` wrapper) yields real Catalyst nodes
  * (`EqualTo`/`UnresolvedFunction`/…) that the pruner can pattern-match.
  */
object ColumnShim {
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)

  /** Wrap a Catalyst expression back into a DSL Column (for custom
    * expressions like graft.functions.CosineSimilarity).
    */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Re-wrap a streaming micro-batch DataFrame as a BATCH frame over the
    * same physical rows (the delta-spark V1 `Sink.addBatch` technique):
    * the incoming frame is flagged isStreaming, which batch writers
    * reject, but its query execution IS a complete batch of rows.
    */
  /** The SESSION's Hadoop configuration (spark.hadoop.* plus SQL-conf
    * overrides) — what every built-in source resolves filesystems with.
    */
  def hadoopConf(spark: org.apache.spark.sql.SparkSession): org.apache.hadoop.conf.Configuration =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.newHadoopConf()

  /** The session's extension registry (`private[sql]` on the classic
    * session). Injections are picked up by any LATER-built `SessionState`
    * (i.e. `newSession()`), which is how `graft.sql.GraftSql.enable`
    * retrofits the graft SQL parser onto a running application.
    */
  def extensions(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSessionExtensions =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].extensions

  /** A DataFrame over an arbitrary logical plan (`Dataset.ofRows` is
    * `private[sql]`) — how `graft.sql`'s INSERT command materializes its
    * captured query subtree at run time.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def asBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val classic = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** The inverse of [[asBatch]] — flag a batch frame as streaming (the
    * technique `FileStreamSource.getBatch` itself uses): a V1
    * `Source.getBatch` result must carry isStreaming=true or
    * MicroBatchExecution rejects it.
    */
  def asStreaming(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val classic = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
