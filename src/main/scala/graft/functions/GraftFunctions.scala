package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SQL surface for graft's custom expressions.
  *
  * Two registration paths:
  *  - [[GraftExtensions]] via
  *    `spark.sql.extensions=graft.functions.GraftExtensions` (the
  *    SparkSessionExtensions injection point) for cluster-wide setup;
  *  - [[GraftFunctions.register]] for an already-running session.
  *
  * After either, `SELECT cosine_sim(a.embedding, b.embedding)` runs the
  * codegen'd [[CosineSimilarity]].
  */
object GraftFunctions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim expects 2 arguments")
        CosineSimilarity(children.head, children(1))
      }),
    (FunctionIdentifier("md5_prefix60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, "md5_prefix60"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "md5_prefix60 expects 1 argument")
        Md5Prefix60(children.head)
      }),
    (FunctionIdentifier("interleave_bits"),
      new ExpressionInfo(classOf[InterleaveBits].getName, "interleave_bits"),
      (children: Seq[Expression]) => {
        require(children.length >= 2, "interleave_bits expects >= 2 arguments")
        InterleaveBits(children)
      }))

  /** Register into a live session's function registry. */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}

/** `spark.sql.extensions` entry point: graft's SQL functions plus the
  * table-maintenance command parser ([[graft.sql.GraftSqlParser]] —
  * `DESCRIBE HISTORY` / `OPTIMIZE … ZORDER BY` / `VACUUM` / `RESTORE` /
  * `GENERATE` / `CONVERT`), the delta-spark extension shape.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectParser((session, delegate) =>
      new graft.sql.GraftSqlParser(delegate, Option(session)))
    // COUNT/MIN/MAX over a bare graft scan answered from log stats
    ext.injectOptimizerRule(session =>
      new graft.sources.MetadataOnlyAggregates(session))
  }
}
