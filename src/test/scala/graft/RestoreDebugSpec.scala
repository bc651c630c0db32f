package graft
import org.apache.spark.sql.functions._
class RestoreDebugSpec extends SparkSuite {
  test("debug2") {
    val d2 = tempDir("dv-restore-dbg2")
    var t2 = DeltaTable.forPath(d2)
      .write(spark.range(0, 1000).toDF("id").repartition(1))
      .setTableProperties(Map("delta.enableDeletionVectors" -> "true"))
    val v1 = t2.version
    t2 = t2.deleteMergeOnRead(spark, Some(col("id") % 10 === 0))
    t2 = t2.restore(v1)
    t2 = t2.deleteMergeOnRead(spark, Some(col("id") < 200))
    val vDv = t2.version
    t2 = t2.delete(spark, Some(col("id") < 500))
    println("DBG head version=" + t2.version + " vDv=" + vDv)
    println("DBG refs@head: " + t2.dlog.addActions.values.flatMap(graft.sources.DeletionVectors.refOf(_)))
    println("DBG prev@vDv refs: " + t2.dlog.loadAsVersion(vDv).addActions.values.flatMap(graft.sources.DeletionVectors.refOf(_)))
    new java.io.File(d2).listFiles()
      .filter(_.getName.startsWith("deletion_vector_")).foreach(f => println("DBG deleting " + f.getName + " -> " + f.delete()))
    try { DeltaTable.forPath(d2).restore(vDv); println("DBG restore SUCCEEDED") }
    catch { case e: Throwable => println("DBG restore threw: " + e.getMessage.take(120)) }
  }
}
