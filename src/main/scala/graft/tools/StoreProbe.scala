package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing probe for the q151 minhash-store dedup stages (round 11). */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.QueryLib.delta(spark, d, "documents")
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val storeDir = graft.QueryLib.minhashStoreDir(spark, d)
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    def dedup() = graft.operators.Dedup.minHashStoreDedup(
      spark, storeDir, batch, "doc_id", "text")
    dedup().count() // warm
    time("full dedup")(dedup().count())
    time("full dedup 2")(dedup().count())
    time("store scan")(graft.DeltaTable.forPath(storeDir).toDF(spark).count())
    // batch signature stage alone, via a store-less init into a temp dir
    val tmp = java.nio.file.Files.createTempDirectory("store-probe").toString
    time("batch sig (init)") {
      graft.operators.Dedup.minHashStoreInit(spark, tmp, batch, "doc_id", "text")
        .toDF(spark).count()
    }
    val sig = graft.operators.Dedup.sigOf(batch, "doc_id", "text", 3, 64)
    time("batch sigOf only")(sig.count())
    val stages = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Long, Long)] // stageId, tasks, totalMs, maxMs
    val lst = new org.apache.spark.scheduler.SparkListener {
      val perStage = scala.collection.mutable.Map.empty[Int, (Int, Long, Long)]
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = t.taskInfo.duration
        val (n, tot, mx) = perStage.getOrElse(t.stageId, (0, 0L, 0L))
        perStage(t.stageId) = (n + 1, tot + d, math.max(mx, d))
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val (n, tot, mx) = perStage.getOrElse(s.stageInfo.stageId, (0, 0L, 0L))
        stages += ((s.stageInfo.stageId, n, tot, mx))
      }
    }
    spark.sparkContext.addSparkListener(lst)
    time("batch sigOf only 2")(sig.count())
    Thread.sleep(1500) // let the listener bus drain
    sig.explain("formatted")
    stages.foreach { case (id, n, tot, mx) =>
      println(s"STAGE $id tasks=$n totalMs=$tot maxTaskMs=$mx") }
    spark.sparkContext.removeSparkListener(lst)
    val bands = sig.select(col("id"),
      posexplode(graft.operators.Dedup.bandKeyArray(col("sig"), 16, 4)))
    time("batch bands")(bands.count())
    dedup().explain("formatted")
    spark.stop()
  }
}
