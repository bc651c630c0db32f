package graft.tools
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicLong, AtomicInteger}
/** Deterministic per-query structure metrics: jobs, stages, tasks and
  * shuffle bytes of one warm execution of each declared query. Unlike
  * wall time these are load-independent, so a structural optimization
  * (removed exchange, fused job) shows as an exact delta.
  * Usage: runMain graft.tools.QMetrics <sfDir> <outJson> [nameFilter,...]
  */
object QMetrics {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = args.lift(1).getOrElse("/tmp/qmetrics.json")
    val only = args.lift(2).map(_.split(",").toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufW = new AtomicLong; val shufR = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size); ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.contains)) }
    // full warm sweep first (fixture builds, caches, JIT)
    qs.foreach { case (n, fn) =>
      try { fn(spark, sfDir).count(); () }
      catch { case e: Throwable => System.err.println(s"[qmetrics] warm $n: ${e.getMessage}") }
    }
    val rows = qs.flatMap { case (n, fn) =>
      try {
        // drain listener queue, reset, run once, drain again
        org.apache.spark.graftshim.ListenerShim.waitUntilEmpty(spark.sparkContext, 30000)
        jobs.set(0); stages.set(0); tasks.set(0); shufW.set(0); shufR.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graftshim.ListenerShim.waitUntilEmpty(spark.sparkContext, 30000)
        Some(f"""  "$n": {"jobs": ${jobs.get}, "stages": ${stages.get}, "tasks": ${tasks.get}, "shuffle_write": ${shufW.get}, "shuffle_read": ${shufR.get}, "wall": $wall%.3f}""")
      } catch { case e: Throwable =>
        System.err.println(s"[qmetrics] $n failed: ${e.getMessage}"); None
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      rows.mkString("{\n", ",\n", "\n}\n").getBytes("UTF-8"))
    println(s"[qmetrics] wrote $outPath (${rows.size} queries)")
    spark.stop()
  }
}
