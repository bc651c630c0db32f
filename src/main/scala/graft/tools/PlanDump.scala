package graft.tools
import org.apache.spark.sql.SparkSession
/** Dump `.explain("formatted")` of declared queries to files — the
  * optimization-round plan evidence (plans/r14/<query>_{before,after}.txt).
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...> [run]
  *
  * With the optional 5th arg `run`, the query is EXECUTED before dumping,
  * so the dump shows the FINAL adaptive plan — `AQEShuffleRead`s, runtime
  * join rewrites and `ReusedExchange` nodes that `isFinalPlan=false` dumps
  * cannot show. Exchange-reuse claims need this mode for their evidence.
  * The action is `collect()` ON THE DATASET'S OWN QueryExecution (a noop
  * write or count would execute a different wrapped plan and leave this
  * one un-finalized); safe here because every declared query's result is
  * oracle-compared row-for-row, i.e. bounded by design.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    val runFirst = args.lift(4).contains("run")
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
    new java.io.File(outDir).mkdirs()
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { n =>
      graft.SparkEntry.queries.get(n) match {
        case Some(fn) =>
          val df = fn(spark, sfDir)
          if (runFirst) { df.collect(); () }
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
            plan.getBytes("UTF-8"))
          println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
        case None => System.err.println(s"[plandump] unknown query $n")
      }
    }
    spark.stop()
  }
}
