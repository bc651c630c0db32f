package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Each query is run once to warm (builds the cached
  * Delta tables, JIT) and then timed over `RUNS` runs, reporting the best —
  * the steady-state number a cluster would see, not first-run table-build
  * cost.
  */
object Bench {

  /** Representative subset: scan, agg, join, window, dedup-join, ANN,
    * data skipping, sessionization.
    */
  val headline: Seq[String] = Seq(
    "q05_delete", "q06_partitioned_scan", "q08_filter_project", "q09_q1_agg",
    "q10_join_agg", "q13_window_latest_order", "q14_topk_orders",
    "q20_ngram_jaccard", "q21_minhash_lsh", "q23_knn_bruteforce",
    "q27_quality_score", "q30_multimodal_features", "q33_stats_skipping_scan",
    "q34_sessionize")

  val RUNS = 2

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = headline.flatMap(n => SparkEntry.queries.get(n).map(n -> _))
    val results = qs.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val sec =
        try { once(); (1 to RUNS).map(_ => once()).min }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
        }
      name -> sec
    }
    val qjson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
