package graft.tools
import graft.QueryLib
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Ad-hoc optimization-round timing experiments (r14). Each section times
  * sub-pipelines of a hot bench query so a change targets the measured
  * stage, not a guess. Not part of any driver contract.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sections = args.lift(1).map(_.split(",").toSet).getOrElse(Set("q20"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      // warm once, then best-of-2 timed
      f
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"OPT $label%-40s ${runs.map(_._1).min}%7.3fs rows=${runs.head._2}")
    }

    if (sections("stages")) {
      import org.apache.spark.scheduler._
      val sc = spark.sparkContext
      sc.addSparkListener(new SparkListener {
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val m = i.taskMetrics
          println(f"STAGE ${i.stageId}%4d tasks=${i.numTasks}%4d " +
            f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.2fMB " +
            f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.2fMB " +
            f"recW=${m.shuffleWriteMetrics.recordsWritten}%9d ${i.name.take(60)}")
        }
      })
      val docs = QueryLib.delta(spark, sfDir, "documents")
      docs.count()
      val q = args.lift(2).getOrElse("q20_ngram_jaccard")
      graft.SparkEntry.queries(q)(spark, sfDir).count() // warm
      println(s"=== timed run of $q ===")
      graft.SparkEntry.queries(q)(spark, sfDir).count()
      org.apache.spark.graftshim.ListenerShim.waitUntilEmpty(sc, 30000)
    }

    if (sections("q20")) {
      val docs = QueryLib.delta(spark, sfDir, "documents")
      docs.count()
      // full operator
      time("q20 full")(Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
      // shingling alone (no cache)
      time("shingle+explode+hash")(
        docs.select(col("doc_id"),
            explode(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3)).as("_s0"))
          .select(xxhash64(col("_s0")).as("_s")).count())
      // df aggregate alone
      time("df groupBy")(
        docs.select(col("doc_id"),
            explode(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3)).as("_s0"))
          .select(xxhash64(col("_s0")).as("_s"))
          .groupBy("_s").agg(count(lit(1)).as("_df"))
          .filter(col("_df") >= 2 && col("_df") <= 1024).count())
    }

    if (sections("cc")) {
      val docs = QueryLib.delta(spark, sfDir, "documents")
      docs.count()
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      time("pairs count")(pairs.count())
      time("cc full")(Dedup.connectedComponents(pairs).count())
    }

    if (sections("open")) {
      val dir = QueryLib.deltaDir(spark, sfDir, "documents")
      time("forPath open+plan")(
        { graft.DeltaTable.forPath(dir).toDF(spark); 0L })
      time("forPath open+count")(
        graft.DeltaTable.forPath(dir).toDF(spark).count())
    }
    spark.stop()
  }
}
