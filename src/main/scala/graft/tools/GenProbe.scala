package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Probe (round 11): does InferFiltersFromGenerate double-evaluate the
  * expensive window-hash arrays the span operators explode? Compares the
  * shipped `explode(windows)` shape against `explode_outer + isNotNull`
  * (which the rule ignores) on the q85 skeleton.
  */
object GenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.QueryLib.raw(spark, d, "documents")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    def skeleton(explodeOuter: Boolean): DataFrame = {
      val hashed = graft.operators.TextAnalysis.windowedHashesForProbe(col("text"), 5)
      val w =
        if (explodeOuter)
          docs.select(col("doc_id"), explode_outer(hashed).as("_w"))
            .filter(col("_w").isNotNull)
        else docs.select(col("doc_id"), explode(hashed).as("_w"))
      w.groupBy("_w").agg(count(lit(1)).as("_docfreq"))
    }
    skeleton(false).count(); skeleton(true).count() // warm
    time("explode (shipped)")(skeleton(false).count())
    time("explode (shipped) 2")(skeleton(false).count())
    time("explode_outer+notNull")(skeleton(true).count())
    time("explode_outer+notNull 2")(skeleton(true).count())
    // full operator comparison
    def full(): Long =
      graft.operators.TextAnalysis.duplicatePassages(docs, "doc_id", "text").count()
    full()
    time("duplicatePassages full")(full())
    time("duplicatePassages full 2")(full())
    val filt = skeleton(false).queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition.toString
    }
    println("FILTERS(shipped): " + filt.map(_.take(120)).mkString(" | "))
    spark.stop()
  }
}
