package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Throwaway experiment driver (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "/tmp/scratch_out"
    for (name <- Seq("q54_pivot", "q55_cube")) {
      val df = SparkEntry.queries(name)(spark, sf)
      
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
      println(s"WROTE $name")
    }
    spark.stop()
  }
}
