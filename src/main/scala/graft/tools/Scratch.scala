package graft.tools

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Throwaway experiment driver (not part of the library surface). */
object Scratch {

  def pairs(inv: DataFrame, threshold: Double): Long =
    inv.as("x").join(inv.as("y"),
        col("x._s") === col("y._s") && col("x._id") < col("y._id"))
      .groupBy(col("x._id").as("a"), col("y._id").as("b"))
      .agg(count(lit(1)).as("_i"),
        first(col("x._n")).as("_na"), first(col("y._n")).as("_nb"))
      .withColumn("jaccard", col("_i") / (col("_na") + col("_nb") - col("_i")))
      .filter(col("jaccard") >= threshold)
      .count()

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val sh = docs.select(col("doc_id").as("_id"),
      TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3).as("_sh"))
    val invStr = sh.select(col("_id"), size(col("_sh")).as("_n"),
      explode(col("_sh")).as("_s"))
    val invHash = sh.select(col("_id"), size(col("_sh")).as("_n"),
        explode(col("_sh")).as("_s0"))
      .select(col("_id"), col("_n"), xxhash64(col("_s0")).as("_s"))
    def time(tag: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $tag ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$r")
    }
    time("string-key")(pairs(invStr, 0.8))
    time("hash-key")(pairs(invHash, 0.8))
    val shC = sh.cache(); shC.count()
    val invStrC = shC.select(col("_id"), size(col("_sh")).as("_n"),
      explode(col("_sh")).as("_s"))
    val invHashC = shC.select(col("_id"), size(col("_sh")).as("_n"),
        explode(col("_sh")).as("_s0"))
      .select(col("_id"), col("_n"), xxhash64(col("_s0")).as("_s"))
    time("string-key-cached")(pairs(invStrC, 0.8))
    time("hash-key-cached")(pairs(invHashC, 0.8))
    val invHashCC = invHashC.cache(); invHashCC.count()
    time("hash-key-index-cached")(pairs(invHashCC, 0.8))
    spark.stop()
  }
}
