package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.concurrent.TrieMap

/** Shared engine-table cache for the declared query inventory.
  *
  * Relational queries run over OUR snapshot scans (DeltaTable.toDF), not raw
  * parquet — every query therefore exercises the log-replay + explicit-file
  * scan path end-to-end. Tables are written once per (sfDir, table) and
  * reused across queries; lifecycle queries (append/overwrite/delete/…)
  * build their own throwaway tables instead.
  */
object QueryLib {

  private val cache = TrieMap.empty[(String, String), String]

  /** Raw driver-generated parquet table. */
  def raw(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The table written into a graft Delta table (once) and scanned back. */
  def delta(spark: SparkSession, sfDir: String, name: String,
      partitionBy: Seq[String] = Seq.empty): DataFrame = {
    val key = (sfDir, name + partitionBy.mkString(":", ",", ""))
    val dir = cache.getOrElseUpdate(key, {
      val d = java.nio.file.Files.createTempDirectory(s"graft-$name-").toString
      DeltaTable.forPath(d).write(raw(spark, sfDir, name),
        partitionBy = if (partitionBy.isEmpty) None else Some(partitionBy))
      d
    })
    DeltaTable.forPath(dir).toDF(spark)
  }

  def tempTableDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
