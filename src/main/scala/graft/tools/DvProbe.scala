package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Measure the DV dead-set resolution tiers against each other across
  * dead-set cardinalities, to place the tier gates from data instead of
  * guesses (guide §1: measure first).
  *
  * Tiers (see [[graft.sources.DeletionVectors.dropDead]]):
  *   inline  — driver decode, literal InSet filter (no join, no build job)
  *   localbc — driver decode, broadcast LOCAL relation anti-join (no build job)
  *   exec    — executor decode, broadcast anti-join (one build job)
  *
  * Usage: runMain graft.tools.DvProbe [sfDir]
  */
object DvProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val n = li.count()

    def timed(body: => Unit): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      runs.sorted.apply(1)
    }

    // one table per cardinality: delete ~k of n rows in one MoR commit
    for (k <- Seq(1000, 4000, 16000, 64000, 128000, 256000)) {
      val d = java.nio.file.Files.createTempDirectory(s"dvprobe-$k-").toString
      var t = graft.DeltaTable.forPath(d).write(li)
      t = t.deleteMergeOnRead(spark,
        Some(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(n)) < k))
      val dead = t.dlog.addActions.values
        .flatMap(graft.sources.DeletionVectors.refOf(_)).map(_.cardinality).sum
      // warm each tier once, then median-of-3
      def withTier[A](rows: Long, refs: Long)(body: => A): A = {
        spark.conf.set("spark.graft.dv.inlineMaxRows", rows.toString)
        spark.conf.set("spark.graft.dv.inlineMaxRefs", refs.toString)
        try body finally {
          spark.conf.unset("spark.graft.dv.inlineMaxRows")
          spark.conf.unset("spark.graft.dv.inlineMaxRefs")
        }
      }
      def scan(): Unit = { t.toDF(spark).count(); () }
      withTier(Long.MaxValue, 1024)(scan()); val inline = withTier(Long.MaxValue, 1024)(timed(scan()))
      withTier(0, 1024)(scan());             val localbc = withTier(0, 1024)(timed(scan()))
      withTier(0, 0)(scan());                val exec = withTier(0, 0)(timed(scan()))
      println(f"DVPROBE dead=$dead%7d inline=${inline}%7.3fs localbc=${localbc}%7.3fs exec=${exec}%7.3fs")
    }
    spark.stop()
  }
}
