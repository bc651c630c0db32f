package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scaling probe for the similarity-dedup operators: grows the corpus by
  * unioning salted copies of `documents` (every token suffixed with the
  * copy tag, so shingle sets are disjoint ACROSS copies and the near-dup
  * pair structure is replicated WITHIN each copy — pair output grows
  * linearly, like a real sharded corpus, not quadratically like naive
  * duplication). Reports wall-clock per corpus size.
  *
  * Run: `sbt "runMain graft.tools.ScaleProbe [maxCopies]"`.
  */
object ScaleProbe {

  def salted(docs: DataFrame, copies: Int): DataFrame =
    (0 until copies).map { i =>
      docs.select(
        (col("doc_id") + i.toLong * 1000000L).as("doc_id"),
        // token-level salt: "w1 w2 ..." -> "w1_ci w2_ci ..."
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(t, lit(s"_c$i")))).as("text"))
    }.reduce(_.union(_))

  def main(args: Array[String]): Unit = {
    val maxCopies = args.headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()

    var k = 1
    while (k <= maxCopies) {
      val corpus = salted(docs, k).cache()
      val n = corpus.count()
      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime(); val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (jacSec, jacRows) = time(
        Dedup.ngramJaccardPairs(corpus, "doc_id", "text").count())
      val (lshSec, lshRows) = time(
        Dedup.minHashLshPairs(corpus, "doc_id", "text").count())
      println(f"SCALE docs=$n%6d ngram_jaccard=$jacSec%6.2fs pairs=$jacRows%5d " +
        f"minhash_lsh=$lshSec%6.2fs pairs=$lshRows%5d")
      corpus.unpersist()
      k *= 4
    }
    spark.stop()
  }
}
