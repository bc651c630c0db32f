package graft.tools

import graft.operators.{Dedup, Similarity}
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

    // ANN: deterministically perturbed copies of the embedding corpus;
    // fixed 10-query set, so brute force grows linearly with the corpus
    // while the banded-LSH candidate join touches only matching buckets.
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def perturbed(copies: Int): DataFrame =
      (0 until copies).map { i =>
        emb.select((col("vec_id") + i.toLong * 1000000L).as("vec_id"),
          transform(col("embedding"),
            (x, j) => x * (lit(1.0f) + (pmod(j * 31 + i, lit(13)) - 6).cast("float") * 0.05f))
            .as("embedding"))
      }.reduce(_.union(_))
    var c = 1
    while (c <= maxCopies) {
      val corpus = perturbed(c).cache()
      val n = corpus.count()
      val queries = corpus.filter(col("vec_id") < 10)
      def time(f: => Long): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val bf = time(Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 10).count())
      val lsh = time(Similarity.lshTopK(corpus, queries, "vec_id", "embedding", 10).count())
      val ivf = time(Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", 10).count())
      println(f"ANNSCALE vecs=$n%6d brute=$bf%6.2fs lsh=$lsh%6.2fs ivf=$ivf%6.2fs")
      corpus.unpersist()
      c *= 4
    }

    // connected components: chains of length 64 (diameter stress — 1-hop
    // label propagation would need 64 rounds; star contraction ~log²).
    // Ground truth: edges/63 components, verified each step.
    val chainLen = 64L
    var m = 100000L
    while (m <= 1600000L) {
      val edges = spark.range(m)
        .filter(pmod(col("id"), lit(chainLen)) =!= (chainLen - 1))
        .select(col("id").as("a"), (col("id") + 1L).as("b"))
      val t0 = System.nanoTime()
      val labels = Dedup.connectedComponents(edges)
      val comps = labels.select("component").distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      val expected = (m + chainLen - 1) / chainLen
      println(f"CCSCALE edges=${m}%8d components=$comps%7d (expected $expected) time=$sec%6.2fs")
      m *= 4
    }
    spark.stop()
  }
}
