package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation/benchmark set — the standard leakage check a
  * training-data pipeline runs before a corpus ships (n-gram overlap
  * decontamination, as published for GPT-3/PaLM-class dataset curation).
  *
  * Scale shape: the benchmark side is an eval suite — thousands of
  * documents, not billions — so its distinct shingle-hash set is
  * broadcast; the corpus side streams through a map-side hash join and
  * one aggregation by document id. The corpus body never rides a shuffle
  * and there is no corpus×benchmark join: cost is one pass over corpus
  * shingles plus |matches| aggregation rows.
  */
object Decontaminate {

  /** Per corpus document: how many of its distinct word `n`-grams appear
    * anywhere in `benchmark`, and a contamination flag. Shingles are
    * compared as 64-bit xxhash64 keys (narrow broadcast + join keys; a
    * cross-doc collision risk of 2^-64 per pair is negligible against a
    * count threshold).
    *
    * @return (idCol, n_matched_ngrams, contaminated) — one row per corpus
    *         document, zero-matched documents included.
    */
  def flagOverlap(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    def shingleHashes(df: DataFrame) =
      df.select(explode(TextAnalysis.shingles(
          TextAnalysis.tokens(col(textCol)), n)).as("_s0"))
        .select(xxhash64(col("_s0")).as("_s"))
    val bench = shingleHashes(benchmark).distinct()
    val matched = corpus
      .select(col(idCol).as("_id"),
        explode(TextAnalysis.shingles(TextAnalysis.tokens(col(textCol)), n)).as("_s0"))
      .select(col("_id"), xxhash64(col("_s0")).as("_s"))
      .join(broadcast(bench), "_s")
      .groupBy("_id").agg(count(lit(1)).as("_n"))
    corpus.select(col(idCol))
      .join(matched, col(idCol) === col("_id"), "left")
      .select(col(idCol),
        coalesce(col("_n"), lit(0L)).as("n_matched_ngrams"),
        col("_n").isNotNull.as("contaminated"))
  }
}
