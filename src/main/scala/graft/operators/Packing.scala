package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Sequence packing for LLM pretraining: lay documents end to end and cut
  * the token stream into fixed-size training sequences ("concat and
  * chunk", the standard GPT-style batching — documents may straddle a
  * boundary; the attention mask handles the seam).
  */
object Packing {

  /** Deterministic concat-and-chunk placement: documents are id-hash
    * assigned to one of `numShards` independent streams, laid out in
    * id order within their shard, and the stream is cut every `budget`
    * tokens.
    *
    * Scale shape: one shuffle on the shard id; the running offset is a
    * per-shard window cumsum, so parallelism = numShards — size shards to
    * the cluster (each shard's stream is processed by one task, the same
    * contract as any writer shard). Placement is a pure function of
    * (id set, token counts): stable across runs and engines, and packs
    * only grow at the tail when the corpus grows within a shard.
    *
    * @param tokenCountCol token count of each document (e.g.
    *        `size(TextAnalysis.tokens(col("text")))`)
    * @return one row per document: shard, n_tokens, start_offset in the
    *         shard's token stream, and the first/last pack (sequence)
    *         index the document lands in.
    */
  def packChunked(df: DataFrame, idCol: String, tokenCountCol: Column,
      budget: Int, numShards: Int): DataFrame = {
    require(budget > 0 && numShards > 0, "budget and numShards must be positive")
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol),
        pmod(Sampling.idHash(col(idCol)), lit(numShards.toLong)).as("shard"),
        tokenCountCol.cast("long").as("n_tokens"))
      .withColumn("start_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // integer division end to end: no float quotient to disagree on
      .withColumn("pack_first", expr(s"start_offset DIV $budget"))
      .withColumn("pack_last",
        expr(s"(start_offset + greatest(n_tokens, 1) - 1) DIV $budget"))
  }
}
