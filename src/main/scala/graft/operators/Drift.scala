package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Corpus drift reports between two snapshots of a dataset — the checks a
  * training pipeline runs before accepting a refreshed crawl batch or
  * after a retention delete: did the value distributions move, did a
  * category's share collapse, did null rates spike? Delta time travel
  * makes the two sides free (`loadAsVersion(v).toDF` vs the current
  * snapshot) — no extra copies of the data exist.
  *
  * Scale shape: each report is ONE map-side-combined aggregation per side
  * (numeric: a single row of per-column structs; categorical: one row per
  * category — cardinality-scale, not data-scale) followed by a
  * metadata-sized join or explode. No data-scale shuffle, no window, no
  * driver collect of anything wider than the report itself.
  */
object Drift {

  /** Per-column numeric drift: one output row per requested column with
    * count / mean / stddev (sample) / min / max / null rate for each side
    * and the mean delta. Columns must be numeric on both sides.
    *
    * The two sides aggregate independently (one pass each, partial
    * aggregation map-side); the per-column rows come from exploding a
    * one-row struct array, so the join joining the sides is 1 row × 1 row.
    */
  def numericDrift(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numericDrift requires at least one column")
    def sideAgg(df: DataFrame, tag: String): DataFrame = {
      val aggs = cols.flatMap { c =>
        Seq(count(col(c)).as(s"cnt_$c"),
          avg(col(c)).as(s"mean_$c"),
          stddev_samp(col(c)).as(s"std_$c"),
          min(col(c)).cast("double").as(s"min_$c"),
          max(col(c)).cast("double").as(s"max_$c"),
          count(lit(1)).as(s"n_$c"))
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      // one row -> one struct per column -> explode to column-keyed rows
      val packed = one.select(explode(array(cols.map(c =>
        struct(lit(c).as("column"),
          col(s"cnt_$c").as(s"count_$tag"),
          round(col(s"mean_$c"), 4).as(s"mean_$tag"),
          round(col(s"std_$c"), 4).as(s"stddev_$tag"),
          col(s"min_$c").as(s"min_$tag"),
          col(s"max_$c").as(s"max_$tag"),
          round((col(s"n_$c") - col(s"cnt_$c")) / col(s"n_$c"), 6)
            .as(s"null_rate_$tag"))): _*)).as("_s"))
      packed.select(col("_s.*"))
    }
    sideAgg(a, "a").join(sideAgg(b, "b"), "column")
      .withColumn("mean_delta", round(col("mean_b") - col("mean_a"), 4))
      .orderBy("column")
  }

  /** EMBEDDING-space drift per domain: the cosine between each key's
    * centroid vector on the two sides — the semantic-shift check (topic
    * drift, encoder version skew, poisoned-batch detection) numeric
    * column stats cannot see. Output: per key, both counts, both mean
    * L2 norms, and `centroid_cos` (1.0 = no directional shift).
    *
    * Scale shape: one posexplode to (key, dim, component) — dim is a
    * small constant, so this is a constant-factor blowup, not a join —
    * then a map-side-combined avg per (key, dim) (keys×dim rows,
    * metadata-scale) reassembled into ordered centroid arrays; the
    * two sides meet in a key-cardinality join. No data-scale shuffle
    * beyond the per-(key,dim) partial aggregation.
    */
  def embeddingDrift(a: DataFrame, b: DataFrame, keyCol: String,
      vecCol: String): DataFrame = {
    def side(df: DataFrame, tag: String): DataFrame = {
      val v = Similarity.toDouble(col(vecCol))
      df.select(col(keyCol), sqrt(Similarity.dot(v, v)).as("_nrm"),
          posexplode(v))
        .groupBy(col(keyCol), col("pos"))
        .agg(avg(col("col")).as("_m"), count(lit(1)).as("_n"),
          avg(col("_nrm")).as("_an"))
        .groupBy(col(keyCol))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("_m")))),
            s => s.getField("_m")).as(s"_c$tag"),
          // min, not first: the per-dim norm averages are ulp-identical
          // in exact arithmetic but partial-agg order may differ per
          // dim — min picks the same representative as the oracle
          min(col("_n")).as(s"count_$tag"),
          round(min(col("_an")), 4).as(s"mean_norm_$tag"))
    }
    side(a, "a").join(side(b, "b"), keyCol)
      .withColumn("centroid_cos",
        round(Similarity.cosine(col("_ca"), col("_cb")), 6))
      .drop("_ca", "_cb")
      .orderBy(keyCol)
  }

  /** Per-category drift of one categorical column: each category's count
    * and share on both sides plus its Population Stability Index
    * contribution `(p_a - p_b) * ln(p_a / p_b)` (the standard drift score;
    * Σ over categories = total PSI, > 0.25 is the conventional "major
    * shift" alarm). Categories absent from one side stay VISIBLE at count
    * 0; shares are Laplace-smoothed by `smoothing` inside the PSI log so
    * a vanished category scores finite, auditable drift instead of ∞.
    */
  def categoricalDrift(a: DataFrame, b: DataFrame, colName: String,
      smoothing: Double = 1e-6): DataFrame = {
    require(smoothing > 0, "smoothing must be positive (ln(0) guard)")
    // shares normalize by a 1-row broadcast total (NOT a global window —
    // even over category-cardinality rows, keeping WindowExec out of the
    // plan keeps the shape single-task-free by construction); the
    // full-outer join then runs over category-cardinality rows only
    def shares(df: DataFrame, tag: String): DataFrame = {
      val cnt = df.groupBy(col(colName)).agg(count(lit(1)).as(s"count_$tag"))
      val tot = cnt.agg(sum(col(s"count_$tag")).as(s"_tot_$tag"))
      cnt.crossJoin(broadcast(tot))
        .withColumn(s"share_$tag", col(s"count_$tag") / col(s"_tot_$tag"))
        .drop(s"_tot_$tag")
    }
    def sm(c: Column): Column = c + lit(smoothing)
    shares(a, "a").join(shares(b, "b"), Seq(colName), "full_outer")
      .na.fill(0L, Seq("count_a", "count_b"))
      .na.fill(0.0, Seq("share_a", "share_b"))
      .withColumn("psi", round(
        (sm(col("share_a")) - sm(col("share_b"))) *
          log(sm(col("share_a")) / sm(col("share_b"))), 6))
      .select(col(colName), col("count_a"), col("count_b"),
        round(col("share_a"), 6).as("share_a"),
        round(col("share_b"), 6).as("share_b"), col("psi"))
      .orderBy(colName)
  }
}
