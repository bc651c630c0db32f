package graft.operators

import graft.functions.{KmvAgg, KmvMergeAgg, Md5Prefix60}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Mergeable distinct-count sketches (k-minimum-values).
  *
  * The 100 TB problem this solves: "how many distinct urls / docs / users
  * per domain" over a growing corpus. `count(DISTINCT x)` re-shuffles every
  * raw value on every question; a KMV sketch row per (shard, group) is ≤k
  * longs, unions losslessly (`min_k(A ∪ B) = min_k(min_k(A) ∪ min_k(B))`),
  * and answers later cardinality questions from sketch-sized input only —
  * the same incremental-store pattern as the MinHash signature table, and
  * the reason sketches beat exact counting once history can't be rescanned.
  *
  * Estimator: with h uniform on [0, 2^60), the k-th smallest of n distinct
  * values sits near k/n of the range, so `n ≈ (k-1)·2^60 / h_(k)` (the
  * classic KMV/bottom-k estimator, ~1/√k relative error — k=256 ≈ 6%).
  * Everything is md5-derived and order-free, so sketches AND estimates are
  * engine-reproducible bit-for-bit (DuckDB oracle in q158) — the reason
  * this is KMV and not Spark's HLL++ whose register state nothing else can
  * replay.
  */
object Sketches {

  /** 2^60 — the md5-prefix60 hash-space size, exact as a double. */
  val HashSpace: Double = 1152921504606846976.0d

  /** The sketch's hash: md5-prefix60 of the value's string form (codegen'd
    * [[Md5Prefix60]]; DuckDB: `('0x' || substr(md5(x),1,15))::BIGINT`).
    */
  def kmvHash(value: Column): Column =
    ColumnShim.column(Md5Prefix60(ColumnShim.expression(value.cast("string"))))

  /** Aggregate Column: the k smallest distinct values of `hash` (ascending
    * `array<bigint>`, shorter when the group has fewer distincts).
    */
  def kmvAgg(hash: Column, k: Int): Column =
    ColumnShim.column(
      KmvAgg(ColumnShim.expression(hash), k).toAggregateExpression())

  /** Aggregate Column: union of sketch rows back into one sketch — the
    * re-aggregation side (shards → corpus, days → month, …).
    */
  def kmvMergeAgg(sketch: Column, k: Int): Column =
    ColumnShim.column(
      KmvMergeAgg(ColumnShim.expression(sketch), k).toAggregateExpression())

  /** Distinct-count estimate from a sketch: exact size below k (the sketch
    * IS the distinct set then), else the bottom-k estimator floored to a
    * long so every engine lands on the same integer.
    */
  def estimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("long"))
      .otherwise(floor(
        lit((k - 1).toDouble) * lit(HashSpace) /
          element_at(sketch, k).cast("double")).cast("long"))

  /** Per-key sketch table: `keys…, kmv_sketch` — one bounded row per key,
    * map-side-combined (the shuffle carries ≤k longs per partition×key).
    */
  def kmvSketch(df: DataFrame, keys: Seq[String], value: Column,
      k: Int): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(kmvAgg(kmvHash(value), k).as("kmv_sketch"))

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) — the mergeable
    * heavy-hitter counter that answers "how frequent is this token/key"
    * from d × w counters instead of a vocabulary-sized exact groupBy:
    * the cheap pre-pass that FEEDS the df guards (X2's maxDocFreq) and
    * salting decisions without ever shuffling the full vocabulary.
    * Hash row r of value v increments bucket md5₆₀(r:v) mod w; an
    * estimate is the min over rows — always ≥ the true count, within
    * εN with probability 1−δ at w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
    *
    * Scale shape: one explode (×d) into a map-side-combined
    * groupBy(row, bucket) — the result is d·w rows TOTAL regardless of
    * corpus size, trivially mergeable across batches by summing cnt.
    * md5-based hashing keeps it engine-replayable like every store.
    */
  def cmsSketch(df: DataFrame, value: Column, d: Int = 4,
      w: Int = 1024): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2; got d=$d w=$w")
    df.select(value.cast("string").as("_v"))
      .filter(length(col("_v")) > 0)
      .withColumn("row", explode(sequence(lit(0L), lit(d - 1L))))
      .select(col("row"),
        pmod(Sampling.idHash(concat_ws(":", col("row"), col("_v"))),
          lit(w.toLong)).as("bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
      // carry the build parameters WITH the sketch so estimates can never
      // probe against mismatched buckets (a wrong d/w would silently
      // undercut the est >= true CMS contract)
      .withColumn("d", lit(d)).withColumn("w", lit(w))
  }

  /** Point estimates from a CMS: min over the d rows' buckets; an
    * unseen bucket counts 0. The d·w-row sketch BROADCASTS. d and w are
    * read off the sketch's own carried columns — the parameters it was
    * BUILT with — so a non-default sketch cannot be probed wrong.
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame,
      tokenCol: String): DataFrame = {
    require(sketch.columns.contains("d") && sketch.columns.contains("w"),
      "sketch must carry its build parameters (d, w) — build with cmsSketch")
    val Array(d, w) = sketch.select(max("d"), max("w")).head()
      .toSeq.map(_.asInstanceOf[Int].toLong).toArray
    val pb = probes.select(col(tokenCol).cast("string").as("token"))
      .filter(length(col("token")) > 0).distinct()
      .withColumn("row", explode(sequence(lit(0L), lit(d - 1L))))
      .withColumn("bucket",
        pmod(Sampling.idHash(concat_ws(":", col("row"), col("token"))),
          lit(w)))
    pb.join(broadcast(sketch.select("row", "bucket", "cnt")),
        Seq("row", "bucket"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  // ------------------------------------------------------------------
  // Sketch STORE: per-batch sketch rows persisted as a Delta table, so
  // corpus-wide cardinality questions read sketch-sized history instead
  // of 100 TB of raw values (the KMV twin of the MinHash signature
  // store). Store schema: keys…, kmv_sketch, batch.
  // ------------------------------------------------------------------

  /** Create the store from the first batch; k and the key columns pin to
    * table properties so later appends cannot silently change the sketch
    * contract.
    */
  def kmvStoreInit(storeDir: String, df: DataFrame, keys: Seq[String],
      value: Column, k: Int, batchId: String): graft.DeltaTable =
    graft.DeltaTable.forPath(storeDir)
      .write(kmvSketch(df, keys, value, k).withColumn("batch", lit(batchId)))
      .setTableProperties(Map(
        "graft.kmv.k" -> k.toString,
        "graft.kmv.keys" -> keys.mkString(",")))

  /** Append one batch's per-key sketches as one atomic commit. The
    * optional `batchTxn` (appId, batchVersion) rides delta's
    * SetTransaction handshake so a RE-DELIVERED batch appends exactly
    * once — same idempotence contract as the MinHash store and the
    * streaming sinks.
    */
  def kmvStoreAppend(storeDir: String, df: DataFrame, value: Column,
      batchId: String, batchTxn: Option[(String, Long)] = None): graft.DeltaTable = {
    val store = graft.DeltaTable.forPath(storeDir)
    val (k, keys) = storeContract(store, storeDir)
    val rows = kmvSketch(df, keys, value, k).withColumn("batch", lit(batchId))
    batchTxn match {
      case Some((app, ver)) => store.writeWithTxn(rows, app, ver)
      case None => store.write(rows)
    }
  }

  /** Corpus cardinality per key from the store alone: merge each key's
    * batch sketches (lossless — min-k composes) and estimate. Input is
    * O(keys × batches × k) longs; the raw corpus is never touched.
    */
  def kmvStoreCardinality(spark: org.apache.spark.sql.SparkSession,
      storeDir: String): DataFrame = {
    val store = graft.DeltaTable.forPath(storeDir)
    val (k, keys) = storeContract(store, storeDir)
    store.toDF(spark)
      .groupBy(keys.map(col): _*)
      .agg(kmvMergeAgg(col("kmv_sketch"), k).as("_kmv"),
        countDistinct(col("batch")).as("n_batches"))
      .select(keys.map(col) ++ Seq(
        estimate(col("_kmv"), k).as("est_distinct"),
        // try_: a key with under k distincts has a short sketch (NULL kth)
        try_element_at(col("_kmv"), lit(k)).as("kth_hash"),
        col("n_batches")): _*)
  }

  private def storeContract(store: graft.DeltaTable,
      storeDir: String): (Int, Seq[String]) = {
    val props = store.tableProperties
    val k = props.getOrElse("graft.kmv.k", throw new IllegalStateException(
      s"$storeDir is not a kmv store (no graft.kmv.k property)")).toInt
    (k, props("graft.kmv.keys").split(",").toSeq)
  }
}
