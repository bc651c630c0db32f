package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sampling/splitting for training pipelines.
  *
  * Random sampling is useless for reproducible dataset curation: the
  * membership of train/val/test must be a pure function of the document
  * id, stable across runs, engines, and corpus growth (adding documents
  * never moves an existing one between splits). The standard trick is
  * bucketing a cryptographic hash of the id — pure codegen'd column
  * algebra, zero shuffle.
  */
object Sampling {

  /** Engine-independent 60-bit hash of the id's decimal string: the first
    * 15 hex digits of md5, so any SQL engine reproduces the same buckets
    * (DuckDB: ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT).
    * Computed by the codegen'd [[graft.functions.Md5Prefix60]] — digest
    * bytes straight to long, no hex-string/radix-parse detour.
    */
  def idHash(id: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.functions.Md5Prefix60(
        org.apache.spark.sql.graftshim.ColumnShim.expression(
          id.cast("string").cast("binary"))))

  /** Assign each row a split label by hash bucket: buckets [0, trainPct)
    * → "train", [trainPct, trainPct+valPct) → "val", rest → "test".
    */
  def hashSplit(df: DataFrame, idCol: String,
      trainPct: Int = 90, valPct: Int = 5, buckets: Int = 100): DataFrame = {
    require(trainPct + valPct <= buckets, "split fractions exceed bucket count")
    val b = pmod(idHash(col(idCol)), lit(buckets.toLong))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic `pct`% sample: rows whose hash bucket falls below pct.
    * Supersets are stable: sampleFraction(5) ⊆ sampleFraction(20).
    */
  def sampleFraction(df: DataFrame, idCol: String, pct: Int,
      buckets: Int = 100): DataFrame =
    df.filter(pmod(idHash(col(idCol)), lit(buckets.toLong)) < pct)

  /** Deterministic STRATIFIED sample: a per-stratum percentage, applied
    * with the same id-hash bucketing — the class-rebalancing step of a
    * training-data pipeline (e.g. downsample boilerplate `lang`s, keep
    * all of the rare ones). Strata absent from `pctByStratum` fall back
    * to `defaultPct`. Pure row-local filtering: no shuffle, no sampling
    * state, stable under corpus growth and re-runs.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      pctByStratum: Map[String, Int], defaultPct: Int = 100,
      buckets: Int = 100): DataFrame = {
    require((pctByStratum.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= buckets),
      "percentages must be within [0, buckets]")
    val pct = pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(col(stratumCol) === s, lit(p)).otherwise(acc)
    }
    df.filter(pmod(idHash(col(idCol)), lit(buckets.toLong)) < pct)
  }

  /** Deterministic MIXTURE sampling: downsample each class toward a target
    * mixture — "sample ~`totalTarget` documents with class proportions
    * `weights`" (the dataset-mixture step of a pretraining pipeline: weight
    * web/books/code sources, drop the rest). Classes absent from `weights`
    * are dropped; a class too small for its target keeps everything
    * (capped at 100%), shifting the realized mixture rather than inventing
    * rows.
    *
    * Scale shape: per-class counts are a tiny aggregate broadcast back;
    * membership is then a pure row-local hash filter — deterministic,
    * engine-reproducible, stable under re-runs.
    */
  def mixtureSample(df: DataFrame, idCol: String, classCol: String,
      weights: Map[String, Double], totalTarget: Long,
      buckets: Int = 10000): DataFrame = {
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("_cn"))
    val w = weights.foldLeft(lit(0.0)) { case (acc, (c, p)) =>
      when(col(classCol) === c, lit(p)).otherwise(acc)
    }
    // fixed operation order (T*w / count * buckets) so any engine
    // replaying this IEEE sequence lands on the identical threshold
    val keepBuckets = least(lit(buckets.toLong),
      floor(lit(totalTarget.toDouble) * w / col("_cn") * buckets))
    df.join(broadcast(counts), classCol)
      .filter(pmod(idHash(col(idCol)), lit(buckets.toLong)) < keepBuckets)
      .drop("_cn")
  }

  /** Domain capping: keep at most `k` rows per group, preferring `order`
    * (e.g. longest documents first, id tie-break for determinism) — the
    * standard guard against a handful of crawl domains dominating a
    * training mix.
    *
    * Shape: a rank-filtered window. Catalyst's InferWindowGroupLimit
    * rewrites it to a PARTIAL top-k per input partition BEFORE the
    * shuffle plus a final top-k after — so a domain with 10⁹ rows ships
    * at most k rows per upstream partition, never the whole domain, and
    * the skewed-domain hot spot a naive groupBy-collect would hit cannot
    * form. (PlanSpec asserts the WindowGroupLimit is present.)
    */
  def capPerGroup(df: DataFrame, groupCol: String, k: Int,
      order: Seq[Column]): DataFrame = {
    require(k > 0, "cap must be positive")
    require(order.nonEmpty, "capPerGroup needs a deterministic order")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(order: _*)
    df.withColumn("_cap_rk", row_number().over(w))
      .filter(col("_cap_rk") <= k)
      .drop("_cap_rk")
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-ES): each row draws u = (md5_prefix60(seed:id)+1)/2^60 and
    * ranks by `ln(u)/w` (monotone in the classic u^(1/w) key), so the
    * top-k per group IS a weighted sample without replacement — and a pure
    * function of (seed, id, w) that any engine regenerates row for row.
    * The key is rounded to 9 decimals with an id tiebreak so a last-ulp
    * libm difference between engines cannot reorder the cut.
    *
    * Scale shape: grouped mode is a bounded-k window — row_number over
    * (group, key) runs through WindowGroupLimit, which drops losers
    * map-side before the shuffle, so a hot group never materializes its
    * full membership in one task. Global mode (no group) never uses a
    * single-partition window: it is sort+limit, i.e. TakeOrdered's
    * per-partition top-k then a k-sized driver merge.
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int,
      seed: String, groupCols: Seq[String] = Seq.empty): DataFrame = {
    require(k > 0, "sample size must be positive")
    val u = (idHash(concat(lit(seed), lit(":"), col(idCol).cast("string"))) +
      lit(1L)).cast("double") / lit(Sketches.HashSpace)
    // weight must be strictly positive for the key to be defined; make a
    // bad weight a loud error, not a silently-dropped row
    val guarded = when(weight > 0, weight.cast("double"))
      .otherwise(raise_error(concat(lit(s"weightedSample: non-positive weight for id "),
        col(idCol).cast("string"))))
    val keyed = df.withColumn("_es_key", round(log(u) / guarded, 9))
    if (groupCols.isEmpty)
      keyed.orderBy(col("_es_key").desc, col(idCol)).limit(k)
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(groupCols.map(col): _*)
        .orderBy(col("_es_key").desc, col(idCol))
      keyed.withColumn("_es_rk", row_number().over(w))
        .filter(col("_es_rk") <= k)
        .drop("_es_rk")
    }
  }

  /** Deterministic global permutation — the "shuffle the corpus once per
    * epoch" step of a training pipeline, as a pure function of (seed,
    * id) so any engine reproduces the identical order. The key is
    * `md5(seed || ":" || id)` (engine-portable, like [[idHash]]);
    * `repartitionByRange` on it + a within-partition sort yields a TOTAL
    * order across output partitions (range partitioner) without ever
    * materializing a single-node global sort — the sampled range
    * boundaries cost one lightweight pass, the permutation itself is one
    * shuffle. The key column is kept (`_shuffle_key`) so consumers can
    * verify or resume the order.
    */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: String,
      partitions: Int = 0): DataFrame = {
    val keyed = df.withColumn("_shuffle_key",
      md5(concat(lit(seed + ":"), col(idCol).cast("string"))))
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    keyed.repartitionByRange(n, col("_shuffle_key"))
      .sortWithinPartitions("_shuffle_key")
  }

  /** Budget-capped corpus selection: take documents best-score-first until
    * the running token total reaches `budget` — "give me the best 50 B
    * tokens", the final gate of a curation pipeline.
    *
    * The running total is a GLOBAL ordered cumulative sum, which a naive
    * window computes on ONE task (the classic scale killer). Here it is
    * two passes: (1) range-repartition by (score desc, id) — a total
    * order across partitions from sampled boundaries; (2) per-partition
    * token totals (an O(partitions) driver fold) become broadcast prefix
    * offsets, and each row's global cumulative = its partition's offset +
    * a WITHIN-partition running sum. No single-task stage anywhere; the
    * id tie-break makes the selection a pure function of the corpus, so
    * any engine reproduces the same cut.
    */
  /** Per-group IQR outlier clipping (Tukey's fences — the standard
    * numeric-cleaning pass before a value column feeds features or
    * labels): rows outside `[q1 − k·iqr, q3 + k·iqr]` of their group
    * drop. Quartiles are EXACT interpolated percentiles so the fences
    * are engine-reproducible (the q52 contract).
    *
    * Scale shape: one map-side-combined percentile aggregate per group
    * (group count rows, metadata-scale vs the data), joined back on the
    * group key — the optimizer broadcasts the bounds table when small
    * and shuffle-joins otherwise; the filter itself is row-local.
    *
    * @return the input rows that survive, plus their group's fences
    *         (`_lo`, `_hi`) for auditability
    */
  /** Per-group ROBUST z-scores (median/MAD — outlier-immune where
    * mean/stddev are not): `z = (x − median) / (1.4826·MAD)`, MAD the
    * median absolute deviation; 1.4826 makes z σ-consistent under
    * normality (the standard robust-scaling constant). EXACT interpolated
    * medians (the q52/engine-reproducible contract, like [[iqrClip]]'s
    * quartiles), so any engine replays the scores. Two map-side-combined
    * group aggregations (median pass, then MAD over joined deviations) +
    * a group-cardinality join back; all-equal groups (MAD 0) yield null z
    * rather than ±Infinity.
    */
  def robustZScore(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("_med"))
    val mad = df.join(med, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(expr(s"percentile(abs($valueCol - _med), 0.5)").as("_mad"))
    df.join(med, Seq(groupCol)).join(mad, Seq(groupCol))
      .withColumn("robust_z",
        when(col("_mad") > 0,
          round((col(valueCol) - col("_med")) / (lit(1.4826) * col("_mad")), 6)))
      .drop("_med", "_mad")
  }

  def iqrClip(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 1.5): DataFrame = {
    val bounds = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.25)").as("_q1"),
        expr(s"percentile($valueCol, 0.75)").as("_q3"))
      .select(col(groupCol),
        (col("_q1") - lit(k) * (col("_q3") - col("_q1"))).as("_lo"),
        (col("_q3") + lit(k) * (col("_q3") - col("_q1"))).as("_hi"))
    df.join(bounds, Seq(groupCol))
      .filter(col(valueCol) >= col("_lo") && col(valueCol) <= col("_hi"))
  }

  /** Token-budget mixture allocation: given target mixture WEIGHTS per
    * domain and a global token budget, the per-domain sampling plan a
    * pretraining data loader consumes — target token mass, sampling rate
    * (≤ 1), and epochs (> 1 means the domain repeats; the
    * over-sampling signal of every published data-mixture recipe).
    * Weights renormalize over the domains PRESENT in the corpus, so a
    * missing domain re-distributes its share instead of silently
    * shrinking the budget; domains with no declared weight report with
    * rate 0 (visible, not dropped).
    *
    * Scale shape: one map-side-combined aggregation for the per-domain
    * token mass (domain cardinality is tiny), a broadcast weights join,
    * and a 1-row broadcast total for the renormalization — no driver
    * collect, no second pass over the corpus. `target_tokens` floors
    * (half-up vs half-even round would diverge across engines);
    * rate/epochs derive from the UNFLOORED target.
    */
  def mixtureAllocation(df: DataFrame, keyCol: String, tokensCol: Column,
      weights: Map[String, Double], budgetTokens: Long): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0.0),
      "weights must be non-empty and non-negative")
    require(budgetTokens > 0, "budgetTokens must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val avail = df.groupBy(col(keyCol))
      .agg(sum(tokensCol).cast("long").as("available_tokens"))
    val wDf = weights.toSeq.toDF(keyCol, "_w")
    val joined = avail.join(broadcast(wDf), Seq(keyCol), "left")
      .withColumn("_w", coalesce(col("_w"), lit(0.0)))
    // the renormalized weight total must be positive — if NO present
    // domain carries a declared weight, every rate would silently become
    // null/Infinity instead of an answer; fail loudly (the "visible, not
    // dropped" contract cuts both ways)
    val wtot = broadcast(joined.agg(sum("_w").as("_wtot"))
      .select(when(col("_wtot") > 0.0, col("_wtot"))
        .otherwise(raise_error(lit("mixtureAllocation: no declared weight " +
          "matches any domain present in the corpus (renormalized weight " +
          "total is 0)"))).as("_wtot")))
    val target = lit(budgetTokens.toDouble) * col("_w") / col("_wtot")
    // a domain with zero token mass can't be sampled at any rate: report
    // rate/epochs 0 (target_tokens still shows the ask) instead of a
    // silent null/Infinity from the division
    def perAvail(c: Column): Column =
      when(col("available_tokens") > 0, c).otherwise(lit(0.0))
    joined.crossJoin(wtot)
      .select(col(keyCol),
        coalesce(col("available_tokens"), lit(0L)).as("available_tokens"),
        floor(target).cast("long").as("target_tokens"),
        round(perAvail(least(lit(1.0), target / col("available_tokens"))), 6)
          .as("sampling_rate"),
        round(perAvail(target / col("available_tokens")), 6).as("epochs"))
  }

  /** MATERIALIZE a mixture plan — the execution step behind
    * [[mixtureAllocation]]'s arithmetic: every document of a domain with
    * `epochs = e` appears `floor(e)` times plus one more with
    * probability `frac(e)`, decided deterministically per document by
    * the 60-bit md5 of `seed:id` (so any engine reproduces the exact
    * replicated corpus, and re-running the pipeline regenerates it
    * bit-for-bit — the property that makes >1-epoch oversampling
    * auditable instead of a dataloader-side dice roll). Domains absent
    * from `epochs` contribute nothing. A `copy` index (1-based) rides
    * each output row so downstream shuffling can separate the replicas.
    *
    * Scale shape: a broadcast join of the (domain-cardinality) epochs
    * table, then row-local codegen'd column algebra and one explode of a
    * ≤⌈e⌉-element sequence — no shuffle, no driver collect; output
    * volume is exactly the plan's token mass.
    */
  def applyMixture(df: DataFrame, keyCol: String, idCol: String,
      epochs: Map[String, Double], seed: String = "mix"): DataFrame = {
    require(epochs.values.forall(e => e >= 0.0 && e.isFinite),
      "epochs must be finite and non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val eDf = broadcast(epochs.toSeq.toDF(keyCol, "_e"))
    // fractional-part bernoulli as an INTEGER hash compare: the
    // threshold floor(frac(e) * 2^60) is the same IEEE-double expression
    // the oracle computes, so the selected copy set is engine-exact
    val thresh = floor((col("_e") - floor(col("_e"))) *
      lit(1152921504606846976.0)).cast("long") // 2^60
    val copies = (floor(col("_e")).cast("long") +
      when(idHash(concat(lit(s"$seed:"), col(idCol).cast("string"))) < thresh,
        1L).otherwise(0L)).as("_copies")
    df.join(eDf, Seq(keyCol)) // inner: undeclared domains contribute nothing
      .withColumn("_copies", copies)
      // sequence(1, 0) would generate a DESCENDING [1, 0] — guard to an
      // empty array so 0-copy docs drop instead of duplicating
      .withColumn("copy", explode(when(col("_copies") >= 1L,
        sequence(lit(1L), col("_copies")))
        .otherwise(array().cast("array<bigint>"))))
      .drop("_e", "_copies")
  }

  def selectUnderTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
      scoreCol: String, budget: Long, partitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val order = Seq(col(scoreCol).desc, col(idCol).asc)
    val ranged = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_tb_pid", spark_partition_id())
    // per-partition totals -> exclusive prefix offsets, all INSIDE one
    // plan (ReuseExchange computes the range shuffle once for both
    // branches; a driver collect would risk re-sampled, divergent range
    // boundaries between jobs). The offsets window is global but runs
    // over ≤ numShufflePartitions rows — metadata scale, not data scale.
    import org.apache.spark.sql.expressions.Window
    val wOff = Window.orderBy("_tb_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offDf = ranged.groupBy("_tb_pid")
      .agg(sum(col(tokenCol).cast("long")).as("_tb_sum"))
      .withColumn("_tb_off", coalesce(sum("_tb_sum").over(wOff), lit(0L)))
      .drop("_tb_sum")
    val w = Window.partitionBy("_tb_pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offDf), "_tb_pid")
      .withColumn("_tb_cum",
        col("_tb_off") + sum(col(tokenCol).cast("long")).over(w))
      .filter(col("_tb_cum") <= budget)
      .drop("_tb_pid", "_tb_off", "_tb_cum")
  }

  /** EXACT stratified split: within every stratum, deterministic
    * md5-least ordering cut at integer-weight boundaries — split i takes
    * ranks (n·cumW_{i−1}/W, n·cumW_i/W], the last takes the remainder —
    * so per-stratum counts are EXACT (a plain hash split is only
    * stratified in expectation; at 8:1:1 a 40-doc language can easily
    * draw a 6-row validation set by luck). Integer weights make the
    * boundary arithmetic engine-exact: no 0.8+0.1 ≠ 0.9 IEEE trap
    * between the operator and an oracle.
    *
    * Scale shape: ranking inside a stratum is the X185/X191 bucket-carry
    * again — per-(key, md5-hex-bucket) counts, exclusive offsets over
    * ≤16 bucket rows per key, in-bucket row_number + offset — so a
    * 90%-one-language corpus ranks across 16 bounded tasks, never one
    * key-partition window; stratum sizes broadcast.
    *
    * @param splits (name, weight) in order; weights need not normalize
    * @return (idCol, keyCol, split)
    */
  def stratifiedSplit(df: DataFrame, keyCol: String, idCol: String,
      splits: Seq[(String, Long)], seed: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits need positive weights")
    require(splits.map(_._1).distinct.size == splits.size,
      "split names must be distinct")
    val w = splits.map(_._2).sum
    val cum = splits.scanLeft(0L) { case (acc, (_, wt)) => acc + wt }.tail
    val spark = df.sparkSession
    val base = df.select(col(keyCol), col(idCol))
      .withColumn("_ord", md5(concat(lit(s"$seed:"), col(idCol).cast("string"))))
      .withColumn("_b", substring(col("_ord"), 1, 1))
    import org.apache.spark.sql.expressions.Window
    val wOff = Window.partitionBy(col(keyCol)).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offDf = base.groupBy(col(keyCol), col("_b"))
      .agg(count(lit(1)).as("_bn"))
      .withColumn("_off", coalesce(sum("_bn").over(wOff), lit(0L)))
    val sizes = broadcast(df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("_n")))
    val wIn = Window.partitionBy(col(keyCol), col("_b"))
      .orderBy(col("_ord"), col(idCol))
    val ranked = base.join(offDf.select(col(keyCol), col("_b"), col("_off")),
        Seq(keyCol, "_b"))
      .withColumn("_rk", col("_off") + row_number().over(wIn))
      .join(sizes, Seq(keyCol))
    // boundary_i = floor(n·cumW_i / W) — the product is far below 2^53,
    // so the double division is exact and floor() matches any engine's
    // integer division; the last split takes everything left, so the
    // union is exactly the stratum
    val splitCol = splits.zip(cum).init.foldRight(
        lit(splits.last._1): Column) { case (((name, _), c), rest) =>
      when(col("_rk") <= floor(col("_n") * c / w), name).otherwise(rest)
    }
    ranked.select(col(idCol), col(keyCol), splitCol.as("split"))
  }

  /** DoReMi domain reweighting (Xie et al. 2023, "DoReMi: Optimizing
    * Data Mixtures Speeds Up Language Model Pretraining"): fold the
    * Group-DRO exponentiated-gradient update over a per-(step, domain)
    * excess-loss table — λ_t ∝ λ_{t-1} ⊙ exp(η · excess_t), final
    * weights = the step-average of λ smoothed with uniform
    * ((1−s)·avg + s/k) — and return the domain weights a mixture then
    * realizes via [[mixtureAllocation]]/[[applyMixture]].
    *
    * Scale shape: the per-(step, domain) excess means are a map-side-
    * combined aggregate over however many loss rows the proxy run
    * logged; the EG fold itself is inherently SEQUENTIAL over steps, so
    * it runs on the driver over the collected steps × domains matrix —
    * metadata scale (checkpoints × domains, thousands of doubles), the
    * same driver-arithmetic contract as [[unimaxPlan]]. Weights export
    * as oracle literals.
    */
  def doremiWeights(losses: DataFrame, stepCol: String, domainCol: String,
      excessCol: String, eta: Double = 1.0,
      smoothing: Double = 1e-3): Seq[(String, Double)] = {
    require(eta > 0, "eta must be positive")
    require(smoothing >= 0 && smoothing < 1, s"smoothing in [0,1): $smoothing")
    val rows: Array[(Long, String, Double)] = losses
      .groupBy(col(stepCol).cast("long").as("_t"), col(domainCol).as("_d"))
      .agg(avg(col(excessCol).cast("double")).as("_x"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    require(rows.nonEmpty, "doremiWeights needs at least one loss row")
    val domains = rows.map(_._2).distinct.sorted
    val k = domains.length
    val bySteps = rows.groupBy(_._1).toSeq.sortBy(_._1)
    var lambda = domains.map(_ => 1.0 / k)
    val acc = Array.fill(k)(0.0)
    bySteps.foreach { case (_, stepRows) =>
      val ex = stepRows.map(r => r._2 -> r._3).toMap
      // excess clipped at 0 per the paper (a domain already below the
      // reference never gains weight from the update)
      val bumped = domains.zip(lambda).map { case (d, w) =>
        w * math.exp(eta * math.max(0.0, ex.getOrElse(d, 0.0)))
      }
      val z = bumped.sum
      lambda = bumped.map(_ / z)
      lambda.zipWithIndex.foreach { case (w, i) => acc(i) += w }
    }
    val meanLambda = acc.map(_ / bySteps.length)
    domains.zip(meanLambda.map(a => (1 - smoothing) * a + smoothing / k)).toSeq
  }

  /** UniMax sampling (Chung et al. 2023, "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): distribute a token budget as UNIFORMLY as possible
    * across keys (languages/domains), capped at `maxEpochs` passes over
    * any key's corpus — the published alternative to temperature mixing
    * that never over-repeats a low-resource key. Allocation is the
    * canonical waterfill: keys ascending by their cap
    * (floor(maxEpochs × capacity), integer arithmetic throughout so the
    * plan is engine-exact); each takes min(cap, remaining / keysLeft).
    *
    * The allocation MATERIALIZES like [[applyMixture]]: every doc of a
    * key repeats floor(alloc / capacity) full epochs, and the md5-least
    * docs fill the remainder as one partial epoch (inclusive-cumsum
    * ≤ remainder, the [[selectUnderTokenBudget]] rule).
    *
    * Scale shape: capacities are a map-side-combined nKeys-row
    * aggregate; the waterfill is driver arithmetic over those rows
    * (exported as oracle literals); the per-key running token sum uses
    * the md5-PREFIX bucket trick — bucket = first hex char of the order
    * key, so bucket order IS order-prefix order — giving a two-pass
    * carry exactly like [[graft.operators.Temporal.bucketedRunningLast]]:
    * no window ever partitions by the bare key, so a 90%-English corpus
    * cumsums across 16 bounded tasks, not one.
    *
    * @return (idCol, keyCol, copy) — one row per materialized copy
    */
  def unimaxSample(df: DataFrame, keyCol: String, idCol: String,
      tokensCol: Column, budgetTokens: Long, maxEpochs: Double = 4.0,
      seed: String = "unimax"): DataFrame = {
    val alloc = unimaxPlan(df, keyCol, tokensCol, budgetTokens, maxEpochs)
    val spark = df.sparkSession
    import spark.implicits._
    val allocDf = broadcast(alloc.map { case (k, _, full, rem) => (k, full, rem) }
      .toDF(keyCol, "_full", "_rem"))
    val tk = df.select(col(keyCol), col(idCol),
        tokensCol.cast("long").as("_tok"))
      .withColumn("_ord", md5(concat(lit(s"$seed:"), col(idCol).cast("string"))))
      .withColumn("_b", substring(col("_ord"), 1, 1))
    // two-pass per-key prefix sum: per-(key, hex-bucket) totals, exclusive
    // offsets over the ≤16 bucket rows per key, in-bucket running sum
    import org.apache.spark.sql.expressions.Window
    val wOff = Window.partitionBy(col(keyCol)).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offDf = tk.groupBy(col(keyCol), col("_b"))
      .agg(sum(col("_tok")).as("_bsum"))
      .withColumn("_off", coalesce(sum("_bsum").over(wOff), lit(0L)))
      .drop("_bsum")
    val wIn = Window.partitionBy(col(keyCol), col("_b"))
      .orderBy(col("_ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tk.join(offDf, Seq(keyCol, "_b"))
      .withColumn("_cum", col("_off") + sum(col("_tok")).over(wIn))
      .join(allocDf, Seq(keyCol))
      .withColumn("_copies", col("_full") +
        when(col("_rem") > 0L && col("_cum") <= col("_rem"), 1L)
          .otherwise(0L))
      .withColumn("copy", explode(when(col("_copies") >= 1L,
        sequence(lit(1L), col("_copies")))
        .otherwise(array().cast("array<bigint>"))))
      .select(col(idCol), col(keyCol), col("copy"))
  }

  /** The UniMax waterfill over driver-collected capacities:
    * (key, capacityTokens, fullEpochs, remainderTokens) per key —
    * integer arithmetic only, so any engine replays it from the
    * exported constants.
    */
  private[graft] def unimaxPlan(df: DataFrame, keyCol: String,
      tokensCol: Column, budgetTokens: Long,
      maxEpochs: Double): Seq[(String, Long, Long, Long)] = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(maxEpochs > 0, "maxEpochs must be positive")
    val raw = df.groupBy(col(keyCol))
      .agg(sum(tokensCol.cast("long")).as("_cap")).collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) 0L else r.getLong(1)))
    // zero-capacity keys (all-null/empty token sums) allocate 0 — they
    // can't enter the waterfill, whose give/cap arithmetic divides by cap
    val zeros = raw.collect { case (k, cap) if cap <= 0L => (k, 0L, 0L, 0L) }
    val caps = raw.filter(_._2 > 0L)
      .sortBy { case (k, cap) => (math.floor(maxEpochs * cap).toLong, k) }
    var remaining = budgetTokens
    var left = caps.length
    caps.map { case (k, cap) =>
      val capLim = math.floor(maxEpochs * cap).toLong
      val give = math.min(capLim, if (left > 0) remaining / left else 0L)
      remaining -= give
      left -= 1
      (k, cap, give / cap, give % cap)
    }.toSeq.++(zeros).sortBy(_._1)
  }

  /** Cluster-balanced diversity sampling (the DataComp/SemDeDup
    * diversification step): k-means the embedding space, then draw
    * per-cluster quotas proportional to |cluster|^alpha — alpha = 1
    * reproduces the corpus distribution, alpha = 0 samples clusters
    * uniformly (maximum diversity), 0.5 is the usual sub-linear
    * compromise that up-weights rare modes without drowning the head.
    * Quotas are ceil'd and every non-empty cluster gets >= 1, so the
    * draw can exceed `total` by at most nCells - 1 (the contract a
    * "cover every mode" sample wants).
    *
    * Within a cluster the picks are the md5-least ids — a pure function
    * of the id that any engine replays row for row (same convention as
    * [[deterministicShuffle]]).
    *
    * Scale shape: assignment is row-local after the centroid broadcast
    * ([[Similarity.kmeansAssign]]); cluster sizes are a map-side-combined
    * nCells-row aggregate; quotas are driver arithmetic over those
    * nCells rows (exported as literals for the oracle, like the
    * codebook); the per-cluster rank caps at the max quota FIRST — a
    * constant bound the optimizer turns into a WindowGroupLimit partial
    * top-k — before the exact per-cluster quota join. Cluster size skew
    * is governed by nCells, the same knob as semanticDedup.
    *
    * @return (idCol, cluster_id, pick_rank) — quota-surviving rows only
    */
  def clusterBalancedSample(df: DataFrame, idCol: String, vecCol: String,
      total: Long, alpha: Double = 0.5, nCells: Int = 8, iters: Int = 5,
      seed: Int = 42): DataFrame = {
    require(total > 0, "total must be positive")
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha in [0,1], got $alpha")
    val spark = df.sparkSession
    val assigned = Similarity.kmeansAssign(df, idCol, vecCol,
        k = nCells, iters = iters, seed = seed)
      .select(col(idCol), col("cluster_id"))
    val quotas = clusterQuotas(assigned, total, alpha)
    val maxQuota = quotas.map(_._2).max
    import spark.implicits._
    val quotaDf = broadcast(quotas.toDF("cluster_id", "_quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("_ord"), col(idCol))
    assigned
      .withColumn("_ord", md5(concat(lit("div:"), col(idCol).cast("string"))))
      .withColumn("pick_rank", row_number().over(w))
      // constant cap first: WindowGroupLimit prunes losers before the
      // exact quota join ever sees them
      .filter(col("pick_rank") <= lit(maxQuota))
      .join(quotaDf, "cluster_id")
      .filter(col("pick_rank") <= col("_quota"))
      .select(col(idCol), col("cluster_id"),
        col("pick_rank").cast("long").as("pick_rank"))
  }

  /** Driver-side per-cluster quotas: ceil(total * n^alpha / Σ n^alpha),
    * floor 1 per non-empty cluster — nCells rows of arithmetic, exported
    * as oracle literals by the caller.
    */
  private[graft] def clusterQuotas(assigned: DataFrame, total: Long,
      alpha: Double): Seq[(Long, Long)] = {
    val sizes = assigned.groupBy("cluster_id").count().collect()
      .map(r => (r.getAs[Number]("cluster_id").longValue, r.getLong(1)))
      .sortBy(_._1)
    val weights = sizes.map { case (c, n) => (c, math.pow(n.toDouble, alpha)) }
    val wSum = weights.map(_._2).sum
    weights.map { case (c, wgt) =>
      c -> math.max(1L, math.ceil(total * wgt / wSum).toLong)
    }.toSeq
  }
}
