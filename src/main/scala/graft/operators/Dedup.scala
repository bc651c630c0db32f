package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (the whole point — these must survive 100 TB):
  *  - Exact dedup shuffles a 128-bit digest, not the document body, and
  *    keeps one winner per group with a deterministic min(id) rule.
  *  - Pairwise similarity NEVER does a cross join. Candidate pairs come
  *    from an inverted-index equi-join (shared shingle / LSH band bucket /
  *    SimHash chunk) — Spark executes these as shuffle hash joins
  *    partitioned by the blocking key, so work is proportional to the
  *    number of colliding pairs, not |docs|².
  *  - Hot blocking keys (a shingle shared by millions of docs) are the skew
  *    risk; `maxDocFreq` drops keys above a document-frequency cutoff the
  *    same way search engines drop stop-shingles. AQE skew-join handles the
  *    residual imbalance.
  */
object Dedup {

  /** Operator caches that must OUTLIVE the operator call: the shingle
    * frames and the partitioned postings below live inside the returned
    * lazy DataFrame (they are what lets both self-join arms and repeated
    * actions reuse one computation), so the operator cannot scope them
    * with the try/finally-unpersist idiom the driver-terminal operators
    * use ([[connectedComponents]], [[Similarity.trainCentroids]],
    * [[Regression.logisticFit]]). They are tracked here instead; a
    * long-lived session calls [[releasePersistedIndexes]] once it is done
    * with the returned frames (idempotent; safe while nothing is
    * consuming them). Without a release call each DISTINCT input plan
    * pins one MEMORY_AND_DISK entry for the session lifetime —
    * re-invocations on the same input reuse the existing entry (Spark's
    * CacheManager keys on the canonicalized plan), so steady-state reuse
    * costs one entry, not one per call.
    */
  private val persistedIndexes =
    new scala.collection.mutable.ArrayBuffer[DataFrame]()

  private def trackPersist(df: DataFrame,
      level: org.apache.spark.storage.StorageLevel): DataFrame = {
    val p = df.persist(level)
    persistedIndexes.synchronized { persistedIndexes += p }
    p
  }

  /** Unpersist every index cache produced by [[ngramJaccardPairs]] /
    * [[minHashLshPairs]] so far and clear the registry. Callers invoke
    * this once the returned pair frames are fully consumed; consuming
    * them again afterwards recomputes (correct, just uncached).
    *
    * @return how many tracked caches were released
    */
  def releasePersistedIndexes(): Int = {
    val toFree = persistedIndexes.synchronized {
      val snapshot = persistedIndexes.toList
      persistedIndexes.clear()
      snapshot
    }
    toFree.foreach(df => df.unpersist(blocking = false))
    toFree.size
  }

  /** Exact dedup over `keyCols` (all columns when empty): group on a
    * 128-bit digest of the key, keep the row with the smallest `idCol`.
    * Deterministic winner (unlike `dropDuplicates`, whose survivor is
    * partition-order dependent — unacceptable for reproducible pipelines).
    *
    * The `row_number().over(partitionBy(digest))` window here is safe
    * where the token/shingle document-frequency windows (since replaced
    * by groupBy+join — see [[ngramJaccardPairs]] and
    * [[TextAnalysis.tfIdfTopTerms]]) were not: a window partition here is
    * one DUPLICATE CLUSTER — rows that are byte-identical on the key.
    * Web-scale corpora have heavy-tailed token frequencies (one stopword
    * in 10^8 docs) but NOT 10^8 byte-identical copies of one document;
    * exact-duplicate cluster sizes are bounded by crawl redundancy
    * (typically << 10^4), so no single window-partition task can become
    * the job. Keep this distinction when adding operators: window over a
    * CONTENT-derived key with heavy-tailed frequency = scale-killer;
    * window over an identity-cluster key with bounded multiplicity = fine.
    */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String] = Seq.empty): DataFrame = {
    val keys = if (keyCols.nonEmpty) keyCols else df.columns.filterNot(_ == idCol).toSeq
    val digest = md5(to_json(struct(keys.map(col): _*)).cast("binary"))
    val w = Window.partitionBy(digest).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Default document-frequency cap for shingle blocking keys in auto
    * mode: bounds any single shingle's self-join contribution to
    * cap^2/2 ~= 5*10^5 pairs — bounded work per key no matter how
    * pathological the boilerplate.
    */
  val DefaultMaxDocFreq: Long = 1024L

  /** Certified upper bound on the hottest blocking key's document
    * frequency from a Count-Min pre-pass: `est >= true` holds for every
    * key, so `min over hash rows of (max bucket count)` bounds the max
    * df of ANY key. One pass over the postings into d x w bounded state;
    * the returned scalar is a plan-time decision input (same class as
    * the UniMax waterfill constants), not a hot-path collect.
    */
  private[graft] def estMaxDocFreq(postings: DataFrame): Long = {
    val first = postings.columns.head
    val sk = Sketches.cmsSketch(postings, col(first), d = 4, w = 1 << 16)
    val r = sk.groupBy("row").agg(max("cnt").as("_m"))
      .agg(min(col("_m")).as("_b")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** (id, shingleArray) with distinct word n-gram shingles per doc. */
  private[graft] def shingled(df: DataFrame, idCol: String, textCol: String, n: Int) =
    df.select(col(idCol).as("_id"),
      TextAnalysis.shingles(TextAnalysis.tokens(col(textCol)), n).as("_sh"))

  /** All pairs (a < b) with n-gram Jaccard >= `threshold`, via an inverted
    * shingle index: explode -> equi-join on shingle -> per-pair intersection
    * count -> |A∪B| from per-doc set sizes. Exact (100% recall) — the
    * blocking key IS the similarity evidence, so no candidate is missed.
    *
    * @param maxDocFreq drop shingles occurring in more docs than this.
    *        0 (the default) = AUTO: a Count-Min pre-pass over the shingle
    *        stream ([[Sketches.cmsSketch]]) upper-bounds the hottest
    *        shingle's document frequency — when even that certified bound
    *        stays under [[DefaultMaxDocFreq]] no key can explode the
    *        self-join and the guard is provably redundant (plan unchanged);
    *        otherwise the default cap engages. Pass a positive value for
    *        an explicit cap, or a NEGATIVE value to run unbounded (scale-
    *        unsafe: one df-10^6 boilerplate shingle contributes 5*10^11
    *        pairs — only for corpora known free of hot shingles).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8, maxDocFreq: Long = 0L): DataFrame = {
    // cached: the inverted index feeds BOTH sides of the self-join below
    // (and the doc-frequency guard when enabled) — without the cache the
    // shingling recomputes per consumer, a measured 7x on the pair stage.
    // Registered in [[persistedIndexes]] (see the release contract there).
    val sh = trackPersist(shingled(df, idCol, textCol, n),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // set size rides along the inverted index (8 bytes/row), so |A| and
    // |B| fall out of the pair aggregation itself — no size-lookup joins.
    // The index keys are 64-bit shingle hashes, not the strings: narrower
    // shuffle rows and long-key joins (a further ~30% on the self-join).
    // A cross-doc hash collision would inflate one intersection count by
    // 1; at 2^-64 per pair that is negligible against an 0.8 threshold
    // even at 10^9 distinct shingles.
    val inv0 = sh.select(col("_id"), size(col("_sh")).as("_n"),
        explode(col("_sh")).as("_s0"))
      .select(col("_id"), col("_n"), xxhash64(col("_s0")).as("_s"))
    // singleton shingles (document frequency 1 — the vast majority in a
    // real corpus) can never produce a pair but would dominate the
    // self-join's shuffle volume. The document frequency is a
    // map-side-combined groupBy(_s).count re-attached by left_semi
    // equi-join — NOT a window aggregate: a boilerplate shingle shared
    // by 10^7 docs would land its every posting in ONE window-partition
    // task (windows can't be split by AQE), while the groupBy's partial
    // aggregate sends one row per map task per hot key, and AQE's
    // skew-join split owns any hot probe partition of the semi-join.
    // shuffle_hash pins the (corpus-dependent, possibly huge) kept-key
    // set as a hash build — already partitioned on _s by its aggregate,
    // so that side needs no extra exchange — instead of a broadcast.
    // The upper maxDocFreq guard rides the same count. AUTO applies the
    // default cap UNCONDITIONALLY: the aggregate computes every key's
    // EXACT df anyway, and the `_df <= cap` predicate only drops keys
    // whose actual df exceeds the cap — on a clean corpus it is a no-op
    // (output row-for-row identical to unbounded, Round14Spec pins it),
    // on a hot corpus it is exactly the protection wanted. The r13 CMS
    // certification pre-pass was measured at ~40% of the operator's wall
    // (a full extra postings pass) to avoid this FREE predicate — it
    // certified a plan identity the output never needed; the sketch
    // survives as [[estMaxDocFreq]] for callers sizing salts/caps.
    val cap: Long =
      if (maxDocFreq > 0L) maxDocFreq
      else if (maxDocFreq < 0L) 0L                        // explicit opt-out
      else DefaultMaxDocFreq
    val kept = inv0.groupBy("_s").agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= 2 &&
        (if (cap > 0L) col("_df") <= cap else lit(true)))
      .hint("shuffle_hash")
    // The surviving postings are materialized ONCE, hash-partitioned on
    // the join key: without this, the self-join's two arms each re-ran
    // the explode+hash and the df semi-join (r14 stage capture: the
    // 260k-posting explode stage and the df-aggregate stage both
    // executed twice — AQE's exchange reuse does not fire across the
    // arms), and each arm paid its own exchange. The fixed-width
    // repartition is recorded in the cached plan's output partitioning,
    // so the self-join consumes BOTH arms exchange-free. Postings are
    // (8+8+8) B/row; released via [[releasePersistedIndexes]].
    val inv = trackPersist(
      inv0.join(kept, Seq("_s"), "left_semi")
        .repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
          col("_s")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    inv.as("x").join(inv.as("y"),
        col("x._s") === col("y._s") && col("x._id") < col("y._id"))
      .groupBy(col("x._id").as("a"), col("y._id").as("b"))
      .agg(count(lit(1)).as("_i"),
        first(col("x._n")).as("_na"), first(col("y._n")).as("_nb"))
      .withColumn("jaccard", col("_i") / (col("_na") + col("_nb") - col("_i")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash signature: for each of `numHashes` hash functions, the min
    * xxhash64 over the doc's shingles. Pure column algebra (transform over
    * a hash-index sequence) — one pass, no shuffle.
    */
  def minHashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleCol, s => xxhash64(s, i))))

  /** MinHash + banded LSH near-dup pairs. Signature of `numHashes` minima
    * split into `bands`; docs sharing any band bucket become candidates
    * (equi-join on (band, bucketHash) — never a cross join); candidates are
    * then verified with EXACT shingle-set Jaccard, so precision is 1.0 and
    * only recall depends on the LSH parameters.
    */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // shingle sets carried as 64-bit hashes end to end: the signature,
    // band join, AND the exact-Jaccard verify all operate on long arrays
    // (8 B/element vs ~25 B strings; array_intersect on longs). Set
    // cardinalities are collision-exact to ~2^-64 per pair.
    // registered in [[persistedIndexes]] (see the release contract there)
    val sh = trackPersist(
      shingled(df, idCol, textCol, n)
        .select(col("_id"), transform(col("_sh"), s => xxhash64(s)).as("_sh")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // signature minima via explode + partial aggregation: the combine
    // happens map-side and the shuffle MATERIALIZES the 64 minima — without
    // this barrier, projection collapse would inline the whole signature
    // expression into each of the 16 band expressions (16x recompute), and
    // at scale the agg shape moves 64 longs/doc instead of re-reading text.
    // All numHashes minima live in ONE MinHashAgg buffer (bit-identical to
    // numHashes separate min(xxhash64(_s, i)) aggregates, which hash every
    // shingle 64x into 64 buffers — measured ~2x slower).
    import org.apache.spark.sql.graftshim.ColumnShim
    val tok = sh.select(col("_id"), explode(col("_sh")).as("_s"))
    val sigAgg = ColumnShim.column(
      graft.functions.MinHashAgg(ColumnShim.expression(col("_s")), numHashes)
        .toAggregateExpression())
    val sig = tok.groupBy("_id").agg(sigAgg.as("_sig"))
    // banded index and self-join stay NARROW (id, band, bucket); shingle
    // arrays are re-attached per candidate pair afterwards
    // NB: a singleton-bucket window filter (as in the inverted index
    // above) was MEASURED SLOWER here — band rows are fixed at
    // bands/doc and already narrow, so the per-partition window sort
    // costs more than the join probe it saves
    val banded = sig.select(col("_id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64((b * rows until (b + 1) * rows).map(i =>
          element_at(col("_sig"), i + 1)): _*)): _*)))
      .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_bucket")
    val cand = banded.as("x").join(banded.as("y"),
        col("x._band") === col("y._band") && col("x._bucket") === col("y._bucket") &&
          col("x._id") < col("y._id"))
      .select(col("x._id").as("a"), col("y._id").as("b"))
      .dropDuplicates("a", "b")
    cand
      .join(sh.select(col("_id").as("a"), col("_sh").as("_sha")), "a")
      .join(sh.select(col("_id").as("b"), col("_sh").as("_shb")), "b")
      .withColumn("_i", size(array_intersect(col("_sha"), col("_shb"))).cast("long"))
      .withColumn("jaccard",
        col("_i") / (size(col("_sha")) + size(col("_shb")) - col("_i")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Paragraph-granularity MinHash near-dup — the RefinedWeb dedup step
    * between X3's whole-document and X61's k-token-window granularities:
    * documents split on blank lines, every paragraph signed and banded
    * exactly like a document (the [[minHashLshPairs]] machinery over a
    * `(doc, para)` struct id), so boilerplate paragraphs pair across AND
    * inside documents while unique prose survives.
    *
    * Scale shape inherits X3's: paragraph count replaces doc count; the
    * explode is a row multiplier bounded by paragraphs-per-doc, the
    * signature aggregate stays map-side-combined on the struct key, and
    * the band self-join stays narrow. Pair order is (doc, para)
    * lexicographic, so intra-document duplicates emit with a_doc == b_doc.
    *
    * @return (a_doc, a_para, b_doc, b_para, jaccard) with exact-verified
    *         Jaccard >= `threshold` (candidates from banding, like X3)
    */
  def paragraphMinHashPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    val paras = df.select(col(idCol).as("_doc"),
        posexplode(split(col(textCol), "\n\\s*\n")))
      .select(struct(col("_doc").as("doc"), col("pos").as("para")).as("_pid"),
        trim(col("col")).as("_ptxt"))
      .filter(length(col("_ptxt")) > 0)
    minHashLshPairs(paras, "_pid", "_ptxt", n, numHashes, bands, threshold)
      .select(col("a.doc").as("a_doc"), col("a.para").as("a_para"),
        col("b.doc").as("b_doc"), col("b.para").as("b_para"), col("jaccard"))
  }

  /** SimHash over whitespace tokens: bit j is the sign of
    * Σ_tokens (bit j of tokenHash(token) ? +1 : -1). One shuffle on the
    * doc id; the per-doc bit counters live in a single custom
    * [[graft.functions.SimHashAgg]] buffer (long[numBits]) with map-side
    * partial aggregation — the shuffle moves one counter array per doc,
    * and the 60-wide sum(when(...)) column formulation this replaces
    * measured ~2x slower (60 separate aggregate buffers per row).
    *
    * @param tokenHash per-token 64-bit hash; default xxhash64 (fastest).
    *        A cross-engine-reproducible alternative (md5-derived) lets an
    *        external SQL engine compute identical signatures for oracles.
    * @param numBits   signature width; bits above the hash's entropy are
    *        wasted, so pass <= the hash's usable bit count.
    */
  def simHash(df: DataFrame, idCol: String, textCol: String,
      numBits: Int = 64,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    require(numBits >= 1 && numBits <= 64, s"numBits must be in [1,64]: $numBits")
    import org.apache.spark.sql.graftshim.ColumnShim
    val tok = Par.spread(df.select(col(idCol), col(textCol)), idCol)
      .select(col(idCol).as("_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("_t"))
      .withColumn("_h", tokenHash(col("_t")))
    val sig = ColumnShim.column(
      graft.functions.SimHashAgg(ColumnShim.expression(col("_h")), numBits)
        .toAggregateExpression())
    tok.groupBy("_id").agg(sig.as("simhash"))
  }

  /** Connected components over an undirected pair list — the step that
    * turns PAIRWISE near-dup evidence (q20/q21/q22/q25 output) into
    * dedup CLUSTERS with one canonical representative each.
    *
    * Algorithm: alternating large-star / small-star contraction (the
    * published MapReduce connected-components formulation — Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14), chosen
    * over 1-hop min-label propagation because its round count is
    * O(log² n) regardless of component DIAMETER — a 10^6-long duplication
    * chain converges in ~20 rounds, not 10^6. Each round is two
    * shuffle aggregations over the edge list (no driver-side graph);
    * `localCheckpoint` truncates lineage so plans stay flat across rounds.
    *
    *  - large-star: every neighbor LARGER than u re-points at u's minimum
    *    neighbor (strictly decreases big-node eccentricity).
    *  - small-star: u and all its smaller neighbors point at their
    *    collective minimum (flattens local stars).
    *
    * Returns (node, component): component = smallest node id in the
    * node's component. Nodes appearing in no pair are absent (callers
    * treat them as their own singleton cluster).
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "a",
      bCol: String = "b", maxRounds: Int = 32,
      smallGraphEdges: Long = 1L << 20): DataFrame = {
    // the pair evidence is usually an expensive pipeline (a near-dup
    // self-join); persist it so the node list and round 0 share ONE
    // computation instead of re-running it per consumer
    val p = pairs.select(col(aCol).cast("long").as("_x"), col(bCol).cast("long").as("_y"))
      .persist()
    // one pass over the cached pair list (explode), not two unioned scans
    // — halves the task count of the node-list stage for free
    val nodes = p.select(explode(array(col("_x"), col("_y"))).as("id"))
      .distinct()
    // each round references its input many times (symmetrization, min
    // join), so the LOGICAL plan would grow exponentially across rounds:
    // localCheckpoint both truncates lineage and materializes the round.
    // The convergence signature rides the SAME materialization job as an
    // observed metric — a separate agg job per round would double the
    // round's job count for data the checkpoint already scanned. xor-fold
    // is order-independent and overflow-free (ANSI sum() of 2^63-scale
    // hashes overflows); edges are distinct, so no pair self-cancels.
    def checkpointWithSig(df: DataFrame): (DataFrame, (Long, Long)) = {
      val obs = org.apache.spark.sql.Observation()
      val ck = df.observe(obs, count(lit(1)).as("n"),
          coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("x"))
        .localCheckpoint()
      val m = obs.get
      (ck, (m("n").asInstanceOf[Long], m("x").asInstanceOf[Long]))
    }

    var (e, sig) = checkpointWithSig(p
      .filter(col("_x") =!= col("_y"))
      .select(greatest(col("_x"), col("_y")).as("u"), least(col("_x"), col("_y")).as("v"))
      .distinct())
    // SMALL-GRAPH FAST PATH: the canonical edge count is already known
    // driver-side (it rode the materialization job as an observed
    // metric, so the check costs nothing). Below `smallGraphEdges` the
    // alternating-star machinery is pure scheduler overhead — each round
    // is several synchronous jobs moving kilobytes — while a driver
    // union-find over ≤2^20 16-byte canonical edges is a ≤16 MB,
    // tens-of-ms fold. Anything larger takes the distributed rounds
    // unchanged; the threshold is explicit and conservative against
    // driver heap, and both paths produce the identical
    // (node, min-of-component) labeling (Round11Spec pins equality).
    // The node labeling itself stays DISTRIBUTED (broadcast join): the
    // node list is not bounded by the edge count (self-pair-only inputs
    // have nodes without canonical edges), so only edges ever collect.
    if (sig._1 > 0 && sig._1 <= smallGraphEdges) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val edges = e.select(col("u"), col("v")).as[(Long, Long)].collect()
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x0: Long): Long = {
        var x = x0
        while (parent.contains(x)) x = parent(x)
        var y = x0 // path compression
        while (parent.contains(y)) { val n = parent(y); parent(y) = x; y = n }
        x
      }
      // union-by-min: the smaller root becomes the parent, so every
      // set's root IS its minimum — the distributed fixpoint's label
      edges.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val labelDf = broadcast(
        edges.iterator.flatMap(t => Iterator(t._1, t._2)).toArray.distinct
          .map(n => (n, find(n))).toSeq.toDF("u", "v"))
      val labels = nodes.join(labelDf, nodes("id") === labelDf("u"), "left")
        .select(nodes("id").as("node"),
          coalesce(labelDf("v"), nodes("id")).as("component"))
        .localCheckpoint()
      p.unpersist(blocking = false)
      return labels
    }
    var round = 0
    var converged = sig._1 == 0L
    while (!converged && round < maxRounds) {
      // Each star step needs min(neighbors(u)) attached back to every edge
      // of u. A window over partitionBy(u) is ONE shuffle but puts a
      // celebrity node's whole neighborhood (10^8 edges for a boilerplate
      // near-dup cluster) into ONE task — windows cannot be split by AQE.
      // groupBy(u).min is skew-immune (map-side partial aggregation: the
      // reduce side sees one partial row per map partition, not one row
      // per edge) and the equi-join that re-attaches the min is
      // AQE-skew-join-splittable. That is the shape that survives 100 TB;
      // the saved window shuffle was never the bottleneck — the hot task
      // was.
      // large-star over symmetric neighborhoods: every neighbor LARGER
      // than u re-points at u's minimum neighbor (or u itself)
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val minsL = sym.groupBy("u").agg(min(col("v")).as("_mv"))
      // large is consumed TWICE below (small-star's aggregate and its
      // re-attach probe), and the two consumers' exchanges cannot
      // canonically match (partial-agg child vs raw child), so without a
      // cut the large-star join would execute twice per round. A LAZY
      // persist makes both consumers read one InMemoryRelation — computed
      // inside the round's existing job, unlike an eager localCheckpoint,
      // which costs a whole extra synchronous job per round (the r8→r9
      // q59 regression). Lineage stays bounded: the round boundary below
      // checkpoints `small`, so `large` never nests across rounds.
      val large = sym.join(minsL, "u")
        .withColumn("_m", least(col("_mv"), col("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("_m").as("v"))
        .filter(col("u") =!= col("v"))
        .persist()
      // small-star over the (u > v)-oriented result: u and its smaller
      // neighbors all re-point at their collective minimum. The (u, min)
      // arm comes straight from the aggregate — one row per node instead
      // of one per edge, shrinking the pre-distinct union.
      val minsS = large.groupBy("u").agg(min(col("v")).as("_m"))
      val small = large.join(minsS, "u")
        .select(col("v").as("u"), col("_m").as("v"))
        .union(minsS.select(col("u"), col("_m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
      val (ck, nextSig) = checkpointWithSig(small)
      large.unpersist(blocking = false)
      converged = nextSig == sig
      sig = nextSig
      e = ck
      round += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(s"CC round=$round edges=${nextSig._1} converged=$converged")
    }
    // wrong labels are worse than no labels: a maxRounds bailout would
    // silently return PARTIALLY merged components (and duplicate rows per
    // node) indistinguishable from a real answer
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds " +
          s"(edge signature still changing at ${sig._1} edges); raise maxRounds")
    // at the fixpoint every edge points a node straight at its component
    // minimum; minima themselves carry no outgoing edge. localCheckpoint
    // (cheap: one row per paired node) pins the result so the pairs cache
    // can be released before returning.
    val labels = nodes.join(e, nodes("id") === e("u"), "left")
      .select(nodes("id").as("node"), coalesce(e("v"), nodes("id")).as("component"))
      .localCheckpoint()
    p.unpersist(blocking = false)
    labels
  }

  /** Near-dup pairs with Hamming distance <= `maxHamming` between SimHashes.
    * Pigeonhole blocking: split `numBits` bits into (maxHamming+1) chunks —
    * any pair within the budget agrees on >= 1 chunk, so an equi-join on
    * (chunkIdx, chunkValue) has 100% recall; verify with bit_count(a^b).
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, numBits: Int = 64,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    val chunks = maxHamming + 1
    val width = numBits / chunks
    require(width >= 1, s"numBits=$numBits too narrow for maxHamming=$maxHamming")
    val sims = simHash(df, idCol, textCol, numBits, tokenHash)
    val chunked = sims.select(col("_id"), col("simhash"),
      posexplode(array((0 until chunks).map(c =>
        shiftrightunsigned(col("simhash"), c * width)
          .bitwiseAND(lit((1L << width) - 1))): _*)))
      .withColumnRenamed("pos", "_c").withColumnRenamed("col", "_v")
    chunked.as("x").join(chunked.as("y"),
        col("x._c") === col("y._c") && col("x._v") === col("y._v") &&
          col("x._id") < col("y._id"))
      .select(col("x._id").as("a"), col("y._id").as("b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .dropDuplicates("a", "b")
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------------------
  // Cross-batch incremental near-dup: a PERSISTED MinHash signature
  // store. A continuously-crawled corpus can't re-shingle history on
  // every batch — the store keeps each document's signature
  // (numHashes × 8 B, ~512 B/doc: 10⁹ docs fit in ~0.5 TB vs the
  // corpus's 100 TB of text), and each new batch dedups against it
  // with a broadcast of the BATCH side only. The store is a Delta
  // table, so the whole loop is transactional: the match scan pins a
  // snapshot, the signature append is one atomic commit, and a
  // concurrent batch's commit rebases instead of corrupting.
  // ------------------------------------------------------------------

  /** Engine-portable MinHash signatures over trigram shingles: component
    * i is `min over shingles s of md5_prefix60(i || ':' || s)` — the same
    * md5-derived 60-bit hash as [[graft.operators.Sampling.idHash]], so
    * any SQL engine reproduces the signatures bit-for-bit (DuckDB:
    * `min(('0x' || substr(md5(i || ':' || s), 1, 15))::BIGINT)`).
    *
    * Shape: explode the shingles, project the numHashes per-shingle
    * hashes in ONE codegen'd pass (Md5Prefix60 has doGenCode), take
    * map-side-combined `min` aggregates, re-assemble the array. The
    * aggregation is a deliberate BARRIER — a pure column-algebra
    * formulation (transform/array_min over the shingle array) was
    * measured ~80x slower here, because projection collapse inlines the
    * whole signature expression into every one of the 16 band-key
    * expressions AND the match-fraction zip (17x recompute of every md5),
    * all in boxed HOF evaluation. Post-barrier, each doc's signature is
    * 64 materialized longs consumed as data.
    */
  private[graft] def sigOf(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnShim
    def md5p60(c: Column): Column = ColumnShim.column(
      graft.functions.Md5Prefix60(ColumnShim.expression(c.cast("binary"))))
    // a doc too short to shingle has no signature (an all-null sig
    // would land every such doc in one degenerate band bucket). The
    // guard is a TOKEN-COUNT filter, deliberately not
    // `size(shingles) > 0`: Catalyst pushes deterministic filters
    // through [[shingled]]'s spread exchange, and a shingle-expression
    // filter dragged the whole shingling pipeline down onto the
    // pre-exchange single-split scan task (measured: 1.5 s of one-task
    // time on the q151 bench)
    val guarded = Par.spread(df.select(col(idCol), col(textCol))
      .filter(size(split(lower(col(textCol)), " ")) >= n), idCol)
    // explode_outer, NOT explode: InferFiltersFromGenerate turns a plain
    // explode into a `size(_sh) > 0` filter that rewrites through the
    // shingle projection and pushes below the exchange — shingling every
    // doc a second time on the pre-exchange scan task (the very cost the
    // exchange exists to spread; measured 1.5 s of one-task time). The
    // outer variant infers nothing, and the token-count filter above
    // already guarantees non-empty shingle arrays.
    val tok = shingled(guarded, idCol, textCol, n)
      .select(col("_id").as("id"), explode_outer(col("_sh")).as("_s"))
    val comps = (0 until numHashes).map(i =>
      min(md5p60(concat(lit(s"$i:"), col("_s")))).as(s"_c$i"))
    tok.groupBy("id").agg(comps.head, comps.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"_c$i")): _*).as("sig"))
  }

  /** String band keys of a signature: band b = the comma-joined decimal
    * components [b·r, (b+1)·r). Strings (not a hash of the slice) so an
    * external engine's banding is trivially identical.
    */
  private[graft] def bandKeyArray(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map(b =>
      concat_ws(",", transform(slice(sig, b * rows + 1, rows),
        c => c.cast("string")))): _*)

  /** Create the signature store at `storeDir` from an initial corpus:
    * one `(id, sig)` row per document, with the shingle width and
    * signature length recorded as table properties so every later batch
    * provably hashes the same way (a mismatched batch fails loudly
    * instead of silently never matching).
    */
  def minHashStoreInit(spark: org.apache.spark.sql.SparkSession,
      storeDir: String, docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 64): graft.DeltaTable =
    graft.DeltaTable.forPath(storeDir)
      .write(sigOf(docs, idCol, textCol, n, numHashes))
      .setTableProperties(Map(
        "graft.minhash.n" -> n.toString,
        "graft.minhash.numHashes" -> numHashes.toString))

  /** Dedup a new batch against the signature store: banded-LSH candidates
    * (equi-join on (band, key) — the BATCH side broadcasts; the store is
    * only ever scanned, never shuffled), verified by the signature-match
    * fraction `est_jaccard` (the unbiased MinHash Jaccard estimate —
    * exact shingle verification is impossible against a store that
    * deliberately keeps no text). With `append=true` the batch's
    * signatures land in the store as one atomic commit; the match scan is
    * pinned to the PRE-append snapshot (Delta handles are snapshots), so
    * the result never self-matches the batch.
    *
    * Returns `(a = store id, b = batch id, est_jaccard)` for candidates
    * with `est_jaccard >= estThreshold`. Intra-batch duplicates are the
    * caller's [[minHashLshPairs]] — this op's contract is batch-vs-history.
    *
    * @param batchTxn optional `(appId, batchVersion)` idempotence marker
    *        for the append (delta's SetTransaction handshake, the same
    *        contract as the streaming sinks): a RE-DELIVERED batch — a
    *        crawl-loop retry, a foreachBatch replay — appends its
    *        signatures exactly once instead of silently duplicating
    *        store rows on every retry.
    */
  def minHashStoreDedup(spark: org.apache.spark.sql.SparkSession,
      storeDir: String, batch: DataFrame, idCol: String, textCol: String,
      bands: Int = 16, estThreshold: Double = 0.7,
      append: Boolean = false,
      batchTxn: Option[(String, Long)] = None): DataFrame = {
    val store = graft.DeltaTable.forPath(storeDir)
    val props = store.tableProperties
    val n = props.getOrElse("graft.minhash.n",
      throw new IllegalStateException(
        s"$storeDir is not a minhash store (no graft.minhash.n property)")).toInt
    val numHashes = props("graft.minhash.numHashes").toInt
    require(numHashes % bands == 0, s"bands=$bands must divide numHashes=$numHashes")
    val rows = numHashes / bands
    // batch signatures are computed twice (match + append) rather than
    // cached: the batch is small by this op's contract and a leaked
    // cache entry per call would outlive the operator
    val batchSig = sigOf(batch, idCol, textCol, n, numHashes)
    if (append) batchTxn match {
      case Some((appId, v)) => store.writeWithTxn(batchSig, appId, v)
      // a signature append is a BLIND append — concurrent crawl batches
      // never touch each other's files — so it retries through OCC
      // rebase instead of failing the whole batch on a commit race
      case None             => store.write(batchSig, maxRetries = 5)
    }

    val storeBands = store.toDF(spark).select(col("id").as("a"),
        col("sig").as("_siga"),
        posexplode(bandKeyArray(col("sig"), bands, rows)))
      .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_key")
    val batchBands = batchSig.select(col("id").as("b"), col("sig").as("_sigb"),
        posexplode(bandKeyArray(col("sig"), bands, rows)))
      .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_key")
    val matched = aggregate(
      zip_with(col("_siga"), col("_sigb"),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    storeBands.join(broadcast(batchBands), Seq("_band", "_key"))
      .dropDuplicates("a", "b")
      .withColumn("_est", matched / lit(numHashes.toDouble))
      .filter(col("_est") >= estThreshold)
      .select(col("a"), col("b"), round(col("_est"), 4).as("est_jaccard"))
  }

  // ------------------------------------------------------------------
  // EXACT-fingerprint store: the cheap sibling of the MinHash store
  // (CCNet-style cross-batch exact dedup). One md5 per document — 32
  // bytes of state standing in for the text — catches byte-identical
  // recrawls before any shingling runs.
  // ------------------------------------------------------------------

  /** Create the exact-fingerprint store: one `(id, fp = md5(text))` row
    * per document (hex md5 — trivially reproducible by any engine).
    */
  def exactStoreInit(storeDir: String, docs: DataFrame, idCol: String,
      textCol: String): graft.DeltaTable =
    graft.DeltaTable.forPath(storeDir)
      .write(fpOf(docs, idCol, textCol))
      .setTableProperties(Map("graft.exactstore" -> "md5"))

  private def fpOf(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), md5(col(textCol).cast("binary")).as("fp"))

  /** Exact matches of a new batch against the store: `(a = store id,
    * b = batch id, fp)` for byte-identical texts. The BATCH side
    * broadcasts (a crawl batch is small by contract); the store is only
    * ever scanned — never shuffled, never re-hashed. With `append=true`
    * the batch's fingerprints land as one atomic commit pinned AFTER the
    * match scan (the handle is a snapshot), idempotent under `batchTxn`
    * exactly like the MinHash store.
    */
  def exactStoreDedup(spark: org.apache.spark.sql.SparkSession,
      storeDir: String, batch: DataFrame, idCol: String, textCol: String,
      append: Boolean = false,
      batchTxn: Option[(String, Long)] = None): DataFrame = {
    val store = graft.DeltaTable.forPath(storeDir)
    require(store.tableProperties.contains("graft.exactstore"),
      s"$storeDir is not an exact-fingerprint store")
    val batchFp = fpOf(batch, idCol, textCol)
    if (append) batchTxn match {
      case Some((appId, v)) => store.writeWithTxn(batchFp, appId, v)
      case None             => store.write(batchFp, maxRetries = 5)
    }
    store.toDF(spark).select(col("id").as("a"), col("fp"))
      .join(broadcast(batchFp.select(col("id").as("b"), col("fp"))), Seq("fp"))
      .select(col("a"), col("b"), col("fp"))
  }
}
