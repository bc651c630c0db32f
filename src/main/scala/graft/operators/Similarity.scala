package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Vector-similarity operators over an embedding column (`array<float>`):
  * brute-force cosine top-k (the exact baseline) and an LSH-bucketed
  * approximate variant (the scale path).
  *
  * Scale design: the query set is broadcast (it is always the small side);
  * the corpus is never shuffled for brute force — each partition scores its
  * own vectors against the broadcast queries and a per-partition top-k
  * (window rank) limits what reaches the final shuffle. The LSH variant
  * replaces the corpus-wide scan with an equi-join on a 16-bit hyperplane
  * signature, touching only the matching bucket.
  *
  * All math is codegen'd higher-order functions (`zip_with`/`aggregate`)
  * in double precision — no UDFs.
  */
object Similarity {

  /** array<float> -> array<double> (scores must be reproducible doubles). */
  def toDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  def l2Norm(vec: Column): Column =
    sqrt(aggregate(vec, lit(0.0d), (acc, x) => acc + x * x))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Single-pass codegen'd cosine over raw float/double arrays — the
    * custom Catalyst Expression fast path. Identical doubles to
    * [[cosine]] over [[toDouble]]-cast inputs (same accumulation order).
    */
  def cosineFast(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.functions.CosineSimilarity(
        org.apache.spark.sql.graftshim.ColumnShim.expression(a),
        org.apache.spark.sql.graftshim.ColumnShim.expression(b)))

  /** Exact top-k cosine neighbors of each query vector.
    *
    * @param corpus  (idCol, vecCol) table — scanned once, never shuffled
    *                before the per-query rank
    * @param queries subset with the same columns; must be small (broadcast)
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // raw arrays + the single-pass custom Expression: no cast copies, no
    // zipped intermediates in the corpus × queries inner loop
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("_cos", cosineFast(col("_qv"), col("_cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("_cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("_cos"), 4).as("cos_sim"))
  }

  /** Deterministic random hyperplanes: `planes x dim`, components from a
    * fixed-seed RNG so signatures are reproducible across runs/engines.
    */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(planes, dim)(rng.nextGaussian())
  }

  /** Sign-random-projection signature: bit p set iff `vec . plane_p > 0`.
    * Backed by the codegen'd [[graft.functions.LshSignature]] Expression —
    * the plane matrix is a constant reference object and the whole
    * planes x dims loop runs inside whole-stage codegen (the HOF
    * formulation pays interpreted lambda dispatch per element, which
    * dominates the ANN blocking stage).
    */
  def lshSignature(vec: Column, planes: Array[Array[Double]]): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.functions.LshSignature(
        org.apache.spark.sql.graftshim.ColumnShim.expression(vec), planes))

  /** The HOF composition of the same signature (interpreted lambdas) —
    * kept as the cross-check oracle for the codegen'd Expression.
    */
  def lshSignatureHof(vec: Column, planes: Array[Array[Double]]): Column = {
    val planeLit = typedLit(planes.map(_.toSeq).toSeq)
    val bitLit = typedLit(planes.indices.map(i => 1L << i))
    val projections = transform(planeLit, p =>
      aggregate(zip_with(vec, p, (x, w) => x * w),
        lit(0.0d), (acc, x) => acc + coalesce(x, lit(0.0d))))
    val bits = zip_with(projections, bitLit,
      (proj, bit) => when(proj > 0, bit).otherwise(lit(0L)))
    aggregate(bits, lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** Embedding dimension probed from the first row (a one-row driver job;
    * negligible next to the join it parameterizes). Fails fast on an empty
    * input or a null vector instead of silently degrading the signature.
    */
  def probeDim(df: DataFrame, vecCol: String): Int = {
    val row = df.select(size(col(vecCol)).as("_d")).head()
    val d = row.getInt(0)
    require(d > 0, s"cannot infer embedding dimension from '$vecCol' (got $d)")
    d
  }

  /** Approximate top-k: candidates are corpus vectors whose `bits`-bit
    * signature matches the query's in at least one of `bands` bit-bands
    * (multi-probe flavored banding), then exact cosine rank within the
    * candidate set. Equi-join on (band, bandValue) — no cross join.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 64, bands: Int = 8,
      dim: Int = -1): DataFrame = {
    require(planes % bands == 0 && planes <= 64,
      s"signature is one 64-bit long: need planes % bands == 0 and planes <= 64, got planes=$planes bands=$bands")
    val width = planes / bands
    val hp = hyperplanes(planes, if (dim > 0) dim else probeDim(corpus, vecCol))
    def banded(df: DataFrame, id: String, vecOut: String) = {
      val v = toDouble(col(vecCol))
      df.select(col(idCol).as(id), v.as(vecOut),
          lshSignature(v, hp).as("_sig"))
        .select(col(id), col(vecOut),
          posexplode(array((0 until bands).map(b =>
            shiftrightunsigned(col("_sig"), b * width)
              .bitwiseAND(lit((1L << width) - 1))): _*)))
        .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_bv")
    }
    // narrow banded join on ids only; vectors re-attached per candidate
    val c = banded(corpus, "neighbor_id", "_cv")
    val q = banded(queries, "query_id", "_qv")
    val cand = c.drop("_cv").join(broadcast(q.drop("_qv")),
        c("_band") === q("_band") && c("_bv") === q("_bv") &&
          col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        toDouble(col(vecCol)).as("_qv"))), "query_id")
      .join(corpus.select(col(idCol).as("neighbor_id"),
        toDouble(col(vecCol)).as("_cv")), "neighbor_id")
      .withColumn("_cos", cosineFast(col("_qv"), col("_cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("_cos").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("_cos"), 4).as("cos_sim"))
  }

  /** Probe-cell column backed by the codegen'd
    * [[graft.functions.NearestCentroids]] Expression.
    */
  def nearestCentroids(vec: Column, centroids: Array[Array[Double]],
      nProbe: Int): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      graft.functions.NearestCentroids(
        org.apache.spark.sql.graftshim.ColumnShim.expression(vec), centroids, nProbe))

  /** IVF (inverted-file) approximate top-k: the corpus is partitioned into
    * `nCells` Voronoi cells around trained centroids; each query probes its
    * `nProbe` most-similar cells and ranks ONLY those cells' vectors by
    * exact cosine. The classic big-corpus ANN trade: recall is governed by
    * nProbe/nCells, per-query work drops from |corpus| to ~nProbe/nCells
    * of it.
    *
    * Scale shape: centroids are trained with Lloyd iterations expressed as
    * Spark aggregations (assignment is the codegen'd NearestCentroids
    * expression; the update is a (cell, dim) average — two narrow shuffles
    * per iteration, centroid matrix collected driver-side at
    * nCells x dim doubles). The probe join is an equi-join on the cell id
    * with the small query side broadcast — never a cross join.
    *
    * Deterministic: seed centroids are the `nCells` corpus vectors with
    * the smallest xxhash64(id, seed), so results are reproducible across
    * runs and engines.
    */
  /** Lloyd-trained centroid matrix, shared by [[ivfTopK]] and
    * [[semanticDedup]] (same deterministic hash-ordered seeding, same
    * aggregation-expressed refinement; driver state is O(nCells × dim)
    * doubles only).
    */
  private[graft] def trainCentroids(corpus: DataFrame, idCol: String,
      vecCol: String, nCells: Int, iters: Int,
      seed: Int): Array[Array[Double]] = {
    // (no probeDim pre-pass: the update aggregate takes its dimension from
    // the seed vectors, so the old dimension-probe job — a full feature-
    // pipeline head() per training call — is not needed; the validity
    // guard moved below the seed collect)
    // materialize the parsed vectors ONCE: every Lloyd pass differs only
    // in the centroid literals, so iterating over the raw frame would
    // re-run the scan + element-wise double conversion `iters + 1` times
    // (the [[graft.operators.Regression.logisticFit]] mat-persist idiom;
    // the cache holds one double array per vector — narrow, column-pruned)
    val mat = corpus.select(toDouble(col(vecCol)).as("_v"),
        xxhash64(col(idCol).cast("string"), lit(seed)).as("_h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // deterministic seed sample: nCells vectors with smallest hashed id
      var centroids: Array[Array[Double]] = mat
        .orderBy("_h").limit(nCells)
        .collect().map(_.getSeq[Double](0).toArray)
      require(centroids.nonEmpty && centroids.head.nonEmpty,
        s"cannot infer embedding dimension from '$vecCol'")
      // Lloyd refinement: assign + per-(cell, dim) mean FUSED into one
      // buffer-per-partition aggregate ([[graft.functions.CentroidUpdateAgg]],
      // result-identical to the posexplode + groupBy(_cell, pos).avg
      // formulation it replaces — see its scaladoc). The column-algebra
      // shape materialized dim rows per vector and exchanged a
      // (cell x dim x mapTasks)-row partial table per iteration; this
      // exchanges one 2 x cells x dim buffer per map task.
      import org.apache.spark.sql.graftshim.ColumnShim
      for (_ <- 1 to iters) {
        val upd = ColumnShim.column(
          graft.functions.CentroidUpdateAgg(
            ColumnShim.expression(col("_v")), centroids).toAggregateExpression())
        val means = mat.select(col("_v")).agg(upd.as("_m"))
          .head().getSeq[scala.collection.Seq[Double]](0)
        centroids = centroids.indices.map { c =>
          Option(means(c)).map(_.toArray)
            .getOrElse(centroids(c)) // empty cell keeps its seed
        }.toArray
      }
      centroids
    } finally { mat.unpersist(); () }
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 64, nProbe: Int = 8,
      iters: Int = 1, seed: Int = 42): DataFrame = {
    val centroids = trainCentroids(corpus, idCol, vecCol, nCells, iters, seed)
    // index + multi-probe search (probe count clamped to the trained cells:
    // a corpus smaller than nCells yields fewer centroids)
    val probeN = math.min(nProbe, centroids.length)
    val cin = corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("_cv"))
      .withColumn("_cell", element_at(nearestCentroids(col("_cv"), centroids, 1), 1))
    val qin = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("_qv"))
      .withColumn("_cell", explode(nearestCentroids(col("_qv"), centroids, probeN)))
    val cand = cin.join(broadcast(qin), Seq("_cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("_cos", cosineFast(col("_qv"), col("_cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("_cos").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("_cos"), 4).as("cos_sim"))
  }

  /** Product-quantization ANN (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011) — the compressed-domain scale
    * path past int8: each d-dim vector becomes `m` sub-vector codes
    * (one codebook of `codebookSize` Lloyd centroids per subspace), so
    * the candidate scan touches m SMALL INTS per vector instead of d
    * floats — at d=128, m=4 that is 128× less candidate bandwidth, the
    * difference between "fits in memory" and "doesn't" at 10⁹ vectors.
    *
    * Search is ADC (asymmetric distance computation), inner-product
    * flavor to match [[nearestCentroids]]' cosine-style assignment: per
    * query, an m × codebookSize similarity table is computed ONCE from
    * the norm-scaled codebooks (codegen'd HOFs over a literal nested
    * array — row-local, no join), and each candidate's approximate
    * similarity is m table lookups summed. Candidates re-rank EXACTLY on
    * the true vectors (the X66 two-stage shape), so precision loss only
    * affects recall, never the reported similarity. An identical twin
    * encodes to the query's own per-subspace argmax code, achieving the
    * maximum possible ADC — it can never miss the candidate set, which
    * is what the oracle's closed form pins.
    *
    * Scale shape: codebooks are m·k·(d/m) doubles on the driver (tiny);
    * the corpus is encoded in one pass; scoring is a broadcast of the
    * queries over the codes table; one window per stage. Training cost
    * is m small Lloyd runs over sliced sub-vectors.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 4, codebookSize: Int = 16,
      candidateK: Int = 32, iters: Int = 2, seed: Int = 42): DataFrame = {
    val dim = probeDim(corpus, vecCol)
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    def subCol(v: Column, j: Int): Column = slice(toDouble(v), j * sub + 1, sub)
    val books: IndexedSeq[Array[Array[Double]]] = (0 until m).map { j =>
      trainCentroids(
        corpus.select(col(idCol), subCol(col(vecCol), j).as("_pq_sub")),
        idCol, "_pq_sub", codebookSize, iters, seed + j)
    }
    // norm-scaled codebooks: table entries become plain dot products
    val normBooks: IndexedSeq[Seq[Seq[Double]]] = books.map(_.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      val inv = if (n > 0) 1.0 / n else 1.0
      c.map(_ * inv).toSeq
    }.toSeq)
    // encode: m nearest-centroid indices per corpus vector (codes only —
    // the true vectors do NOT ride the candidate stage)
    val codes = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
      .withColumn("_code", array((0 until m).map(j =>
        element_at(nearestCentroids(subCol(col("_cv"), j), books(j), 1), 1)): _*))
      .select("neighbor_id", "_code")
    // per-query ADC tables: _tbl[j][c] = dot(q_sub_j, normalized cent c)
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
      .withColumn("_tbl", array((0 until m).map(j =>
        transform(typedLit(normBooks(j)), cent =>
          aggregate(zip_with(subCol(col("_qv"), j), cent,
            (a, b) => a * b), lit(0.0), _ + _))): _*))
      .select("query_id", "_tbl")
    val adc = (0 until m).map(j =>
      element_at(element_at(col("_tbl"), j + 1),
        element_at(col("_code"), j + 1) + 1)).reduce(_ + _)
    val wc = Window.partitionBy("query_id")
      .orderBy(col("_adc").desc, col("neighbor_id"))
    val cand = codes.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("_adc", adc)
      .withColumn("_crank", row_number().over(wc))
      .filter(col("_crank") <= candidateK)
      .select("query_id", "neighbor_id")
    // exact re-rank on true vectors, candidates only
    val exact = cand
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv")),
        "neighbor_id")
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("_qv"))), "query_id")
      .withColumn("_cos", cosineFast(col("_qv"), col("_cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("_cos").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("_cos"), 4).as("cos_sim"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by k-means clustering + intra-cluster cosine
    * threshold — the embedding-space analogue of MinHash dedup, used to
    * prune paraphrases and template-generated near-copies that no
    * lexical method catches.
    *
    * Pipeline: cluster the corpus around [[trainCentroids]]' Lloyd
    * centroids (assignment is the codegen'd NearestCentroids argmax,
    * row-local after the centroid broadcast), then compare pairs ONLY
    * within a cluster — the design point that makes the corpus-wide
    * all-pairs comparison never happen. An item is DROPPED when any
    * smaller-id item in its cluster reaches `threshold` cosine; the
    * reported `keep_id` is the smallest such neighbor (it may itself be
    * dropped in a transitive chain — resolving chains to canonical
    * representatives is the connected-components operator's job,
    * [[Dedup.connectedComponents]]).
    *
    * Scale shape: one centroid broadcast + one equi-join on `_cell`;
    * per-cluster pair work is bounded by cluster size (nCells is the
    * skew knob: cells average |corpus|/nCells, and a pathological cell
    * is visible in a skew probe — raise nCells, not the join). The
    * group-by keeps only the minimal neighbor per dropped id, so the
    * output is O(dropped), never O(pairs).
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nCells: Int = 64, iters: Int = 1,
      seed: Int = 42): DataFrame = {
    val centroids = trainCentroids(df, idCol, vecCol, nCells, iters, seed)
    val cells = df
      .select(col(idCol).as("_id"), col(vecCol).as("_vec"))
      .withColumn("_cell",
        element_at(nearestCentroids(col("_vec"), centroids, 1), 1))
    val left = cells.select(col("_cell"), col("_id").as("a"),
      col("_vec").as("_va"))
    val right = cells.select(col("_cell"), col("_id").as("b"),
      col("_vec").as("_vb"))
    val pairs = left.join(right, Seq("_cell"))
      .filter(col("a") < col("b"))
      .withColumn("_cos", cosineFast(col("_va"), col("_vb")))
      .filter(col("_cos") >= threshold)
    pairs.groupBy(col("b").as("drop_id"))
      .agg(min_by(struct(col("a"), col("_cos")), col("a")).as("_k"))
      .select(col("_k.a").as("keep_id"), col("drop_id"),
        round(col("_k._cos"), 4).as("cos_sim"))
  }


  /** Scalar int8 quantization of an embedding column — the 4×
    * storage/bandwidth compression an embedding store applies before
    * ANN indexing at 100 TB. Per-dimension affine codes:
    * `code = round((x - min_d) / (max_d - min_d) * 254) - 127` ∈ [-127,127]
    * (a constant dimension quantizes to 0).
    *
    * Scale shape: the per-dimension min/max is ONE map-side-combined
    * aggregation over (dim, value) pairs; the (dims × 2 doubles) stats
    * table is broadcast back and codes are computed row-locally inside
    * codegen. Returns (id, dim, code) rows plus the dequantized value for
    * error inspection.
    */
  /** Johnson–Lindenstrauss random projection: compress `vecCol` (dim d)
    * to `outDims` with a deterministic ±1 sign matrix (Achlioptas 2003 —
    * database-friendly random projections: the ±1 family preserves
    * pairwise distances with the same JL guarantee as Gaussian entries
    * and needs no float matrix at all). Entry sign(j,i) derives from
    * `md5("<seed>:j:i")` — engine-portable like the X29/X102 md5 keys, so
    * any system can re-derive the exact matrix from the seed alone; the
    * matrix is materialized ONCE driver-side as an outDims×d literal
    * (d·outDims doubles — bytes, not data), and each row's projection is
    * a codegen'd zip_with/aggregate per output dim: one pass over the
    * vector, no shuffle, no UDF. Output values round to 4 digits so the
    * cut is reproducible across engines' summation orders.
    */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
      outDims: Int, seed: String = "jl"): DataFrame = {
    val d = probeDim(df, vecCol)
    def sign(j: Int, i: Int): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$j:$i".getBytes("UTF-8"))
      // first hex digit 0-7 → +1, 8-f → -1 (one unbiased bit per entry)
      if (((h(0) >> 4) & 0xF) < 8) 1.0 else -1.0
    }
    val rmat = array((0 until outDims).map(j =>
      array((0 until d).map(i => lit(sign(j, i))): _*)): _*)
    val scale = math.sqrt(outDims.toDouble)
    df.select(col(idCol),
      transform(sequence(lit(0), lit(outDims - 1)), j =>
        round(
          aggregate(
            zip_with(toDouble(col(vecCol)), element_at(rmat, j + 1), (x, r) => x * r),
            lit(0.0), (acc, x) => acc + x) / lit(scale),
          4)).as("projection"))
  }

  /** K-means cluster assignment — the exposed Lloyd surface behind
    * IVF/PQ/SemDeDup: deterministic (seeded init, fixed iteration count)
    * cluster id per vector, the embedding-space partitioning step of
    * domain-discovery / curriculum pipelines. Assignment is a codegen'd
    * nearest-centroid scan over the broadcast literal codebook: one
    * pass, no shuffle; training is `iters` partial-agg rounds over the
    * corpus (driver holds only k·d doubles).
    *
    * @return idCol, cluster_id (1-based cell id), centroid_sim (4-digit
    *         cosine-style similarity to the assigned centroid)
    */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 5, seed: Int = 42): DataFrame = {
    val centroids = trainCentroids(df, idCol, vecCol, k, iters, seed)
    val v = toDouble(col(vecCol))
    // the probe expression emits 0-based cell indices; expose 1-based ids
    val cell = element_at(nearestCentroids(v, centroids, 1), 1) + lit(1)
    // similarity to the ASSIGNED centroid: dot of the normalized pair,
    // recomputed from the literal codebook (row-local)
    val simTo = centroids.zipWithIndex.map { case (c, i) =>
      val lits = array(c.map(x => lit(x)): _*)
      (i + 1) -> cosineFast(v, lits)
    }
    val sim = simTo.foldLeft(lit(Double.NaN)) { case (acc, (i, s)) =>
      when(cell === i, s).otherwise(acc)
    }
    df.select(col(idCol), cell.cast("long").as("cluster_id"),
      round(sim, 4).as("centroid_sim"))
  }

  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val exploded = df.select(col(idCol).as("_id"),
      posexplode(toDouble(col(vecCol))))
      .withColumnRenamed("pos", "dim").withColumnRenamed("col", "x")
    val stats = exploded.groupBy("dim")
      .agg(min("x").as("_mn"), max("x").as("_mx"))
    val scaled = exploded.join(broadcast(stats), "dim")
      .withColumn("code",
        when(col("_mx") === col("_mn"), lit(0))
          .otherwise((round((col("x") - col("_mn")) / (col("_mx") - col("_mn")) * 254)
            - 127).cast("int")))
    scaled.select(col("_id").as(idCol), col("dim").cast("long").as("dim"),
      col("code"),
      round((col("code") + 127).cast("double") / 254 * (col("_mx") - col("_mn"))
        + col("_mn"), 4).as("dequantized"))
  }

  /** Two-stage retrieval: int8-scalar-quantized candidate scan + exact
    * float rerank — the standard large-scale ANN serving architecture
    * (SQ/PQ codes for the full-corpus pass, exact similarity only for the
    * survivors). The candidate pass streams 1-byte codes instead of
    * 4-byte floats (4× less scan bandwidth once codes are materialized
    * as a table column) and the exact pass touches `candidateK` rows per
    * query instead of the corpus.
    *
    * Scale shape: per-dimension affine stats are ONE map-side-combined
    * aggregation collected to the driver (dims × 2 doubles — the same
    * constant-matrix pattern as the LSH hyperplanes), so encode and
    * dequantize are row-local codegen; the candidate pass is the
    * bruteForceTopK plan over dequantized codes (broadcast queries,
    * window-group-limit partial top-k below the shuffle); the rerank
    * joins the (queries × candidateK)-row candidate set — broadcast —
    * back to exact vectors.
    *
    * Recall: scalar quantization at 254 levels keeps relative error
    * ~0.4%/dim, so the exact top-k survives any `candidateK` modestly
    * above k on real embedding distributions; identical vectors encode
    * identically and always survive.
    */
  def quantizedRerankTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, candidateK: Int = 50): DataFrame = {
    // per-dim min/max: one agg, dims×2 doubles to the driver
    val (mn, span) = affineStats(corpus, vecCol)
    val (mnLit, spanLit) = (array(mn.map(lit).toIndexedSeq: _*),
      array(span.map(lit).toIndexedSeq: _*))
    def encode(vec: Column): Column =
      transform(toDouble(vec), (x, i) =>
        (round((x - element_at(mnLit, i + 1)) / element_at(spanLit, i + 1) * 254)
          - 127).cast("tinyint"))
    // the dequantize runs ONCE per corpus row, BEFORE the query cross
    // join — inside it, the O(dims) transform would re-run per
    // (row × query) pair. (For the materialized-codes path that actually
    // banks the 4× scan-bandwidth win, see [[quantizedRerankTopKFromCodes]].)
    val coded = corpus.select(col(idCol).as("neighbor_id"),
      dequantize(encode(col(vecCol)), mn, span).as("_dq"))
    rerankStages(coded, corpus, queries, idCol, vecCol, k, candidateK)
  }

  /** Per-dimension affine quantization stats: (min, span) arrays, span
    * floored to 1.0 where the dimension is constant. One map-side-combined
    * aggregation; dims × 2 doubles to the driver.
    */
  private def affineStats(corpus: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val st = corpus.select(posexplode(toDouble(col(vecCol))))
      .groupBy("pos").agg(min("col").as("mn"), max("col").as("mx"))
      .orderBy("pos").collect()
    (st.map(_.getDouble(1)),
      st.map { r =>
        val s = r.getDouble(2) - r.getDouble(1)
        if (s == 0.0) 1.0 else s
      })
  }

  private def dequantize(codes: Column, mn: Array[Double], span: Array[Double]): Column = {
    val mnLit = array(mn.map(lit).toIndexedSeq: _*)
    val spanLit = array(span.map(lit).toIndexedSeq: _*)
    transform(codes, (c, i) =>
      (c.cast("double") + 127) / 254 * element_at(spanLit, i + 1)
        + element_at(mnLit, i + 1))
  }

  /** Stage 1 (approximate top-candidateK over 1-byte codes) + stage 2
    * (exact rerank of the survivors against full-width vectors).
    * `coded` carries (neighbor_id, _dq dequantized doubles).
    */
  private def rerankStages(coded: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, candidateK: Int): DataFrame = {
    require(candidateK >= k, s"candidateK ($candidateK) must be >= k ($k)")
    val q = queries.select(col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("_qv"))
    exactRerank(approxCandidates(coded, q, candidateK), corpus, q, idCol,
      vecCol, k)
  }

  /** Stage 1: approximate top-candidateK of each broadcast query over the
    * dequantized codes — per-partition window rank below the shuffle, the
    * bruteForceTopK plan shape.
    */
  private def approxCandidates(coded: DataFrame, q: DataFrame,
      candidateK: Int): DataFrame = {
    val approx = coded.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("_acos", cosineFast(col("_qv"), col("_dq")))
    val wC = Window.partitionBy("query_id")
      .orderBy(col("_acos").desc, col("neighbor_id"))
    approx.withColumn("_crank", row_number().over(wC))
      .filter(col("_crank") <= candidateK)
      .select(col("query_id"), col("neighbor_id"))
  }

  /** Stage 2: exact rerank — full-width vectors touched only for the
    * (queries × candidateK)-row broadcast candidate set.
    */
  private def exactRerank(candidates: DataFrame, corpus: DataFrame,
      q: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val exact = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
      .join(broadcast(candidates), "neighbor_id")
      .join(broadcast(q), "query_id")
      .withColumn("_cos", cosineFast(col("_qv"), col("_cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("_cos").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("_cos"), 4).as("cos_sim"))
  }

  /** Key under which a codes table's commit carries its affine stats. */
  val Int8StatsKey = "graftInt8Stats"

  /** Materialize int8 codes as a graft table at `path`: one row per
    * vector — (idCol, codes array<tinyint>) — with the per-dimension
    * affine stats recorded as CUSTOM COMMIT METADATA (`{"mn": [...],
    * "span": [...]}` under [[Int8StatsKey]]), so a reader dequantizes
    * from the log alone and the candidate scan never touches a
    * full-width float vector. This is the serving-side layout the
    * two-stage architecture is named for: the full-corpus pass streams
    * 1 byte/dim from THIS table (4× less scan bandwidth than float32);
    * the vector table is read only for rerank survivors.
    */
  def writeInt8CodesTable(spark: org.apache.spark.sql.SparkSession,
      corpus: DataFrame, idCol: String, vecCol: String,
      path: String): graft.DeltaTable = {
    import graft.log.Json
    val (mn, span) = affineStats(corpus, vecCol)
    val mnLit = array(mn.map(lit).toIndexedSeq: _*)
    val spanLit = array(span.map(lit).toIndexedSeq: _*)
    val codes = corpus.select(col(idCol),
      transform(toDouble(col(vecCol)), (x, i) =>
        (round((x - element_at(mnLit, i + 1)) / element_at(spanLit, i + 1) * 254)
          - 127).cast("tinyint")).as("codes"))
    val stats = Json.obj()
    stats.set[com.fasterxml.jackson.databind.JsonNode]("mn",
      Json.arr(mn.toIndexedSeq.map(Json.num)))
    stats.set[com.fasterxml.jackson.databind.JsonNode]("span",
      Json.arr(span.toIndexedSeq.map(Json.num)))
    graft.DeltaTable.forPath(path)
      .write(codes, customMetadata = Map(Int8StatsKey -> stats))
  }

  /** Affine stats back out of a codes table's commit metadata (newest
    * commit that carries [[Int8StatsKey]]).
    */
  private def readInt8Stats(t: graft.DeltaTable): (Array[Double], Array[Double]) = {
    val node = t.history.iterator
      .flatMap { case (_, ci) => ci.extra.get(Int8StatsKey) }
      .nextOption()
      .getOrElse(throw new IllegalArgumentException(
        s"codes table at ${t.loc.uri} has no '$Int8StatsKey' commit metadata — " +
          "was it written by writeInt8CodesTable?"))
    def arr(field: String): Array[Double] = {
      val a = node.get(field)
      (0 until a.size()).map(a.get(_).asDouble).toArray
    }
    (arr("mn"), arr("span"))
  }

  /** Stage-1 candidate generation reading ONLY the materialized codes
    * table: (query_id, neighbor_id) of the approximate top-candidateK.
    * Public so the plan contract — no float-vector column anywhere in
    * the candidate scan — is assertable on exactly the stage-1 plan.
    */
  def quantizedCandidates(spark: org.apache.spark.sql.SparkSession,
      codesDir: String, queries: DataFrame, idCol: String, vecCol: String,
      candidateK: Int): DataFrame = {
    val t = graft.DeltaTable.forPath(codesDir)
    val (mn, span) = readInt8Stats(t)
    val coded = t.toDF(spark).select(col(idCol).as("neighbor_id"),
      dequantize(col("codes"), mn, span).as("_dq"))
    val q = queries.select(col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("_qv"))
    approxCandidates(coded, q, candidateK)
  }

  /** Two-stage retrieval over a MATERIALIZED codes table (see
    * [[writeInt8CodesTable]]): the candidate pass scans 1-byte codes —
    * no float vector reaches stage 1's plan — and the exact pass reads
    * full-width vectors for `candidateK` survivors per query only.
    */
  def quantizedRerankTopKFromCodes(spark: org.apache.spark.sql.SparkSession,
      codesDir: String, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, candidateK: Int = 50): DataFrame = {
    require(candidateK >= k, s"candidateK ($candidateK) must be >= k ($k)")
    val candidates = quantizedCandidates(spark, codesDir, queries, idCol,
      vecCol, candidateK)
    val q = queries.select(col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("_qv"))
    exactRerank(candidates, corpus, q, idCol, vecCol, k)
  }

  /** Hard-negative mining for embedding-model training (the ANN-mined
    * negatives of the DPR/SBERT recipe): for each anchor, the top-m most
    * similar candidates INSIDE the cosine band [lo, hi) — similar enough
    * to be informative negatives, below the near-duplicate ceiling so an
    * actual positive never poisons the loss as a false negative.
    *
    * Scale shape: the anchor set is training-batch-sized and BROADCASTS
    * over one corpus scan (swap the corpus side for [[ivfIndexTopK]]'s
    * pruned cells when an index exists); the per-anchor top-m is a
    * WindowGroupLimit-shaped rank over band survivors only.
    */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, idCol: String,
      vecCol: String, m: Int, lo: Double, hi: Double): DataFrame = {
    require(m > 0 && lo < hi, s"need m > 0 and lo < hi, got m=$m [$lo,$hi)")
    val c = corpus.select(col(idCol).as("negative_id"),
      toDouble(col(vecCol)).as("_cv"))
    val a = anchors.select(col(idCol).as("anchor_id"),
      toDouble(col(vecCol)).as("_av"))
    val scored = c.join(broadcast(a),
        col("negative_id") =!= col("anchor_id"))
      .withColumn("_cos", cosineFast(col("_av"), col("_cv")))
      .filter(col("_cos") >= lo && col("_cos") < hi)
    val w = Window.partitionBy("anchor_id")
      .orderBy(col("_cos").desc, col("negative_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= m)
      .select(col("anchor_id"), col("rank").cast("long").as("rank"),
        col("negative_id"), round(col("_cos"), 4).as("cos_sim"))
  }

  // ------------------------------------------------------------------
  // Persisted IVF index: build/refresh separated from query. The r11
  // verdict's gap — ivfTopK/pqTopK retrain codebooks per call, paying the
  // Lloyd pass on every query batch. The index is a PAIR of Delta tables
  // under one directory (the minhash-store X157 pattern: properties pin
  // the construction so a mismatched query fails loudly):
  //   codebook/  (cell, centroid)           — nCells x dim doubles
  //   cells/     (id, cell, vec), PARTITIONED BY cell — so a probe's
  //              cell filter becomes file-level PARTITION PRUNING: a
  //              query touches nProbe/nCells of the corpus bytes, and
  //              that fraction is enforced by the scan, not by a filter
  //              after a full read
  // ------------------------------------------------------------------

  private def ivfProps(dim: Int, nCells: Int, iters: Int, seed: Int) = Map(
    "graft.ivf.dim" -> dim.toString,
    "graft.ivf.nCells" -> nCells.toString,
    "graft.ivf.iters" -> iters.toString,
    "graft.ivf.seed" -> seed.toString)

  private def encodeCells(batch: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame =
    batch.select(col(idCol).as("id"), toDouble(col(vecCol)).as("vec"))
      .withColumn("cell", element_at(nearestCentroids(col("vec"), centroids, 1), 1))
      .select("id", "cell", "vec")

  private def loadIvfCodebook(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): (Array[Array[Double]], Map[String, String]) = {
    val t = graft.DeltaTable.forPath(s"$indexDir/codebook")
    val props = t.tableProperties
    require(props.contains("graft.ivf.nCells"),
      s"$indexDir is not an IVF index (no graft.ivf.nCells property)")
    val rows = t.toDF(spark).select("cell", "centroid").orderBy("cell").collect()
    (rows.map(_.getSeq[Double](1).toArray), props)
  }

  /** Build the persisted index: train centroids once, write both tables.
    * Driver state is the nCells × dim centroid matrix only; encoding is
    * the codegen'd [[nearestCentroids]] argmax, row-local.
    */
  def ivfIndexBuild(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 64, iters: Int = 1, seed: Int = 42): Unit = {
    val dim = probeDim(corpus, vecCol)
    val centroids = trainCentroids(corpus, idCol, vecCol, nCells, iters, seed)
    val props = ivfProps(dim, centroids.length, iters, seed)
    import spark.implicits._
    graft.DeltaTable.forPath(s"$indexDir/codebook")
      .write(centroids.toSeq.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toDF("cell", "centroid"))
      .setTableProperties(props)
    graft.DeltaTable.forPath(s"$indexDir/cells")
      .write(encodeCells(corpus, idCol, vecCol, centroids),
        partitionBy = Some(Seq("cell")))
      .setTableProperties(props)
  }

  /** Refresh: encode a new batch against the PERSISTED codebook (no
    * retraining — the build/refresh/query separation is the point) and
    * append it to the cells table. `batchTxn` is delta's SetTransaction
    * idempotence handshake: a re-delivered batch lands exactly once;
    * without it the blind append retries through OCC rebase.
    */
  def ivfIndexAppend(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, batch: DataFrame, idCol: String, vecCol: String,
      batchTxn: Option[(String, Long)] = None): Unit = {
    val (centroids, props) = loadIvfCodebook(spark, indexDir)
    require(probeDim(batch, vecCol) == props("graft.ivf.dim").toInt,
      s"batch dim ${probeDim(batch, vecCol)} != index dim ${props("graft.ivf.dim")}")
    val cells = graft.DeltaTable.forPath(s"$indexDir/cells")
    val enc = encodeCells(batch, idCol, vecCol, centroids)
    batchTxn match {
      case Some((appId, v)) => cells.writeWithTxn(enc, appId, v)
      case None             => cells.write(enc, maxRetries = 5)
    }
  }

  /** Query the persisted index: probe each query's `nProbe` nearest cells
    * (codebook is a driver-side collect of nCells rows), scan ONLY the
    * probed cell partitions (`cell IN (…)` over the hive layout →
    * partition pruning; probed-cell list is ≤ nCells values), exact
    * cosine within candidates, per-query top-k. Query wall is governed by
    * the probed fraction of the index, never by training — the build cost
    * was paid once, in a prior commit.
    */
  def ivfIndexTopK(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int = 8): DataFrame = {
    val (centroids, _) = loadIvfCodebook(spark, indexDir)
    val probeN = math.min(nProbe, centroids.length)
    val qin = queries.select(col(idCol).as("query_id"),
        toDouble(col(vecCol)).as("_qv"))
      .withColumn("cell", explode(nearestCentroids(col("_qv"), centroids, probeN)))
    // bounded by nCells values — a driver-side literal that the scan can
    // partition-prune with (a join predicate cannot prune files)
    val probed = qin.select("cell").distinct().collect().map(_.getInt(0)).sorted
    val cand = graft.DeltaTable.forPath(s"$indexDir/cells").toDF(spark)
      .filter(col("cell").isin(probed.map(Int.box).toSeq: _*))
      .join(broadcast(qin), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("_cos", cosineFast(col("_qv"), col("vec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("_cos").desc, col("id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        round(col("_cos"), 4).as("cos_sim"))
  }

  /** Exact near-duplicate pairs by embedding cosine >= `threshold`, blocked
    * by LSH band buckets (same inverted-index pattern as Dedup): recall is
    * governed by the banding, precision is exact.
    *
    * Default banding is 64 planes / 8 bands = 8-bit buckets: 256 buckets
    * per band keeps candidate sets ~16x smaller than 4-bit buckets while a
    * cos-0.95 pair still collides in >= 1 band with p ~0.99 (per-bit
    * agreement 1 - theta/pi ~ 0.90, so per-band 0.90^8 ~ 0.43 over 8
    * bands). Identical vectors collide in EVERY band regardless.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 64, bands: Int = 8,
      dim: Int = -1): DataFrame = {
    require(planes % bands == 0 && planes <= 64,
      s"signature is one 64-bit long: need planes % bands == 0 and planes <= 64, got planes=$planes bands=$bands")
    val width = planes / bands
    val hp = hyperplanes(planes, if (dim > 0) dim else probeDim(df, vecCol))
    val v = toDouble(col(vecCol))
    val vecs = df.select(col(idCol).as("_id"), v.as("_v"))
    // narrow banded self-join on ids; vectors re-attached per candidate
    // (a singleton-bucket pre-filter was measured slower here — see
    // Dedup.minHashLshPairs)
    val sig = df.select(col(idCol).as("_id"),
        lshSignature(v, hp).as("_sig"))
      .select(col("_id"),
        posexplode(array((0 until bands).map(b =>
          shiftrightunsigned(col("_sig"), b * width)
            .bitwiseAND(lit((1L << width) - 1))): _*)))
      .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_bv")
    sig.as("x").join(sig.as("y"),
        col("x._band") === col("y._band") && col("x._bv") === col("y._bv") &&
          col("x._id") < col("y._id"))
      .select(col("x._id").as("a"), col("y._id").as("b"))
      .dropDuplicates("a", "b")
      .join(vecs.select(col("_id").as("a"), col("_v").as("_va")), "a")
      .join(vecs.select(col("_id").as("b"), col("_v").as("_vb")), "b")
      .withColumn("cos_sim", cosineFast(col("_va"), col("_vb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("a"), col("b"), round(col("cos_sim"), 4).as("cos_sim"))
  }
}
