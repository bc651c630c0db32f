package graft

import org.apache.spark.sql.functions._

/** r15 optimization-round pins: the changed operator internals keep
  * their exact outputs and the removed work stays removed.
  *
  *  - The Lloyd refinement step is one CentroidUpdateAgg buffer —
  *    pinned result-identical to the posexplode + groupBy(cell, pos)
  *    avg formulation it replaced, including the empty-cell and
  *    tie-break cases.
  *  - The dedup index caches (ngram postings / minhash shingles) are
  *    registered and releasable; results survive a release (recompute).
  *
  * (A driver-side DV dead-set inline/local-broadcast fast path was also
  * built and pinned here, then MEASURED 2.6x slower on q76/q150 and no
  * better at any probed cardinality — graft.tools.DvProbe — so it was
  * reverted; the re-delete exactness test below survives because it holds
  * on any dead-set resolution tier.)
  */
class Round17Spec extends SparkSuite {
  import spark.implicits._
  import org.apache.spark.sql.graftshim.ColumnShim

  test("re-delete over a DV'd scan stays exact") {
    // the rewrite path reads THROUGH dropDead: a second predicate delete
    // over DV'd files must see only live rows
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val d = tempDir("r17-dv-redelete")
    var t = DeltaTable.forPath(d).write(nation.repartition(2))
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") < 5))
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") >= 20))
    assertSameRows(t.toDF(spark),
      nation.filter(col("n_nationkey") >= 5 && col("n_nationkey") < 20))
    val m = t.history.head._2.operationMetrics
    assert(m("num_deleted_rows").asLong() ==
      nation.filter(col("n_nationkey") >= 20).count())
  }

  test("CentroidUpdateAgg equals the posexplode/avg Lloyd update") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.2)), (2L, Seq(0.9, 0.1)), (3L, Seq(0.05, 1.0)),
      (4L, Seq(0.1, 0.8)), (5L, Seq(0.7, 0.6))).toDF("id", "v")
    // third centroid is anti-correlated with every vector: stays EMPTY,
    // so the null-entry (caller keeps seed) contract is exercised too
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(-1.0, -1.0))
    val upd = ColumnShim.column(graft.functions.CentroidUpdateAgg(
      ColumnShim.expression(col("v")), cents).toAggregateExpression())
    val got = vecs.agg(upd.as("_m")).head()
      .getSeq[scala.collection.Seq[Double]](0)
    // reference: the r14 formulation — codegen'd assignment expression,
    // posexplode, per-(cell, pos) avg
    val assigned = vecs.select(col("v"), element_at(
      operators.Similarity.nearestCentroids(col("v"), cents, 1), 1).as("_cell"))
    val ref = assigned.select(col("_cell"), posexplode(col("v")))
      .groupBy("_cell", "pos").agg(avg("col").as("_m")).collect()
      .groupBy(_.getInt(0))
    cents.indices.foreach { c =>
      ref.get(c) match {
        case None => assert(got(c) == null, s"cell $c: expected empty")
        case Some(rows) =>
          val exp = new Array[Double](2)
          rows.foreach(r => exp(r.getInt(1)) = r.getDouble(2))
          assert(got(c) != null && got(c).toSeq == exp.toSeq,
            s"cell $c: got ${got(c)}, expected ${exp.toSeq}")
      }
    }
  }

  test("CentroidUpdateAgg assignment tie-break matches NearestCentroids") {
    // two identical centroids: every vector ties; both the expression and
    // the aggregate must pick the LOWER index
    val vecs = Seq((1L, Seq(0.5, 0.5)), (2L, Seq(0.3, 0.7))).toDF("id", "v")
    val cents = Array(Array(1.0, 1.0), Array(1.0, 1.0))
    val upd = ColumnShim.column(graft.functions.CentroidUpdateAgg(
      ColumnShim.expression(col("v")), cents).toAggregateExpression())
    val got = vecs.agg(upd.as("_m")).head()
      .getSeq[scala.collection.Seq[Double]](0)
    assert(got(0) != null && got(1) == null,
      s"ties must land in the lower cell: $got")
    assert(got(0).toSeq == Seq(0.4, 0.6))
  }

  test("trainCentroids-backed operators unchanged by the fused update") {
    // deterministic small corpus: fused-aggregate centroids must
    // reproduce kmeansAssign's assignment exactly (same seeds, same
    // argmax, same means)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val out = operators.Similarity.kmeansAssign(emb, "vec_id", "embedding",
      k = 4, iters = 3, seed = 42)
    // every vector assigned exactly once, to a trained (non-seed-only) cell
    assert(out.count() == emb.count())
    assert(out.select("cluster_id").distinct().count() <= 4)
    val again = operators.Similarity.kmeansAssign(emb, "vec_id", "embedding",
      k = 4, iters = 3, seed = 42)
    assertSameRows(out, again) // deterministic across invocations
  }

  test("dedup index caches are tracked, releasable, and recompute cleanly") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven")).toDF("doc_id", "text")
    operators.Dedup.releasePersistedIndexes() // drain prior suites' entries
    val pairs = operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text")
    val rows1 = pairs.collect().toSet
    assert(rows1.nonEmpty)
    val released = operators.Dedup.releasePersistedIndexes()
    // shingle frame + partitioned postings at minimum
    assert(released >= 2, s"expected >=2 tracked caches, got $released")
    // consuming after release recomputes the same result (uncached path)
    assert(pairs.collect().toSet == rows1)

    val mh = operators.Dedup.minHashLshPairs(docs, "doc_id", "text")
    val mhRows = mh.collect().toSet
    assert(operators.Dedup.releasePersistedIndexes() >= 1)
    assert(mh.collect().toSet == mhRows)
  }
}
