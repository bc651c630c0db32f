package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Round-12 behavior specs: deterministic weighted sampling. */
class Round12Spec extends SparkSuite {
  import spark.implicits._

  test("weighted sample: deterministic per seed, distinct, bounded by group size") {
    val df = (1 to 300).map(i => (i.toLong, if (i % 3 == 0) "a" else "b", 10.0 + i))
      .toDF("id", "grp", "w")
    val s1 = Sampling.weightedSample(df, "id", col("w"), 30, "seedA", Seq("grp"))
      .select("id").as[Long].collect().sorted.toSeq
    val s2 = Sampling.weightedSample(df, "id", col("w"), 30, "seedA", Seq("grp"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(s1 == s2)
    assert(s1.distinct.size == s1.size)
    assert(s1.size == 60) // both groups have >= 30 members
    val s3 = Sampling.weightedSample(df, "id", col("w"), 30, "seedB", Seq("grp"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(s1 != s3, "a different seed should pick a different sample")
    // k above the group size returns the whole group
    val all = Sampling.weightedSample(df, "id", col("w"), 1000, "seedA", Seq("grp"))
    assert(all.count() == 300)
  }

  test("weighted sample: 10x weight dominates the selection") {
    val df = (1 to 2000).map(i =>
      (i.toLong, if (i <= 1000) 10.0 else 1.0)).toDF("id", "w")
    val picked = Sampling.weightedSample(df, "id", col("w"), 200, "s")
      .select("id").as[Long].collect()
    assert(picked.length == 200)
    val heavy = picked.count(_ <= 1000)
    // E[heavy] ≈ 183 under A-ES (10:1 odds per slot, without replacement);
    // a uniform sampler would center on 100 — the gap is the contract
    assert(heavy > 150, s"heavy=$heavy of 200")
  }

  test("weighted sample: non-positive weight is a loud error") {
    val df = Seq((1L, 1.0), (2L, 0.0)).toDF("id", "w")
    val ex = intercept[Exception](
      Sampling.weightedSample(df, "id", col("w"), 1, "s").collect())
    assert(ex.getMessage.contains("non-positive weight"), ex.getMessage)
  }

  test("kmv store: incremental cardinality equals the direct whole-corpus sketch") {
    import graft.operators.Sketches
    val d = tempDir("kmv-store")
    val all = (1 to 3000).map(i => (s"g${i % 2}", s"v${i % 700}")).toDF("grp", "v")
    val (h0, h1) = (all.filter(hash(col("v")) % 2 === 0),
      all.filter(hash(col("v")) % 2 =!= 0))
    Sketches.kmvStoreInit(d, h0, Seq("grp"), col("v"), 64, "b0")
    Sketches.kmvStoreAppend(d, h1, col("v"), "b1")
    val fromStore = Sketches.kmvStoreCardinality(spark, d)
      .select("grp", "est_distinct", "kth_hash")
    val direct = Sketches.kmvSketch(all, Seq("grp"), col("v"), 64)
      .select(col("grp"), Sketches.estimate(col("kmv_sketch"), 64).as("est_distinct"),
        element_at(col("kmv_sketch"), 64).as("kth_hash"))
    assertSameRows(fromStore, direct)
  }

  test("kmv store: re-delivered batch appends exactly once; non-store refused") {
    import graft.operators.Sketches
    val d = tempDir("kmv-once")
    val df = (1 to 100).map(i => ("g", i.toString)).toDF("grp", "v")
    Sketches.kmvStoreInit(d, df, Seq("grp"), col("v"), 32, "b0")
    Sketches.kmvStoreAppend(d, df, col("v"), "b1", Some(("app", 1L)))
    Sketches.kmvStoreAppend(d, df, col("v"), "b1", Some(("app", 1L))) // retry
    val batches = DeltaTable.forPath(d).toDF(spark)
      .groupBy("batch").count().collect()
    assert(batches.length == 2 && batches.forall(_.getLong(1) == 1L),
      batches.mkString(","))
    val plain = tempDir("kmv-notstore")
    DeltaTable.forPath(plain).write(df)
    val ex = intercept[IllegalStateException](
      Sketches.kmvStoreAppend(plain, df, col("v"), "bX"))
    assert(ex.getMessage.contains("not a kmv store"), ex.getMessage)
  }
}
