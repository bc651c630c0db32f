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

  test("asof join tolerance: stale matches null out together, fresh ones survive") {
    import graft.operators.Temporal
    val left = Seq((1L, "u", "2024-01-01 10:00:00"),
      (2L, "u", "2024-01-01 12:00:00"),
      (3L, "u", "2024-01-01 12:30:00")).toDF("id", "k", "ts")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val right = Seq(("u", "2024-01-01 09:30:00", 1.0, "a"),
      ("u", "2024-01-01 12:10:00", 2.0, "b")).toDF("k", "ts", "v", "tag")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    // no tolerance: every left row has an as-of match
    val plain = Temporal.asOfJoin(left, right, Seq("k"), "ts", "ts",
      Seq("v", "tag")).orderBy("id").collect()
    assert(plain.map(_.getAs[Double]("asof_v")).toSeq == Seq(1.0, 1.0, 2.0))
    // 1h tolerance: row 2's only candidate (09:30) is 2.5h stale — BOTH
    // value columns null together; rows 1 and 3 keep their fresh match
    val tol = Temporal.asOfJoin(left, right, Seq("k"), "ts", "ts",
      Seq("v", "tag"), toleranceSeconds = Some(3600L)).orderBy("id").collect()
    assert(tol.map(r => Option(r.getAs[java.lang.Double]("asof_v"))).toSeq ==
      Seq(Some(1.0), None, Some(2.0)))
    assert(tol.map(r => Option(r.getAs[String]("asof_tag"))).toSeq ==
      Seq(Some("a"), None, Some("b")))
    // exactly-at-the-bound is inclusive (>=)
    val edge = Temporal.asOfJoin(left, right, Seq("k"), "ts", "ts",
      Seq("v"), toleranceSeconds = Some(9000L)).orderBy("id").collect()
    assert(Option(edge(1).getAs[java.lang.Double]("asof_v")) == Some(1.0))
  }

  test("CDF _commit_timestamp opt-in matches per-version history timestamps") {
    val d = tempDir("cdf-ts")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val t = DeltaTable.forPath(d).write(nation).write(nation)
      .delete(spark, Some(col("n_nationkey") < 5))
    val hist = t.history.map { case (v, c) => v -> c.effectiveTimestamp }.toMap
    val rows = t.changesBetween(spark, 0L, 2L, includeTimestamp = true)
      .select(col("_commit_version"), col("_commit_timestamp").cast("long") * 1000)
      .distinct().collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == hist(r.getLong(0)) / 1000 * 1000,
        s"v${r.getLong(0)}: ${r.getLong(1)} vs ${hist(r.getLong(0))}")
    }
    // default shape unchanged: no timestamp column
    assert(!t.changesBetween(spark, 0L, 2L).columns.contains("_commit_timestamp"))
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
