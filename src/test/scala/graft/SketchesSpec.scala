package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** KMV distinct-count sketches: exact bottom-k state, lossless merge,
  * estimator behavior.
  */
class SketchesSpec extends SparkSuite {
  import spark.implicits._

  private def md5p60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
    val bb = java.nio.ByteBuffer.wrap(d)
    bb.getLong >>> 4
  }

  test("sketch is exactly the k smallest distinct hashes, ascending") {
    val vals = (1 to 500).map(_.toString) ++ (1 to 500).map(_.toString) // dups
    val df = vals.toDF("v")
    val got = Sketches.kmvSketch(df, Seq.empty, col("v"), 64)
      .select("kmv_sketch").as[Seq[Long]].head()
    val want = (1 to 500).map(i => md5p60(i.toString)).distinct.sorted.take(64)
    assert(got == want)
  }

  test("a group with fewer than k distincts keeps them all; estimate is exact") {
    val df = Seq("a", "b", "c", "a").toDF("v")
    val r = Sketches.kmvSketch(df, Seq.empty, col("v"), 64)
      .select(col("kmv_sketch"), Sketches.estimate(col("kmv_sketch"), 64).as("est"))
      .head()
    assert(r.getSeq[Long](0).length == 3)
    assert(r.getAs[Long](1) == 3L)
  }

  test("nulls contribute no identity (count-distinct null semantics)") {
    val df = Seq(Some("a"), None, Some("b"), None).toDF("v")
    val got = Sketches.kmvSketch(df, Seq.empty, col("v"), 8)
      .select("kmv_sketch").as[Seq[Long]].head()
    assert(got.length == 2)
  }

  test("merged shard sketches equal the sketch of the union — losslessly") {
    val a = (1 to 4000).map(i => ("s1", i.toString)).toDF("shard", "v")
    val b = (2000 to 6000).map(i => ("s2", i.toString)).toDF("shard", "v")
    val k = 128
    val shards = Sketches.kmvSketch(a.union(b), Seq("shard"), col("v"), k)
    val merged = shards
      .agg(Sketches.kmvMergeAgg(col("kmv_sketch"), k).as("kmv_sketch"))
      .select("kmv_sketch").as[Seq[Long]].head()
    val direct = Sketches.kmvSketch(a.union(b).select("v"), Seq.empty, col("v"), k)
      .select("kmv_sketch").as[Seq[Long]].head()
    assert(merged == direct)
  }

  test("estimator lands within the ~1/sqrt(k) band on 20k distincts") {
    val n = 20000
    val df = (1 to n).map(_.toString).toDF("v")
    val k = 256
    val est = Sketches.kmvSketch(df, Seq.empty, col("v"), k)
      .select(Sketches.estimate(col("kmv_sketch"), k).as("est"))
      .as[Long].head()
    // 4 standard errors: 4/sqrt(256) = 25%
    assert(math.abs(est - n).toDouble / n < 0.25, s"est=$est exact=$n")
  }
}
