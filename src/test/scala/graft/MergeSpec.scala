package graft

import org.apache.spark.sql.functions._

class MergeSpec extends SparkSuite {

  private def nation = spark.read.parquet(s"$sfDir/nation.parquet")

  test("merge updates matched keys and inserts new ones") {
    val d = tempDir("merge")
    val t0 = DeltaTable.forPath(d).write(nation)
    // update region of nations 0-4; insert nations 100-102
    val updates = nation.filter(col("n_nationkey") < 5)
      .withColumn("n_regionkey", lit(99))
    val inserts = nation.filter(col("n_nationkey") < 3)
      .withColumn("n_nationkey", col("n_nationkey") + 100)
    val t1 = t0.merge(spark, updates.union(inserts), Seq("n_nationkey"))

    assert(t1.history.head._2.operation == "MERGE")
    val out = t1.toDF(spark)
    assert(out.count() == nation.count() + 3)
    assert(out.filter(col("n_nationkey") < 5 && col("n_regionkey") =!= 99).count() == 0)
    assert(out.filter(col("n_nationkey") >= 100).count() == 3)
    // unmatched rows untouched
    assertSameRows(out.filter(col("n_nationkey") >= 5 && col("n_nationkey") < 100),
      nation.filter(col("n_nationkey") >= 5))
    // previous version still readable (copy-on-write)
    assertSameRows(t1.loadAsVersion(0L).toDF(spark), nation)
  }

  test("merge metrics count updates, inserts, copies") {
    val d = tempDir("merge-metrics")
    val t0 = DeltaTable.forPath(d).write(nation)
    val src = nation.filter(col("n_nationkey") < 2)
      .withColumn("n_name", lit("RENAMED"))
    val t1 = t0.merge(spark, src, Seq("n_nationkey"))
    val m = t1.history.head._2.operationMetrics
    assert(m("num_updated_rows").asLong() == 2L)
    assert(m("num_inserted_rows").asLong() == 0L)
    assert(m("num_copied_rows").asLong() == nation.count() - 2)
  }

  test("merge rejects duplicate source keys") {
    val d = tempDir("merge-dup")
    val t0 = DeltaTable.forPath(d).write(nation)
    intercept[IllegalArgumentException] {
      t0.merge(spark, nation.union(nation), Seq("n_nationkey"))
    }
  }

  test("append write retries through a commit conflict") {
    val d = tempDir("retry")
    DeltaTable.forPath(d).write(nation)
    val a = DeltaTable.forPath(d)
    val b = DeltaTable.forPath(d)
    a.write(nation) // commits v1; b's snapshot is now stale
    val t = b.write(nation, maxRetries = 3)
    assert(t.version == 2L)
    assert(DeltaTable.forPath(d).toDF(spark).count() == nation.count() * 3)
  }
}
