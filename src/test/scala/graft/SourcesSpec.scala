package graft

import graft.sources.DatasetUtils
import graft.streaming.DeltaStreamSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class DatasetUtilsSpec extends SparkSuite {
  import spark.implicits._

  private val abc = Seq((1L, "x", 1.0)).toDF("a", "b", "c")
  private val abd = Seq((2L, "y", true)).toDF("a", "b", "d")

  test("merge mode unifies schemas with null backfill") {
    val out = DatasetUtils.unionInputs(Seq(abc, abd), "merge")
    assert(out.columns.toSet == Set("a", "b", "c", "d"))
    assert(out.count() == 2)
    assert(out.filter(col("a") === 2L).select("c").collect()(0).isNullAt(0))
  }

  test("common mode intersects schemas") {
    val out = DatasetUtils.unionInputs(Seq(abc, abd), "common")
    assert(out.columns.toSeq == Seq("a", "b"))
    assert(out.count() == 2)
  }

  test("no common columns raises") {
    intercept[IllegalArgumentException] {
      DatasetUtils.unionInputs(
        Seq(Seq(1).toDF("a"), Seq(2).toDF("b")), "common")
    }
  }

  test("multi-input write commits heterogeneous frames as one version") {
    // reference tests/test_dataset.py:37-82: a batch of schema-divergent
    // inputs lands as a single atomic commit under the merged schema
    val d = tempDir("multi-write")
    val t = DeltaTable.forPath(d).write(Seq(abc, abd), schemaMode = "merge")
    assert(t.version == 0L)
    val out = t.toDF(spark)
    assert(out.columns.toSet == Set("a", "b", "c", "d"))
    assert(out.count() == 2)
    assert(out.filter(col("a") === 1L).select("d").collect()(0).isNullAt(0))
    // appending another heterogeneous batch evolves the schema atomically
    val abe = Seq((3L, "z", 9L)).toDF("a", "b", "e")
    val t2 = t.write(Seq(abc, abe), schemaMode = "merge")
    assert(t2.version == 1L)
    assert(t2.toDF(spark).columns.toSet == Set("a", "b", "c", "d", "e"))
    assert(t2.toDF(spark).count() == 4)
  }
}

class DeltaStreamSourceSpec extends SparkSuite {

  test("append-only table streams exactly the committed rows") {
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val dir = tempDir("stream-src")
    DeltaTable.forPath(dir).write(nation).write(nation)

    val outDir = tempDir("stream-src-out")
    val q = DeltaStreamSource.appendOnlyStream(spark, dir).writeStream
      .option("checkpointLocation", tempDir("stream-src-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch(graft.streaming.DeltaStreamSink.appendSink(outDir) _)
      .start()
    q.awaitTermination()

    assertSameRows(DeltaTable.forPath(outDir).toDF(spark), nation.union(nation))
  }
}
