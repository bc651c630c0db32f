package graft

import graft.log.{Checkpoint, DeltaLog, DeltaLogEntry, Txn}
import graft.operators.Temporal
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-5 advisor regressions: cache hygiene on rejected writes,
  * SetTransaction last-writer-wins, replaceWhere nullability tightening,
  * and NULL-key as-of join semantics.
  */
class Round5Spec extends SparkSuite {
  import spark.implicits._

  private def nation = spark.read.parquet(s"$sfDir/nation.parquet")

  test("a constraint-rejected write leaves the batch uncached") {
    val d = tempDir("leak")
    val t = DeltaTable.forPath(d).write(nation)
      .addConstraint(spark, "positive_key", "n_nationkey >= 0")
    val bad = nation.withColumn("n_nationkey", lit(-1))
    assertThrows[IllegalArgumentException](t.write(bad))
    assert(bad.storageLevel == StorageLevel.NONE,
      "rejected batch must not stay pinned in executor memory")
    // and an accepted write is also left uncached
    val good = nation.withColumn("n_nationkey", col("n_nationkey") + 100)
    t.write(good)
    assert(good.storageLevel == StorageLevel.NONE)
  }

  test("txn watermark is last-writer-wins, before AND after a checkpoint") {
    val d = tempDir("txn-lww")
    val t = DeltaTable.forPath(d).writeWithTxn(nation, "app", 5L)
    assert(t.dlog.latestTxnVersion("app").contains(5L))
    // an external writer records a LOWER version after the higher one:
    // Delta's SetTransaction replay keeps the last in commit order, not
    // the max — the watermark must reset to 3
    val lowered = t.dlog.commit(DeltaLogEntry(Vector(Txn("app", 3L))), t.commitContext)
    assert(lowered.latestTxnVersion("app").contains(3L))
    // the checkpoint snapshot must preserve the same decision
    Checkpoint.write(lowered, t.conf)
    val fromCkpt = Checkpoint.loadFrom(t.logLoc, t.conf)
      .getOrElse(fail("checkpoint did not load"))
    assert(fromCkpt.entries.firstKey > 0L, "expected a checkpoint-based log")
    assert(fromCkpt.latestTxnVersion("app").contains(3L),
      "skip decision changed across a checkpoint")
    // batch 4 is admitted again (5 was superseded by the external reset)
    val replayed = DeltaTable.forPath(d).writeWithTxn(nation, "app", 4L)
    assert(replayed.dlog.latestTxnVersion("app").contains(4L))
  }

  test("replaceWhere rejects nulls aimed at a non-nullable table column") {
    val d = tempDir("rw-null")
    val base = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    assert(!base.schema("id").nullable)
    val t = DeltaTable.forPath(d).write(base)
    // nullable-declared AND actually null: must be rejected
    val withNull = Seq((Some(1), "x"), (None: Option[Int], "y"))
      .toDF("id", "v")
    assertThrows[IllegalArgumentException](
      t.replaceWhere(spark, lit(true), withNull))
    // nullable-declared but provably null-free: tightening is fine
    val nullFree = Seq((Some(7), "x"), (Some(8), "y")).toDF("id", "v")
    val replaced = t.replaceWhere(spark, lit(true), nullFree)
    assertSameRows(replaced.toDF(spark), nullFree.toDF("id", "v"))
  }

  test("MinHashAgg is bit-identical to the min(xxhash64(_s, i)) columns") {
    import org.apache.spark.sql.graftshim.ColumnShim
    val numHashes = 64
    val tok = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("_id"),
        explode(graft.operators.TextAnalysis.tokens(col("text"))).as("_t"))
      .select(col("_id"), xxhash64(col("_t")).as("_s"))
    val viaAgg = tok.groupBy("_id").agg(ColumnShim.column(
        graft.functions.MinHashAgg(ColumnShim.expression(col("_s")), numHashes)
          .toAggregateExpression()).as("_sig"))
      .select(col("_id"), posexplode(col("_sig")))
    val minCols = (0 until numHashes).map(i =>
      min(xxhash64(col("_s"), lit(i))).as(s"_m$i"))
    val viaCols = tok.groupBy("_id").agg(minCols.head, minCols.tail: _*)
      .select(col("_id"), posexplode(array((0 until numHashes).map(i =>
        col(s"_m$i")): _*)))
    assertSameRows(viaAgg, viaCols)
  }

  test("asOfJoin never matches NULL keys (SQL join semantics)") {
    val left = Seq((Some(1L), "2024-01-01 10:00:00", "keyed"),
        (None: Option[Long], "2024-01-01 10:00:00", "nullkey"))
      .toDF("k", "t", "tag").withColumn("t", col("t").cast("timestamp_ntz"))
    val right = Seq((Some(1L), "2024-01-01 09:00:00", 10.0),
        (None: Option[Long], "2024-01-01 09:00:00", 999.0))
      .toDF("k", "t", "price").withColumn("t", col("t").cast("timestamp_ntz"))
    val out = Temporal.asOfJoin(left, right, Seq("k"), "t", "t", Seq("price"))
      .select("tag", "asof_price").as[(String, Option[Double])].collect().toMap
    assert(out("keyed").contains(10.0))
    assert(out("nullkey").isEmpty,
      "a NULL-keyed left row must not pick up NULL-keyed right values")
  }
}
