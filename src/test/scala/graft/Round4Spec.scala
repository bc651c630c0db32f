package graft

import graft.operators.{Dedup, Joins, Temporal}
import org.apache.spark.sql.functions._

/** UPDATE: copy-on-write in-place mutation with partial-file rewrite. */
class UpdateSpec extends SparkSuite {

  private def lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("update rewrites matching rows and copies the rest") {
    val d = tempDir("upd")
    val t = DeltaTable.forPath(d).write(lineitem)
      .update(spark, Some(col("l_quantity") > 45), Map("l_discount" -> lit(0.0)))
    val expected = lineitem.withColumn("l_discount",
      when(col("l_quantity") > 45, 0.0).otherwise(col("l_discount")))
    assertSameRows(t.toDF(spark), expected)
    val metrics = t.history.head._2.operationMetrics
    assert(t.history.head._2.operation == "UPDATE")
    val matched = lineitem.filter(col("l_quantity") > 45).count()
    assert(metrics("num_updated_rows").asLong() == matched)
    assert(metrics("num_copied_rows").asLong() == lineitem.count() - matched)
  }

  test("update leaves non-matching files untouched (stats-pruned phase 1)") {
    val d = tempDir("upd-prune")
    val base = DeltaTable.forPath(d)
      .write(lineitem.repartitionByRange(8, col("l_orderkey")))
    val filesBefore = base.fileUris.toSet
    // l_orderkey is range-clustered: a narrow key predicate touches few files
    val t = base.update(spark, Some(col("l_orderkey") < 100),
      Map("l_tax" -> lit(0.0)))
    val untouched = t.fileUris.toSet.intersect(filesBefore)
    assert(untouched.nonEmpty, "update must not rewrite files it cannot touch")
    assertSameRows(t.toDF(spark),
      lineitem.withColumn("l_tax",
        when(col("l_orderkey") < 100, 0.0).otherwise(col("l_tax"))))
  }

  test("update with no matching rows commits an empty change") {
    val d = tempDir("upd-none")
    val t = DeltaTable.forPath(d).write(lineitem)
      .update(spark, Some(col("l_quantity") > 1e9), Map("l_tax" -> lit(0.0)))
    assert(t.version == 1L)
    assertSameRows(t.toDF(spark), lineitem)
  }

  test("update rejects unknown and partition SET columns") {
    val d = tempDir("upd-bad")
    val t = DeltaTable.forPath(d)
      .write(lineitem, partitionBy = Some(Seq("l_returnflag")))
    assertThrows[IllegalArgumentException](
      t.update(spark, None, Map("nope" -> lit(1))))
    assertThrows[IllegalArgumentException](
      t.update(spark, None, Map("l_returnflag" -> lit("X"))))
  }
}

/** As-of join and bucketed range join. */
class TemporalSpec extends SparkSuite {
  import spark.implicits._

  test("asOfJoin picks the latest right row at or before each left time") {
    val left = Seq((1L, "2024-01-01 10:00:00", "e1"), (1L, "2024-01-01 12:00:00", "e2"),
        (2L, "2024-01-01 09:00:00", "e3"))
      .toDF("k", "t", "tag").withColumn("t", col("t").cast("timestamp_ntz"))
    val right = Seq((1L, "2024-01-01 09:30:00", 10.0), (1L, "2024-01-01 11:00:00", 20.0),
        (1L, "2024-01-01 13:00:00", 30.0), (3L, "2024-01-01 00:00:00", 99.0))
      .toDF("k", "t", "price").withColumn("t", col("t").cast("timestamp_ntz"))
    val out = Temporal.asOfJoin(left, right, Seq("k"), "t", "t", Seq("price"))
      .select("tag", "asof_price").as[(String, Option[Double])].collect().toMap
    assert(out("e1").contains(10.0)) // 09:30 is latest <= 10:00
    assert(out("e2").contains(20.0)) // 13:00 is later than the event
    assert(out("e3").isEmpty)        // key 2 has no right rows at all
  }

  test("asOfJoin is inclusive at the exact instant") {
    val left = Seq((1L, "2024-01-01 10:00:00")).toDF("k", "t")
      .withColumn("t", col("t").cast("timestamp_ntz"))
    val right = Seq((1L, "2024-01-01 10:00:00", 7.0)).toDF("k", "t", "price")
      .withColumn("t", col("t").cast("timestamp_ntz"))
    val out = Temporal.asOfJoin(left, right, Seq("k"), "t", "t", Seq("price"))
    assert(out.select("asof_price").as[Option[Double]].head().contains(7.0))
  }

  test("rangeJoin equals the inequality join, boundaries inclusive") {
    val points = (0L to 100L).map(i => (i, i)).toDF("pid", "x")
    val intervals = Seq((1L, 10L, 20L), (2L, 20L, 22L), (3L, 95L, 200L))
      .toDF("rid", "lo", "hi")
    val got = Temporal.rangeJoin(points, intervals, "x", "lo", "hi", bucketWidth = 7L)
      .select("pid", "rid")
    val expected = points.join(intervals, col("x").between(col("lo"), col("hi")))
      .select("pid", "rid")
    assertSameRows(got, expected)
    // boundary membership: x=20 is in BOTH [10,20] and [20,22]
    assert(got.filter(col("pid") === 20L).count() == 2)
  }
}

/** Connected components (large-star/small-star) and salted joins. */
class GraphJoinSpec extends SparkSuite {
  import spark.implicits._

  test("connectedComponents labels chains, cliques and singleton edges") {
    // component A: a 12-long CHAIN (diameter >> 1 forces multiple rounds);
    // component B: a triangle; component C: one isolated pair
    val chain = (0L until 11L).map(i => (100L + i, 101L + i))
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val pair = Seq((50L, 51L))
    val edges = (chain ++ tri ++ pair).toDF("a", "b")
    val got = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    (100L to 111L).foreach(n => assert(got(n) == 100L, s"chain node $n"))
    Seq(1L, 2L, 3L).foreach(n => assert(got(n) == 1L))
    assert(got(50L) == 50L && got(51L) == 50L)
    assert(got.size == 17)
  }

  test("connectedComponents is orientation- and duplicate-insensitive") {
    val e1 = Seq((5L, 9L), (9L, 5L), (9L, 7L), (5L, 9L)).toDF("a", "b")
    val got = Dedup.connectedComponents(e1).as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 5L, 9L -> 5L, 7L -> 5L))
  }

  test("saltedJoin returns exactly the plain join's rows") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
    val got = Joins.saltedJoin(li, sup, Seq("l_suppkey"), Seq("s_suppkey"), salt = 4)
    val expected = li.join(sup, col("l_suppkey") === col("s_suppkey"))
    assertSameRows(got, expected)
  }

  test("saltedJoin preserves left-outer semantics") {
    val big = Seq((1L, "x"), (2L, "y"), (99L, "z")).toDF("k", "p")
    val small = Seq((1L, "a"), (2L, "b")).toDF("sk", "q")
    val got = Joins.saltedJoin(big, small, Seq("k"), Seq("sk"), salt = 3, "left")
    val expected = big.join(small, col("k") === col("sk"), "left")
    assertSameRows(got, expected)
  }
}

/** Streaming dedup: duplicates that cross micro-batch boundaries. */
class StreamDedupSpec extends SparkSuite {

  test("streaming dropDuplicates state survives across micro-batches") {
    val d = tempDir("stream-dedup")
    streaming.DeltaStreamSink.runStreamingDedup(spark, sfDir, d)
    val events = QueryLib.events(spark, sfDir)
    // the sink saw every event twice, in different batches; dedup must
    // reduce it to exactly one copy
    val t = DeltaTable.forPath(d)
    assert(t.version >= 1L, "expected one commit per micro-batch (>= 2 batches)")
    assertSameRows(t.toDF(spark), events)
  }
}
