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

/** replaceWhere: predicate-scoped atomic overwrite. */
class ReplaceWhereSpec extends SparkSuite {

  private def orders = spark.read.parquet(s"$sfDir/orders.parquet")

  test("replaceWhere swaps matching rows in one commit, others untouched") {
    val d = tempDir("rw")
    val base = DeltaTable.forPath(d)
      .write(orders, partitionBy = Some(Seq("o_orderstatus")))
    val untouchedBefore = base.fileUris.filterNot(_.contains("o_orderstatus=F")).toSet
    val replacement = orders.filter(col("o_orderstatus") === "F")
      .withColumn("o_totalprice", lit(0.0))
    val t = base.replaceWhere(spark, col("o_orderstatus") === "F", replacement)
    assert(t.version == base.version + 1, "must be ONE atomic commit")
    // partition pruning: non-F files survive verbatim
    val untouchedAfter = t.fileUris.filterNot(_.contains("o_orderstatus=F")).toSet
    assert(untouchedAfter == untouchedBefore)
    val expected = orders.filter(col("o_orderstatus") =!= "F")
      .unionByName(replacement)
    assertSameRows(t.toDF(spark), expected)
  }

  test("replaceWhere rejects rows outside the predicate") {
    val d = tempDir("rw-bad")
    val t = DeltaTable.forPath(d).write(orders)
    assertThrows[IllegalArgumentException](
      t.replaceWhere(spark, col("o_orderstatus") === "F", orders))
  }

  test("replaceWhere rejects schema evolution") {
    val d = tempDir("rw-schema")
    val t = DeltaTable.forPath(d).write(orders)
    val evolved = orders.filter(col("o_orderstatus") === "F")
      .withColumn("extra", lit(1))
    assertThrows[Exception](
      t.replaceWhere(spark, col("o_orderstatus") === "F", evolved))
  }
}

/** Stream-stream join: watermarked inner join equals the batch join. */
class StreamStreamJoinSpec extends SparkSuite {

  test("purchase-click attribution join matches the batch equivalent") {
    val d = tempDir("ssj")
    streaming.DeltaStreamSink.runStreamStreamJoin(spark, sfDir, d)
    val ev = QueryLib.events(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val expected = p.join(c, col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") && col("c_ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"))
      .select("user_id", "purchase_id", "click_id")
    assertSameRows(DeltaTable.forPath(d).toDF(spark), expected)
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

  test("asOfJoin returns the LATEST row's value even when it is NULL") {
    // per-column last(ignoreNulls) would resurrect the stale 10.0 here;
    // as-of semantics require the t=11:00 row's NULL
    val left = Seq((1L, "2024-01-01 12:00:00")).toDF("k", "t")
      .withColumn("t", col("t").cast("timestamp_ntz"))
    val right = Seq((1L, "2024-01-01 09:30:00", Some(10.0)),
        (1L, "2024-01-01 11:00:00", None: Option[Double]))
      .toDF("k", "t", "price").withColumn("t", col("t").cast("timestamp_ntz"))
    val out = Temporal.asOfJoin(left, right, Seq("k"), "t", "t", Seq("price"))
    assert(out.select("asof_price").as[Option[Double]].head().isEmpty,
      "stale non-null value must not shadow the as-of row's NULL")
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

  test("keyed rangeJoin restricts matches to the same key") {
    val points = Seq((1L, 10L, 15L), (2L, 10L, 15L), (3L, 99L, 15L))
      .toDF("pid", "k", "x")
    val intervals = Seq((7L, 10L, 10L, 20L), (8L, 11L, 10L, 20L))
      .toDF("rid", "k", "lo", "hi")
    val got = Temporal.rangeJoin(points, intervals, "x", "lo", "hi",
        bucketWidth = 7L, keyCols = Seq("k"))
      .select("pid", "rid")
    val expected = points.join(intervals,
        points("k") === intervals("k") && col("x").between(col("lo"), col("hi")))
      .select("pid", "rid")
    assertSameRows(got, expected)
    assert(got.count() == 2) // pids 1 and 2 match rid 7 only
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

  test("saltedJoin rejects right/full joins that would duplicate replicas") {
    val big = Seq((1L, "x")).toDF("k", "p")
    val small = Seq((1L, "a"), (7L, "b")).toDF("sk", "q")
    assertThrows[IllegalArgumentException](
      Joins.saltedJoin(big, small, Seq("k"), Seq("sk"), 3, "right"))
    assertThrows[IllegalArgumentException](
      Joins.saltedJoin(big, small, Seq("k"), Seq("sk"), 3, "full_outer"))
  }

  test("connectedComponents refuses to return a non-converged answer") {
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    // smallGraphEdges = 0 forces the DISTRIBUTED rounds (the r11 driver
    // fast path would otherwise solve a 30-edge chain without rounds)
    assertThrows[IllegalStateException](
      Dedup.connectedComponents(chain, maxRounds = 1, smallGraphEdges = 0L))
  }
}

/** Custom hash/aggregate expressions must equal their composable
  * column-algebra formulations bit-for-bit (they exist only for speed).
  */
class HashFunctionsSpec extends SparkSuite {
  import org.apache.spark.sql.graftshim.ColumnShim
  import spark.implicits._

  test("Md5Prefix60 equals conv(substring(md5, 1, 15), 16, 10)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("t"))
      .union(Seq("", "x", "ünïcødé ≠", " ").toDF("t"))
    val out = docs.select(
      ColumnShim.column(graft.functions.Md5Prefix60(
        ColumnShim.expression(col("t").cast("binary")))).as("fast"),
      conv(substring(md5(col("t").cast("binary")), 1, 15), 16, 10)
        .cast("long").as("ref"))
    assert(out.filter(col("fast") =!= col("ref")).count() == 0)
    assert(out.filter(col("fast") < 0).count() == 0, "60-bit value is never negative")
  }

  test("SimHashAgg equals the sum(when) bit-counter formulation") {
    val numBits = 60
    val tok = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("_id"),
        explode(split(lower(col("text")), " ")).as("_t"))
      .withColumn("_h", xxhash64(col("_t")).bitwiseAND(lit((1L << 60) - 1)))
    val fast = tok.groupBy("_id").agg(
      ColumnShim.column(graft.functions.SimHashAgg(
        ColumnShim.expression(col("_h")), numBits).toAggregateExpression()).as("simhash"))
    val bitSums = (0 until numBits).map { j =>
      sum(when(col("_h").bitwiseAND(lit(1L << j)) =!= 0L, 1).otherwise(-1)).as(s"_b$j")
    }
    val slowAgg = tok.groupBy("_id").agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until numBits).map { j =>
      when(col(s"_b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val slow = slowAgg.select(col("_id"), sim.as("simhash"))
    assertSameRows(fast, slow)
  }
}

/** Morton-code Z-ordering: the InterleaveBits expression and the
  * OPTIMIZE zOrder rewrite.
  */
class MortonSpec extends SparkSuite {
  import org.apache.spark.sql.graftshim.ColumnShim
  import spark.implicits._

  private def morton(cols: org.apache.spark.sql.Column*) =
    ColumnShim.column(graft.functions.InterleaveBits(cols.map(ColumnShim.expression)))

  test("InterleaveBits matches a reference implementation (codegen path)") {
    def ref(a: Long, b: Long): Long = {
      var out = 0L
      for (bit <- 0 until 32) {
        out |= ((a >>> bit) & 1L) << (bit * 2)
        out |= ((b >>> bit) & 1L) << (bit * 2 + 1)
      }
      out
    }
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L),
      (65535L, 1L), (123456L, 654321L))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"), morton(col("a"), col("b")).as("m"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, m) => assert(m == ref(a, b), s"($a,$b)") }
    // z-curve basics: interleave is monotone in each dim at the origin
    assert(ref(0, 0) < ref(1, 0) && ref(1, 0) < ref(0, 1) && ref(0, 1) < ref(1, 1))
  }

  test("zOrder strings bucket order-preserving; timestamps via epoch; binaries rejected") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").repartition(8)
    val d = tempDir("morton-str")
    val t = DeltaTable.forPath(d).write(li)
    // string dims bucket through the first-7-byte big-endian surrogate:
    // rows invariant AND the string dim's min/max stats prune
    val tS = t.compact(spark, sortBy = Seq("l_returnflag", "l_orderkey"),
      targetFiles = 6, zOrder = true)
    assertSameRows(tS.toDF(spark), li)
    assert(tS.prunedAdds(col("l_returnflag") === "A").size < tS.fileUris.size,
      "string z-order dim must stay range-prunable")
    assert(tS.prunedAdds(col("l_orderkey") < 50).size < tS.fileUris.size)
    // genuinely unsupported types still fail loudly
    val ex = intercept[IllegalArgumentException](
      tS.compact(spark, sortBy = Seq("l_returnflag", "bad_col"),
        targetFiles = 4, zOrder = true))
    assert(ex.getMessage.nonEmpty)
    // timestamp dims bucket through their epoch form
    val t2 = tS.compact(spark, sortBy = Seq("l_shipdate", "l_orderkey"),
      targetFiles = 4, zOrder = true)
    assertSameRows(t2.toDF(spark), li)
  }

  test("zOrder compact keeps rows identical and stats selective in BOTH dims") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val dM = tempDir("morton")
    val tM = DeltaTable.forPath(dM).write(li)
      .compact(spark, sortBy = Seq("l_orderkey", "l_quantity"),
        targetFiles = 8, zOrder = true)
    assertSameRows(tM.toDF(spark), li)
    assert(tM.fileUris.length >= 4, "expected a multi-file layout")
    // linear sort on (l_orderkey, l_quantity) clusters only the first key
    val dL = tempDir("linear")
    val tL = DeltaTable.forPath(dL).write(li)
      .compact(spark, sortBy = Seq("l_orderkey", "l_quantity"), targetFiles = 8)
    val total = tM.fileUris.length
    def pruned(t: DeltaTable, p: org.apache.spark.sql.Column) = t.prunedAdds(p).size
    // first-dim predicate: both layouts prune
    assert(pruned(tM, col("l_orderkey") < 500) < total)
    // SECOND-dim predicate: the Morton layout must prune where the
    // linear layout cannot (every linear file spans all quantities)
    val qPred = col("l_quantity") >= 45
    assert(pruned(tL, qPred) == tL.fileUris.length,
      "linear layout should not prune on the second dim (sanity)")
    assert(pruned(tM, qPred) < total,
      s"Morton layout failed to prune on the second dim: ${pruned(tM, qPred)}/$total")
  }
}

/** txn (SetTransaction) idempotent writes. */
class TxnSpec extends SparkSuite {

  private def nation = spark.read.parquet(s"$sfDir/nation.parquet")

  test("writeWithTxn skips an already-committed batch") {
    val d = tempDir("txn")
    var t = DeltaTable.forPath(d).writeWithTxn(nation, "app-1", 0L)
    assert(t.version == 0L)
    // replay of batch 0 is a no-op
    t = t.writeWithTxn(nation, "app-1", 0L)
    assert(t.version == 0L)
    assert(t.toDF(spark).count() == 25)
    // next batch commits; replays of both batches are no-ops
    t = t.writeWithTxn(nation, "app-1", 1L)
    t = t.writeWithTxn(nation, "app-1", 0L)
    t = t.writeWithTxn(nation, "app-1", 1L)
    assert(t.version == 1L)
    assert(t.toDF(spark).count() == 50)
    // another app's batch 0 is independent
    t = t.writeWithTxn(nation, "app-2", 0L)
    assert(t.toDF(spark).count() == 75)
  }

  test("a STALE handle adopts the competing replay's commit on conflict") {
    val d = tempDir("txn-race")
    val t0 = DeltaTable.forPath(d).writeWithTxn(nation, "app", 0L)
    // two handles at version 0 both try batch 1: the second, stale handle
    // must adopt the winner's commit instead of duplicating or failing
    val winner = t0.writeWithTxn(nation, "app", 1L)
    val loser = t0.writeWithTxn(nation, "app", 1L)
    assert(winner.version == 1L && loser.version == 1L)
    assert(loser.toDF(spark).count() == 50)
  }

  test("txn survives the checkpoint fast path") {
    val d = tempDir("txn-ckpt")
    var t = DeltaTable.forPath(d).copy(checkpointInterval = 3)
    t = t.writeWithTxn(nation, "app", 0L)
    (1L to 3L).foreach(v => t = t.writeWithTxn(nation, "app", v))
    val fresh = DeltaTable.forPath(d) // checkpoint-based open
    assert(fresh.dlog.entries.firstKey == 3L, "expected checkpoint base")
    assert(fresh.dlog.latestTxnVersion("app").contains(3L))
    // replay after reopen is still a no-op
    assert(fresh.writeWithTxn(nation, "app", 2L).version == fresh.version)
  }
}

/** CHECK constraints: write-time data-quality enforcement. */
class ConstraintSpec extends SparkSuite {

  private def nation = spark.read.parquet(s"$sfDir/nation.parquet")

  test("addConstraint validates existing data and gates future writes") {
    val d = tempDir("ck")
    var t = DeltaTable.forPath(d).write(nation)
      .addConstraint(spark, "valid_region", "n_regionkey BETWEEN 0 AND 4")
    assert(t.constraints == Map("valid_region" -> "n_regionkey BETWEEN 0 AND 4"))
    // conforming write passes; violating write is rejected before any commit
    t = t.write(nation)
    val vBefore = t.version
    val bad = nation.withColumn("n_regionkey", lit(99L))
    val ex = intercept[IllegalArgumentException](t.write(bad))
    assert(ex.getMessage.contains("valid_region"))
    assert(DeltaTable.forPath(d).version == vBefore, "no partial commit")
  }

  test("constraints persist across writes, reopen, and drop") {
    val d = tempDir("ck-persist")
    var t = DeltaTable.forPath(d).write(nation)
      .addConstraint(spark, "named", "n_name IS NOT NULL")
    t = t.write(nation) // metadata rewrite must carry configuration forward
    assert(DeltaTable.forPath(d).constraints.contains("named"))
    t = t.dropConstraint("named")
    assert(DeltaTable.forPath(d).constraints.isEmpty)
    t.write(nation.withColumn("n_name", lit(null).cast("string"))) // now allowed
  }

  test("addConstraint refuses when existing rows violate it") {
    val d = tempDir("ck-bad")
    val t = DeltaTable.forPath(d).write(nation)
    assertThrows[IllegalArgumentException](
      t.addConstraint(spark, "impossible", "n_nationkey < 0"))
  }

  test("constraints gate UPDATE, MERGE and replaceWhere too") {
    val d = tempDir("ck-mut")
    val t = DeltaTable.forPath(d).write(nation)
      .addConstraint(spark, "small_key", "n_nationkey < 1000")
    val ex1 = intercept[IllegalArgumentException](
      t.update(spark, Some(col("n_regionkey") === 0), Map("n_nationkey" -> lit(5000L))))
    assert(ex1.getMessage.contains("small_key"))
    val ex2 = intercept[IllegalArgumentException](
      t.merge(spark, nation.limit(1).withColumn("n_nationkey", lit(5000L)),
        Seq("n_nationkey")))
    assert(ex2.getMessage.contains("small_key"))
    // replacement satisfies the predicate but violates the constraint
    val ex3 = intercept[IllegalArgumentException](
      t.replaceWhere(spark, col("n_regionkey") === 0,
        nation.filter(col("n_regionkey") === 0)
          .withColumn("n_nationkey",
            (col("n_nationkey") + 5000L).cast(nation.schema("n_nationkey").dataType))))
    assert(ex3.getMessage.contains("small_key"))
  }

  test("replaceWhere carries table configuration (constraints) forward") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val d = tempDir("ck-rw")
    var t = DeltaTable.forPath(d).write(orders)
      .addConstraint(spark, "priced", "o_totalprice >= 0")
    t = t.replaceWhere(spark, col("o_orderstatus") === "F",
      orders.filter(col("o_orderstatus") === "F"))
    assert(DeltaTable.forPath(d).constraints.contains("priced"),
      "replaceWhere metadata rewrite must not wipe constraints")
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
