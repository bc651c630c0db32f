package graft

import org.apache.spark.sql.functions._

/** Driver-side data skipping: pruning must be conservative (result
  * equality with the unpruned scan) and effective (files actually
  * dropped when stats/partitions allow it).
  */
class DataSkippingSpec extends SparkSuite {

  test("long string stats truncate to widened-but-correct 32-char bounds") {
    import graft.stats.Statistics
    val d = tempDir("stats-trunc")
    val longA = "a" * 100 + "zzz" // min candidate
    val longB = "b" * 100 + "qqq" // max candidate
    val spark2 = spark; import spark2.implicits._
    val t = DeltaTable.forPath(d).write(
      Seq((1L, longA), (2L, longB)).toDF("id", "s").coalesce(1))
    val add = t.dlog.addActions.values.head
    val stats = add.stats.get
    val node = graft.log.Json.mapper.readTree(stats)
    val mn = node.get("minValues").get("s").asText
    val mx = node.get("maxValues").get("s").asText
    assert(mn == "a" * 32, mn)                      // prefix lower bound
    assert(mx == "b" * 31 + "c", mx)                 // incremented upper bound
    assert(mn <= longA && mx > longB, s"$mn / $mx")  // bounds stay valid
    // pruning stays conservative-correct with the widened bounds:
    // a predicate INSIDE the real range keeps the file...
    assert(t.prunedAdds(col("s") === longB).size == 1)
    // ...a value between the real max and the widened bound keeps it
    // too (conservative, never wrong)...
    assert(t.prunedAdds(col("s") === ("b" * 31 + "a")).size == 1)
    // ...and a value above the widened bound prunes it
    assert(t.prunedAdds(col("s") > "c").isEmpty)
    // unit edges: short strings pass through; un-incrementable maxes drop
    assert(Statistics.truncMinString("short") == "short")
    assert(Statistics.truncMaxString("short").contains("short"))
    assert(Statistics.truncMaxString("￿" * 40).isEmpty)
  }

  private lazy val dir: String = {
    val d = tempDir("skip")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .repartitionByRange(4, col("l_orderkey"))
    DeltaTable.forPath(d).write(li, partitionBy = Some(Seq("l_returnflag")))
    d
  }

  private def table = DeltaTable.forPath(dir)

  test("partition pruning drops non-matching partitions") {
    val t = table
    val all = t.prunedAdds(lit(true))
    val a = t.prunedAdds(col("l_returnflag") === "A")
    assert(all.size > a.size, s"expected pruning: ${all.size} vs ${a.size}")
    assert(a.forall(_.partitionValues.get("l_returnflag").flatten.contains("A")))
  }

  test("min/max stats pruning drops out-of-range files") {
    val t = table
    val lowKey = t.prunedAdds(col("l_orderkey") < 10)
    assert(lowKey.size < t.prunedAdds(lit(true)).size)
    // an impossible range keeps nothing
    assert(t.prunedAdds(col("l_orderkey") < -1).isEmpty)
  }

  test("pruned scan equals unpruned filter (range + partition + In)") {
    val t = table
    val preds = Seq(
      col("l_orderkey") < 100,
      col("l_returnflag") === "A" && col("l_quantity") > 30,
      col("l_shipdate") < lit("1996-01-01").cast("timestamp"),
      col("l_orderkey").isin(1, 7, 42),
      col("l_linestatus").isNull || col("l_orderkey") >= 5000)
    preds.foreach { p =>
      assertSameRows(t.toDFWhere(spark, p), t.toDF(spark).filter(p))
    }
  }

  test("Not(= ) skips single-valued files; prefix range skips strings") {
    val t = table
    // partition l_returnflag=A files contain ONLY 'A' -> Not(=A) skips them
    val all = t.prunedAdds(lit(true)).size
    val notA = t.prunedAdds(col("l_returnflag") =!= "A")
    assert(notA.size < all)
    assert(notA.forall(!_.partitionValues.get("l_returnflag").flatten.contains("A")))
    assertSameRows(t.toDFWhere(spark, col("l_returnflag") =!= "A"),
      t.toDF(spark).filter(col("l_returnflag") =!= "A"))
    // startsWith on a data column stays conservative-correct
    assertSameRows(t.toDFWhere(spark, col("l_linestatus").startsWith("F")),
      t.toDF(spark).filter(col("l_linestatus").startsWith("F")))
  }

  test("sub-millisecond timestamp bounds never wrongly prune") {
    import spark.implicits._
    val d = tempDir("skipts")
    // true max 10:00:00.999999 — an ms-floored max stat (.999) would let
    // `ts > .999` or `ts = .999999` wrongly drop the file
    val df = Seq(
      (1L, "2024-01-01T10:00:00.000123Z"),
      (2L, "2024-01-01T10:00:00.999999Z"))
      .toDF("id", "s")
      .select(col("id"), to_timestamp(col("s")).as("ts"))
    val t = DeltaTable.forPath(d).write(df)
    val predGt = col("ts") > lit("2024-01-01T10:00:00.999Z").cast("timestamp")
    val predEq = col("ts") === lit("2024-01-01T10:00:00.999999Z").cast("timestamp")
    Seq(predGt, predEq).foreach { p =>
      assert(t.prunedAdds(p).nonEmpty, s"file wrongly pruned for $p")
      assert(t.toDFWhere(spark, p).count() == 1L)
    }
    // legacy/foreign ms-truncated stats: widened max keeps the file too
    val add = t.dlog.addActions.values.head
    val truncated = add.copy(stats = add.stats.map(
      _.replace("10:00:00.999999", "10:00:00.999")))
    assert(graft.sources.DataSkipping.prune(
        Seq(truncated), predGt, df.schema, Nil).nonEmpty,
      "ms-truncated foreign max stat must be widened, not trusted exactly")
  }

  test("nested struct leaves: stats collected, dotted predicates prune, arrays excluded") {
    val d = tempDir("skip-nested")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    // struct column with a DECOY: top-level `n_nationkey` is constant 0
    // while info.n_nationkey carries the real range — pruning on the
    // nested path must use the NESTED bounds, never the top-level ones
    val df = nation.repartitionByRange(4, col("n_nationkey"))
      .select(
        struct(col("n_nationkey"), col("n_name")).as("info"),
        lit(0).as("n_nationkey"),
        array(col("n_regionkey")).as("tags"),
        col("n_regionkey"))
    val t = DeltaTable.forPath(d).write(df)
    // stats JSON nests the struct leaves delta-style
    val st = t.dlog.addActions.values.head.stats.get
    val node = graft.log.Json.mapper.readTree(st)
    assert(node.path("minValues").path("info").path("n_nationkey").isIntegralNumber, st)
    // arrays contribute no min/max
    assert(node.path("minValues").path("tags").isMissingNode ||
      !node.path("minValues").path("tags").isObject || node.path("minValues").path("tags").isEmpty)
    val all = t.prunedAdds(lit(true)).size
    // dotted predicate prunes on the nested leaf's own bounds
    assert(t.prunedAdds(col("info.n_nationkey") < 5).size < all)
    assert(t.prunedAdds(col("info.n_name") === "CHINA").size < all)
    // the decoy: every file's top-level n_nationkey is [0,0]; if the
    // pruner fell back to the LAST name part it would wrongly drop all
    // but one file for info.n_nationkey >= 20
    val deep = t.prunedAdds(col("info.n_nationkey") >= 20)
    assert(deep.nonEmpty)
    // conservative correctness: pruned scan == full filter
    assertSameRows(
      t.toDF(spark).filter(col("info.n_nationkey") >= 20),
      df.filter(col("info.n_nationkey") >= 20))
    // top-level predicate on the decoy still behaves
    assert(t.prunedAdds(col("n_nationkey") === 0).size == all)
    assert(t.prunedAdds(col("n_nationkey") === 7).isEmpty)
  }

  test("Z-order-lite compaction makes range predicates prune most files") {
    val t = DeltaTable.forPath(QueryLib.lineitemZorderedDir(spark, sfDir))
    val all = t.prunedAdds(org.apache.spark.sql.functions.lit(true)).size
    // ~7% of the key range: after a range-sorted rewrite this lands in few files
    val hit = t.prunedAdds(col("l_orderkey") <= 100).size
    assert(all >= 4, s"fixture should have several files, got $all")
    assert(hit <= all / 2,
      s"range-sorted files should mostly prune: $hit of $all survived")
  }

  test("delete with skipping rewrites only touched partitions") {
    val d = tempDir("skipdel")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .repartitionByRange(4, col("l_orderkey"))
    val t0 = DeltaTable.forPath(d).write(li, partitionBy = Some(Seq("l_returnflag")))
    val before = t0.fileUris.toSet
    val t1 = t0.delete(spark, Some(col("l_returnflag") === "N" && col("l_quantity") > 49))
    // files of partitions A/R must survive untouched
    val after = t1.fileUris.toSet
    val untouched = before.filter(u => u.contains("l_returnflag=A") || u.contains("l_returnflag=R"))
    assert(untouched.subsetOf(after), "untouched partitions must keep their files")
    assertSameRows(t1.toDF(spark),
      t0.toDF(spark).filter(!(col("l_returnflag") === "N" && col("l_quantity") > 49)))
  }
}
