package graft

import org.apache.spark.sql.functions._

/** Generated-column partition pruning: filters on the generation SOURCE
  * column imply partition predicates (delta's OptimizeGeneratedColumn),
  * on both the driver-side pruner and the planner-time FileIndex.
  */
class GeneratedPruningSpec extends SparkSuite {

  private def events = QueryLib.events(spark, sfDir)

  private def scansOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansOf(a.executedPlan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    }.flatten

  test("timestamp range filter prunes generated date partitions") {
    val d = tempDir("genprune-ts")
    val ev = events.coalesce(1)
    val t = DeltaTable.forPath(d)
      .withGeneratedColumn("event_date", "CAST(ts AS DATE)")
      .write(ev, partitionBy = Some(Seq("event_date")))
    val nParts = t.fileUris.size
    assert(nParts > 3, s"need several date partitions, got $nParts")
    val cut = ev.orderBy("ts").limit(200).agg(max("ts"))
      .head().getAs[java.time.LocalDateTime](0)
    // prunedAdds: the ts range filter alone must drop later partitions
    val pruned = t.prunedAdds(col("ts") <= lit(cut))
    assert(pruned.size < nParts,
      s"derived partition bound should prune: ${pruned.size} of $nParts")
    // and never a matching row: same result as the unpruned filter
    val expect = ev.filter(col("ts") <= lit(cut)).count()
    assert(expect > 0)
    assert(t.toDFWhere(spark, col("ts") <= lit(cut)).count() == expect)
    // planner path: a plain scan with the ts filter plans fewer files
    val df = t.toDF(spark).filter(col("ts") <= lit(cut))
    val qe = df.queryExecution
    assert(qe.executedPlan.executeCollect().length == expect)
    val scan = scansOf(qe.executedPlan).headOption
      .getOrElse(fail("expected a FileSourceScanExec"))
    assert(scan.metrics("numFiles").value == pruned.size,
      s"planner planned ${scan.metrics("numFiles").value}, pruner says ${pruned.size}")
  }

  test("string-source equality prunes an import where stats cannot; ranges never derive") {
    // zero-copy import: footer-derived stats skip string min/max, so ONLY
    // the derived partition predicate can prune on `stamp` — an airtight
    // observable, and exactly the scenario the derivation exists for
    val raw = tempDir("genprune-str-raw"); val d = tempDir("genprune-str")
    spark.range(300).selectExpr(
      "id",
      "concat('2024-03-', lpad(cast(id % 5 + 10 as string), 2, '0'), ' 08:30:00') AS stamp",
      "concat('2024-03-', lpad(cast(id % 5 + 10 as string), 2, '0')) AS day")
      .coalesce(1)
      .write.mode("overwrite").partitionBy("day").parquet(raw)
    val t = DeltaTable.forPath(d)
      .withGeneratedColumn("day", "CAST(stamp AS DATE)")
      .importRefs(spark, Seq(raw), partitionBy = Some(Seq("day")))
    assert(t.fileUris.size == 5)
    assert(graft.log.Generated.expressions(t.dlog.schema).get("day")
      .contains("CAST(stamp AS DATE)"), "import must record the generation expr")
    val pruned = t.prunedAdds(col("stamp") === "2024-03-12 08:30:00")
    assert(pruned.size == 1, s"equality must prune to one partition: ${pruned.size}")
    assert(t.toDFWhere(spark, col("stamp") === "2024-03-12 08:30:00").count() == 60)

    // ATTRIBUTION: strip every stat and drive the FileIndex directly with
    // ONLY a data filter — whatever prunes now is the derivation alone
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val noStats = t.dlog.addActions.values.map(_.copy(stats = None)).toSeq
    val physSchema = graft.log.ColumnMapping.physicalSchema(t.dlog.schema)
    val idx = new graft.sources.GraftFileIndex(spark, t.loc, physSchema,
      Seq("day"), noStats, spark.sessionState.newHadoopConf())
    val stamp = AttributeReference("stamp", StringType)()
    def lf(pred: Expression): Int =
      idx.listFiles(Nil, Seq(pred)).map(_.files.length).sum
    assert(lf(EqualTo(stamp,
      Literal(UTF8String.fromString("2024-03-12 08:30:00"), StringType))) == 1,
      "derived equality must prune to the one matching partition, stats-free")
    assert(lf(In(stamp, Seq("2024-03-10 08:30:00", "2024-03-14 08:30:00")
      .map(s => Literal(UTF8String.fromString(s), StringType)))) == 2,
      "derived IN must keep exactly the two matching partitions")
    // a RANGE over a string source must NOT derive — cast(string AS DATE)
    // is not monotonic in lexicographic order ("2024-1-5" > "2024-02-01")
    assert(lf(LessThanOrEqual(stamp,
      Literal(UTF8String.fromString("2024-03-11 08:30:00"), StringType))) == 5,
      "string-source ranges must not derive a partition bound")
  }

  test("cyclic shapes derive equality but never ranges") {
    val d = tempDir("genprune-month")
    val src = spark.range(240).selectExpr(
      "id",
      "timestampadd(MONTH, cast(id % 8 as int), timestamp'2024-01-15 12:00:00') AS ts")
      .coalesce(1)
    val t = DeltaTable.forPath(d)
      .withGeneratedColumn("m", "month(ts)")
      .write(src, partitionBy = Some(Seq("m")))
    val n = t.fileUris.size
    assert(n == 8, s"need 8 month partitions, got $n")
    // equality: month(L) pins exactly one partition...
    val eq = t.prunedAdds(col("ts") ===
      lit(java.sql.Timestamp.valueOf("2024-03-15 12:00:00")))
    assert(eq.size == 1, s"expected 1 month partition, got ${eq.size}")
    // ...but month is not ordered across years, so a range must not prune
    // via the partition value (footer ts stats may still prune; defeat
    // them by asking within the observed ts span)
    val prunedRange = t.prunedAdds(col("ts") >=
      lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    assert(prunedRange.size == n,
      s"cyclic month must not range-prune: ${prunedRange.size} of $n")
  }

  test("year generation supports range bounds end to end") {
    val d = tempDir("genprune-year")
    val src = spark.range(400).selectExpr(
      "id",
      "timestampadd(MONTH, cast(id % 40 as int), timestamp'2020-01-15 12:00:00') AS ts")
      .coalesce(1)
    val t = DeltaTable.forPath(d)
      .withGeneratedColumn("y", "year(ts)")
      .write(src, partitionBy = Some(Seq("y")))
    assert(t.fileUris.size == 4) // 2020..2023
    val cut = java.sql.Timestamp.valueOf("2021-06-01 00:00:00")
    val pruned = t.prunedAdds(col("ts") < lit(cut))
    assert(pruned.size == 2, s"y<=2021 should keep 2 partitions, got ${pruned.size}")
    val expect = src.filter(col("ts") < lit(cut)).count()
    assert(t.toDFWhere(spark, col("ts") < lit(cut)).count() == expect)
  }
}
