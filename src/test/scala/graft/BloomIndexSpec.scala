package graft

import graft.sources.{BloomIndex, DeletionVectors}
import org.apache.spark.sql.functions._

/** Per-file Bloom point-lookup index: pruning power on hash-scattered
  * layouts, hash parity between the Spark build and the driver probe,
  * coexistence with deletion vectors, negative lookups.
  */
class BloomIndexSpec extends SparkSuite {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private def nation = spark.read.parquet(s"$sfDir/nation.parquet")

  test("bloom prunes point lookups that min/max stats cannot") {
    val d = tempDir("bloom-long")
    // hash-scattered: every file's [min,max] spans the whole id domain
    var t = DeltaTable.forPath(d).write(docs.repartition(8))
    // MID-domain ids: extremes would let min/max prune and mask the point
    val all = docs.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    val ids = all.slice(all.length / 2, all.length / 2 + 3)
    val pred = col("doc_id").isin(ids.map(Long.box): _*)
    assert(t.prunedAdds(pred).size == t.fileUris.size,
      "a scattered layout must defeat min/max pruning (else this test is vacuous)")
    t = t.buildBloomIndex(spark, "doc_id")
    assert(t.history.head._2.operation == "BLOOM INDEX")
    val after = t.prunedAdds(pred).size
    assert(after < t.fileUris.size, s"bloom should prune files: kept $after")
    // the pruned scan is still exact
    assertSameRows(t.toDFWhere(spark, pred), docs.filter(pred))
    // absent key: every file provably excluded, zero rows, zero files
    val absent = col("doc_id") === lit(-12345L)
    assert(t.prunedAdds(absent).isEmpty, "absent key should prune everything")
    assert(t.toDFWhere(spark, absent).count() == 0)
  }

  test("string-column bloom: Spark xxhash64 parity with the driver probe") {
    val d = tempDir("bloom-str")
    val withSid = docs.withColumn("sid", concat(lit("id-"), col("doc_id")))
    var t = DeltaTable.forPath(d).write(withSid.repartition(8))
    t = t.buildBloomIndex(spark, "sid")
    val hit = t.prunedAdds(col("sid") === "id-17")
    assert(hit.size < t.fileUris.size && hit.nonEmpty)
    assertSameRows(t.toDFWhere(spark, col("sid") === "id-17"),
      withSid.filter(col("sid") === "id-17"))
    assert(t.prunedAdds(col("sid") === "no-such-id").isEmpty)
  }

  test("bloom coexists with deletion vectors; DV after index keeps the filter") {
    val d = tempDir("bloom-dv")
    var t = DeltaTable.forPath(d).write(nation).write(nation)
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") < 5))
    t = t.buildBloomIndex(spark, "n_nationkey")
    // the index re-add preserved the deletionVector ref (and vice versa)
    assert(t.dlog.addActions.values.exists(a =>
      DeletionVectors.refOf(a).isDefined && BloomIndex.refOf(a, "n_nationkey").isDefined))
    val expected = nation.union(nation).filter(col("n_nationkey") >= 5)
    assertSameRows(t.toDF(spark), expected)
    // a MoR delete AFTER the index keeps the bloom on the re-add
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") === 7))
    assert(t.dlog.addActions.values.forall(a =>
      BloomIndex.refOf(a, "n_nationkey").isDefined))
    assertSameRows(t.toDF(spark), expected.filter(col("n_nationkey") =!= 7))
    // index survives reopen (log JSON round-trip)
    val reopened = DeltaTable.forPath(d)
    assert(reopened.dlog.addActions.values.forall(a =>
      BloomIndex.refOf(a, "n_nationkey").isDefined))
    // dead rows stay in the filter (false-positive-only): key 7 still
    // "may contain", but the DV-aware scan returns nothing
    assert(reopened.toDFWhere(spark, col("n_nationkey") === 7).count() == 0)
  }

  test("type-coerced probes never bloom-prune (conservative on mismatch)") {
    val d = tempDir("bloom-coerce")
    var t = DeltaTable.forPath(d).write(docs.repartition(8))
    t = t.buildBloomIndex(spark, "doc_id")
    // a STRING literal against the long-indexed column: the scan coerces
    // and matches, so the probe must not hash in the literal's own domain
    // and wrongly prove absence
    assertSameRows(t.toDFWhere(spark, col("doc_id") === "101"),
      docs.filter(col("doc_id") === 101L))
    // and the honest same-type probe still prunes
    assert(t.prunedAdds(col("doc_id") === -1L).isEmpty)
  }

  test("index build is CDF-invisible and rejects unsupported columns") {
    val d = tempDir("bloom-cdf")
    var t = DeltaTable.forPath(d).write(nation)
    t = t.buildBloomIndex(spark, "n_name")
    assert(t.changesBetween(spark, 0L, 1L).count() == 0,
      "dataChange=false re-adds must not produce CDF rows")
    assertThrows[IllegalArgumentException](t.buildBloomIndex(spark, "nope"))
    val d2 = tempDir("bloom-part")
    val tp = DeltaTable.forPath(d2)
      .write(nation, partitionBy = Some(Seq("n_regionkey")))
    assertThrows[IllegalArgumentException](tp.buildBloomIndex(spark, "n_regionkey"))
  }
}
