package graft

import org.apache.spark.sql.functions._

/** Optimistic-concurrency rebase for mutation commits: blind appends
  * don't abort mutations (WriteSerializable), true file-level overlap
  * and metadata changes do.
  */
class ConcurrencySpec extends SparkSuite {
  import spark.implicits._

  private def nation = spark.read.parquet(s"$sfDir/nation.parquet")

  /** Two files with disjoint key ranges, returning (dir, handle). */
  private def twoFileTable(): (String, DeltaTable) = {
    val d = tempDir("occ")
    val t = DeltaTable.forPath(d)
      .write(nation.filter(col("n_nationkey") < 10).coalesce(1))
      .write(nation.filter(col("n_nationkey") >= 10).coalesce(1))
    (d, t)
  }

  test("delete rebases over a concurrent blind append") {
    val (d, stale) = twoFileTable()
    // another writer lands an append AFTER our handle's snapshot
    DeltaTable.forPath(d).write(
      nation.withColumn("n_nationkey", col("n_nationkey") + 100).coalesce(1))
    // the stale handle's delete loses the version race, detects no
    // logical conflict, and re-commits
    val afterDelete = stale.delete(spark, Some(col("n_nationkey") < 5))
    val got = DeltaTable.forPath(d).toDF(spark)
    // base rows < 5 gone; appended rows (all >= 100) untouched
    assert(got.filter(col("n_nationkey") < 5).count() == 0)
    assert(got.filter(col("n_nationkey") >= 100).count() == nation.count())
    assert(afterDelete.version == 3L)
  }

  test("conflicting deletes on the same file abort with a logical error") {
    val (d, stale) = twoFileTable()
    DeltaTable.forPath(d).delete(spark, Some(col("n_nationkey") === 1))
    val e = intercept[java.util.ConcurrentModificationException](
      stale.delete(spark, Some(col("n_nationkey") === 2)))
    assert(e.getMessage.contains("touched"))
  }

  test("merge-on-read deletes on DISJOINT files rebase past each other") {
    val (d, stale) = twoFileTable()
    // winner DVs the high file; the stale handle's candidates (pruned by
    // stats to the low file) don't overlap
    DeltaTable.forPath(d).deleteMergeOnRead(spark, Some(col("n_nationkey") === 20))
    val merged = stale.deleteMergeOnRead(spark, Some(col("n_nationkey") === 2))
    val got = DeltaTable.forPath(d).toDF(spark)
    assert(got.count() == nation.count() - 2)
    assert(got.filter(col("n_nationkey").isin(2, 20)).count() == 0)
    assert(merged.version == 3L)
  }

  test("merge-on-read deletes on the SAME file conflict") {
    val (d, stale) = twoFileTable()
    DeltaTable.forPath(d).deleteMergeOnRead(spark, Some(col("n_nationkey") === 1))
    intercept[java.util.ConcurrentModificationException](
      stale.deleteMergeOnRead(spark, Some(col("n_nationkey") === 2)))
  }

  test("compact rebases over a concurrent append, leaving it live") {
    val (d, stale) = twoFileTable()
    DeltaTable.forPath(d).write(
      nation.withColumn("n_nationkey", col("n_nationkey") + 100).coalesce(1))
    stale.compact(spark)
    val got = DeltaTable.forPath(d).toDF(spark)
    assert(got.count() == 2 * nation.count())
  }

  test("a concurrent schema change (rename) aborts a mutation") {
    val (d, stale) = twoFileTable()
    DeltaTable.forPath(d).renameColumn("n_name", "nn")
    val e = intercept[java.util.ConcurrentModificationException](
      stale.delete(spark, Some(col("n_nationkey") === 2)))
    assert(e.getMessage.contains("metadata") || e.getMessage.contains("protocol"))
  }

  test("SERIALIZABLE: an append that may match the predicate conflicts") {
    val (d, staleBase) = twoFileTable()
    val stale = staleBase.withSerializableIsolation
    // appended keys 100..124: stats-provably OUTSIDE `< 5` → still rebases
    DeltaTable.forPath(d).write(
      nation.withColumn("n_nationkey", col("n_nationkey") + 100).coalesce(1))
    val ok = stale.delete(spark, Some(col("n_nationkey") < 5))
    assert(ok.version == 3L)
    // appended keys overlap the predicate range → serializable conflict
    val stale2 = DeltaTable.forPath(d).withSerializableIsolation
    DeltaTable.forPath(d).write(
      nation.filter(col("n_nationkey") < 3).coalesce(1))
    val e = intercept[java.util.ConcurrentModificationException](
      stale2.delete(spark, Some(col("n_nationkey") < 5)))
    assert(e.getMessage.contains("SERIALIZABLE"))
    // the same race under default WriteSerializable rebases fine
    val stale3 = DeltaTable.forPath(d)
    DeltaTable.forPath(d).write(
      nation.filter(col("n_nationkey") < 3).coalesce(1))
    assert(stale3.delete(spark, Some(col("n_nationkey") < 5)).version > stale3.version)
  }

  test("a default-isolation rewrite that may move rows into the predicate conflicts") {
    val (d, stale) = twoFileTable()
    // the winner REWRITES the low file (CoW update): its new file's stats
    // may hold rows moved into the stale delete's range — even under the
    // default WriteSerializable that must conflict (only BLIND appends
    // are exempt). The stale delete's candidates are the HIGH file, so
    // plain file overlap does NOT fire here.
    DeltaTable.forPath(d).update(spark, Some(col("n_nationkey") === 1),
      Map("n_nationkey" -> lit(18)))
    val e = intercept[java.util.ConcurrentModificationException](
      stale.delete(spark, Some(col("n_nationkey") >= 15)))
    assert(e.getMessage.contains("moved rows into"))
  }

  test("rebase classifies an update racing a same-file delete as logical") {
    val (d, stale) = twoFileTable()
    DeltaTable.forPath(d).delete(spark, Some(col("n_nationkey") === 1))
    intercept[java.util.ConcurrentModificationException](
      stale.update(spark, Some(col("n_nationkey") === 2), Map("n_name" -> lit("X"))))
  }

  test("rebase gives up after maxRebase and surfaces the raw conflict") {
    // a commit context that always loses the race: the loop must retry
    // maxRebase times (finding no winners each round, since nothing was
    // actually committed) and then surface the RAW conflict, never a
    // wrapped logical one and never an infinite loop
    object AlwaysLoses extends CommitContext {
      var calls = 0
      def write(loc: graft.storage.Location, content: String): Unit = {
        calls += 1
        throw new java.nio.file.FileAlreadyExistsException(loc.uri)
      }
    }
    val (d, _) = twoFileTable()
    val t = DeltaTable.forPath(d, commitContext = AlwaysLoses)
    intercept[java.nio.file.FileAlreadyExistsException](
      t.delete(spark, Some(col("n_nationkey") === 1)))
    assert(AlwaysLoses.calls == 6, s"expected 1 + 5 rebase attempts, got ${AlwaysLoses.calls}")
  }
}
