package graft

import graft.log.ProtocolGate
import graft.operators.Funnel
import graft.sql.GraftSql
import org.apache.spark.sql.functions._

/** Round-15 pins: `DROP FEATURE` lifecycle (the r13 verdict's last
  * missing maintenance verb), the r13 ADVICE fixes (zero-live-row
  * grouped metadata aggregates, empty-corpus funnel, out-of-range
  * table_changes timestamps, REPLACE WHERE subquery refusal).
  */
class Round15Spec extends SparkSuite {
  import spark.implicits._

  private lazy val sql = GraftSql.enable(spark)

  // ---- DROP FEATURE ----

  test("drop writer-only feature: single metadata commit, protocol downgrades") {
    val d = tempDir("dropfeat-w")
    var t = DeltaTable.forPath(d).write(Seq((1, "a"), (2, "b")).toDF("id", "s"))
    t = t.setTableProperties(Map("delta.appendOnly" -> "true"))
    assert(ProtocolGate.writerFeatures(t.dlog.currentProtocol).contains("appendOnly"))
    // unsafe while the property is on
    val e = intercept[IllegalStateException](t.dropFeature("appendOnly"))
    assert(e.getMessage.contains("delta.appendOnly"))
    t = t.setTableProperties(Map("delta.appendOnly" -> "false"))
    val before = t.version
    t = t.dropFeature("appendOnly")
    assert(t.version == before + 1) // one metadata commit, no checkpoint needed
    assert(!ProtocolGate.writerFeatures(t.dlog.currentProtocol).contains("appendOnly"))
    // the property residue is stripped with the feature
    assert(!t.tableProperties.contains("delta.appendOnly"))
    // deletes work again end-to-end
    t = t.delete(spark, Some(col("id") === 1))
    assert(t.toDF(spark).count() == 1)
    // a fresh open replays the downgraded protocol
    assert(!ProtocolGate.writerFeatures(DeltaTable.forPath(d).dlog.currentProtocol)
      .contains("appendOnly"))
  }

  test("drop reader feature: purge gate, checkpointProtection boundary, reopen") {
    val d = tempDir("dropfeat-r")
    var t = DeltaTable.forPath(d)
      .write(spark.range(0, 100).select(col("id"), (col("id") % 7).as("k")))
    // enable → write → MoR delete mints a deletion vector
    t = t.setTableProperties(Map("delta.enableDeletionVectors" -> "true"))
    t = t.deleteMergeOnRead(spark, Some(col("k") === 3))
    assert(ProtocolGate.readerFeatures(t.dlog.currentProtocol).contains("deletionVectors"))
    // refused while the property is on
    assert(intercept[IllegalStateException](t.dropFeature("deletionVectors"))
      .getMessage.contains("delta.enableDeletionVectors"))
    t = t.setTableProperties(Map("delta.enableDeletionVectors" -> "false"))
    // refused while any live file still carries a DV
    assert(intercept[IllegalStateException](t.dropFeature("deletionVectors"))
      .getMessage.contains("PURGE"))
    t = t.purge(spark)
    t = t.dropFeature("deletionVectors")
    assert(!ProtocolGate.readerFeatures(t.dlog.currentProtocol).contains("deletionVectors"))
    assert(!ProtocolGate.writerFeatures(t.dlog.currentProtocol).contains("deletionVectors"))
    // X120 protection: the drop recorded the boundary + declared the feature
    assert(ProtocolGate.writerFeatures(t.dlog.currentProtocol).contains("checkpointProtection"))
    val boundary = t.tableProperties(
      "delta.requireCheckpointProtectionBeforeVersion").toLong
    assert(boundary >= 1L && boundary <= t.version)
    // a foreign-fixture-style reopen (fresh handle, checkpoint fast path —
    // the drop wrote one) sees the dropped protocol and the right rows
    val re = DeltaTable.forPath(d)
    assert(!ProtocolGate.readerFeatures(re.dlog.currentProtocol).contains("deletionVectors"))
    assert(re.toDF(spark).count() == 86) // k==3 killed: ids 3,10,…,94 (14 rows)
    assert(re.toDF(spark).filter(col("k") === 3).count() == 0)
    // capable readers keep time travel below the boundary
    assert(re.loadAsVersion(0).toDF(spark).count() == 100)
  }

  test("DROP FEATURE … TRUNCATE HISTORY deletes the feature-bearing commits") {
    val d = tempDir("dropfeat-th")
    var t = DeltaTable.forPath(d)
      .write(spark.range(0, 50).select(col("id"), (col("id") % 5).as("k")))
    t = t.setTableProperties(Map("delta.enableDeletionVectors" -> "true"))
    t = t.deleteMergeOnRead(spark, Some(col("k") === 1))
    t = t.setTableProperties(Map("delta.enableDeletionVectors" -> "false"))
    t = t.purge(spark)
    val r = sql.sql(
      s"ALTER TABLE graft.`$d` DROP FEATURE deletionVectors TRUNCATE HISTORY")
      .collect()
    assert(r.head.getLong(0) > 0L)
    val re = DeltaTable.forPath(d)
    assert(!ProtocolGate.readerFeatures(re.dlog.currentProtocol).contains("deletionVectors"))
    // truncate = no protection residue, history below the drop is GONE
    assert(!re.tableProperties.contains(
      "delta.requireCheckpointProtectionBeforeVersion"))
    assert(re.toDF(spark).filter(col("k") === 1).count() == 0)
    assert(intercept[Exception](re.loadAsVersion(0)).getMessage.nonEmpty)
  }

  test("dropFeature refuses undeclared features and live-state drops") {
    val d = tempDir("dropfeat-x")
    val t = DeltaTable.forPath(d).write(Seq((1, "a")).toDF("id", "s"))
    assert(intercept[IllegalArgumentException](t.dropFeature("deletionVectors"))
      .getMessage.contains("not declared"))
    // clustering with live columns refuses
    var tc = t.clusterBy(Seq("id"))
    assert(intercept[IllegalStateException](tc.dropFeature("clustering"))
      .getMessage.contains("CLUSTER BY NONE"))
    tc = tc.clusterBy(Seq.empty)
    tc = tc.dropFeature("clustering")
    assert(!ProtocolGate.writerFeatures(tc.dlog.currentProtocol).contains("clustering"))
  }

  test("dropFeature aborts when a data commit lands between gate and commit") {
    // the race the strict commit exists for: the gate proves no live DV,
    // then a concurrent MoR delete mints one — a metadata-style rebase
    // would publish a protocol the snapshot contradicts; the drop must
    // conflict on ANY concurrent data commit instead
    val d = tempDir("dropfeat-race")
    var t = DeltaTable.forPath(d)
      .write(spark.range(0, 40).select(col("id"), (col("id") % 4).as("k")))
    t = t.setTableProperties(Map("delta.enableDeletionVectors" -> "true"))
    t = t.deleteMergeOnRead(spark, Some(col("k") === 1))
    t = t.setTableProperties(Map("delta.enableDeletionVectors" -> "false"))
    t = t.purge(spark)
    // stale handle passes the gate; a fresh handle then DVs a file
    val stale = t
    DeltaTable.forPath(d)
      .setTableProperties(Map("delta.enableDeletionVectors" -> "true"))
    DeltaTable.forPath(d).deleteMergeOnRead(spark, Some(col("k") === 2))
    intercept[java.util.ConcurrentModificationException](
      stale.dropFeature("deletionVectors"))
    // the feature survives, the snapshot stays honest
    val re = DeltaTable.forPath(d)
    assert(graft.log.ProtocolGate.readerFeatures(re.dlog.currentProtocol)
      .contains("deletionVectors"))
    assert(re.toDF(spark).filter(col("k") === 2).count() == 0)
  }

  test("delta.feature.<name>=supported declares the feature, never lands in config") {
    val d = tempDir("featprop")
    var t = DeltaTable.forPath(d).write(Seq((1, "a")).toDF("id", "s"))
    t = t.setTableProperties(Map(
      "delta.feature.deletionVectors" -> "supported",
      "graft.note" -> "x")) // mixed with a real config property
    val p = t.dlog.currentProtocol
    assert(ProtocolGate.readerFeatures(p).contains("deletionVectors"))
    assert(ProtocolGate.writerFeatures(p).contains("deletionVectors"))
    // the spelling is a protocol action, not configuration (delta parity)
    assert(!t.tableProperties.keys.exists(_.startsWith("delta.feature.")))
    assert(t.tableProperties.get("graft.note").contains("x"))
    // SQL surface rides the same path
    val r = sql.sql(s"ALTER TABLE graft.`$d` SET TBLPROPERTIES " +
      "('delta.feature.rowTracking' = 'supported')")
    assert(ProtocolGate.writerFeatures(
      DeltaTable.forPath(d).dlog.currentProtocol).contains("rowTracking"))
    // unknown features refused up front (declaring one we don't implement
    // would make the table unwritable by this very engine)
    val e = intercept[Exception](t.setTableProperties(
      Map("delta.feature.futureMagic" -> "supported")))
    assert(e.getMessage.contains("unknown table feature"), e.getMessage)
    // values other than supported/enabled refused
    intercept[Exception](t.setTableProperties(
      Map("delta.feature.deletionVectors" -> "maybe")))
    // full lifecycle: property-spelling enable → DROP FEATURE retires it
    val dropped = DeltaTable.forPath(d).dropFeature("rowTracking")
    assert(!ProtocolGate.writerFeatures(dropped.dlog.currentProtocol)
      .contains("rowTracking"))
  }

  test("addActions replay order: insertion-ordered, re-added paths move to the end") {
    // the O(N²) ListMap fold was replaced by a LinkedHashMap+VectorMap
    // build — this pins the ordering contract the replacement promised
    // (ListMap.updated semantics: first-insertion order, an updated key
    // moves to the END), which scan file order inherits
    import graft.log._
    val e0 = DeltaLogEntry(Vector(
      AddFile("a.parquet", Map.empty, 1L, 1L, dataChange = true),
      AddFile("b.parquet", Map.empty, 1L, 1L, dataChange = true),
      AddFile("c.parquet", Map.empty, 1L, 1L, dataChange = true)))
    // v1: re-add b (MoR-style, no remove) and kill a
    val e1 = DeltaLogEntry(Vector(
      RemoveFile("a.parquet", dataChange = true, deletionTimestamp = 2L),
      AddFile("b.parquet", Map.empty, 2L, 2L, dataChange = true)))
    val log = DeltaLog(
      graft.storage.Location(tempDir("replay-order")),
      scala.collection.immutable.SortedMap(0L -> e0, 1L -> e1))
    assert(log.addActions.keys.toSeq == Seq("c.parquet", "b.parquet"))
    assert(log.addActions("b.parquet").modificationTime == 2L)
    // same-entry remove+add of one path leaves the file live (DV re-add)
    val e2 = DeltaLogEntry(Vector(
      RemoveFile("c.parquet", dataChange = true, deletionTimestamp = 3L),
      AddFile("c.parquet", Map.empty, 3L, 3L, dataChange = true)))
    val log2 = DeltaLog(log.loc,
      scala.collection.immutable.SortedMap(0L -> e0, 1L -> e1, 2L -> e2))
    assert(log2.addActions.keys.toSeq == Seq("b.parquet", "c.parquet"))
  }

  // ---- r13 ADVICE pins ----

  test("grouped metadata aggregate skips zero-live-row partitions") {
    val d = tempDir("meta-zero-group")
    DeltaTable.forPath(d).write(
      Seq((1, "a"), (2, "a")).toDF("id", "k"), partitionBy = Some(Seq("k")))
    // a FOREIGN writer logs a numRecords==0 add for partition b (the
    // r13-ADVICE shape): a real scan emits no group for it, so the
    // metadata-only GROUP BY must omit it too, not emit (b, 0)/(b, null)
    val tmp = tempDir("meta-zero-src")
    Seq.empty[Int].toDF("id").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val destDir = new java.io.File(d, "k=b"); destDir.mkdirs()
    val dest = new java.io.File(destDir, part.getName)
    java.nio.file.Files.copy(part.toPath, dest.toPath)
    val addLine = s"""{"add":{"path":"k=b/${part.getName}","partitionValues":{"k":"b"},"size":${dest.length()},"modificationTime":${dest.lastModified()},"dataChange":true,"stats":"{\\"numRecords\\":0,\\"minValues\\":{},\\"maxValues\\":{},\\"nullCount\\":{}}"}}"""
    java.nio.file.Files.write(
      new java.io.File(d, "_delta_log/00000000000000000001.json").toPath,
      (addLine + "\n").getBytes("UTF-8"))
    val t = DeltaTable.forPath(d)
    assert(t.fileUris.exists(_.contains("k=b"))) // the zero-record add IS live
    assert(t.toDF(spark).filter(col("k") === "b").count() == 0)
    val df = t.toDF(sql).groupBy("k")
      .agg(count(lit(1)).as("n"), max(col("id")).as("mx"))
    // the rewrite must fire (LocalRelation, no scan) AND omit the b group
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LocalRelation"), plan)
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows == Map("a" -> 2L), rows.toString)
    // ungrouped COUNT over the same table still answers from the log
    val cnt = t.toDF(sql).agg(count(lit(1)).as("n"))
    assert(cnt.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
    assert(cnt.collect().head.getLong(0) == 2L)
  }

  test("funnel report degrades to zeros on an empty corpus") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val rep = Funnel.report(empty, Seq(
      "nonempty" -> (length(col("text")) > 0),
      "short" -> (length(col("text")) < 100))).collect()
    assert(rep.length == 3)
    rep.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L && r.getLong(4) == 0L)
    }
  }

  test("table_changes timestamp outside the commit range fails loudly") {
    val d = tempDir("tcrange")
    var t = DeltaTable.forPath(d).write(Seq((1, "a")).toDF("id", "s"))
    t = t.write(Seq((2, "b")).toDF("id", "s"))
    // end before the first commit: silently-empty feed was the r13 bug
    val e1 = intercept[Exception](sql.sql(
      s"SELECT * FROM table_changes('$d', 0, '1999-01-01 00:00:00')").collect())
    assert(e1.getMessage.contains("outside"), e1.getMessage)
    // start after the last commit
    val e2 = intercept[Exception](sql.sql(
      s"SELECT * FROM table_changes('$d', '2099-01-01 00:00:00')").collect())
    assert(e2.getMessage.contains("outside"), e2.getMessage)
    // in-range timestamps still resolve
    assert(sql.sql(s"SELECT * FROM table_changes('$d', 0)").count() > 0)
  }

  test("REPLACE WHERE with a subquery predicate is refused clearly") {
    val d = tempDir("rwsubq")
    DeltaTable.forPath(d).write(Seq((1, "a"), (2, "b")).toDF("id", "s"))
    val e = intercept[Exception](sql.sql(
      s"INSERT INTO graft.`$d` REPLACE WHERE id IN (SELECT 1) VALUES (9, 'z')"))
    assert(e.getMessage.contains("subqueries"), e.getMessage)
  }
}
