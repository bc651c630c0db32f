package graft

import org.apache.spark.sql.functions._

/** OPTIMIZE / VACUUM / changesBetween semantics. */
class MaintenanceSpec extends SparkSuite {

  private def nation = spark.read.parquet(s"$sfDir/nation.parquet")

  test("compact merges multi-file partitions without changing rows") {
    val d = tempDir("compact")
    var t = DeltaTable.forPath(d)
      .write(nation).write(nation).write(nation) // 3 files
    val before = t.fileUris.size
    val rows = t.toDF(spark).count()
    t = t.compact(spark)
    assert(t.history.head._2.operation == "OPTIMIZE")
    assert(t.fileUris.size < before)
    assert(t.toDF(spark).count() == rows)
    // pre-compaction versions still time-travel (files not deleted)
    assert(t.loadAsVersion(1L).toDF(spark).count() == rows / 3 * 2)
  }

  test("compact on a partitioned table keeps partition layout") {
    val d = tempDir("compact-part")
    var t = DeltaTable.forPath(d)
      .write(nation, partitionBy = Some(Seq("n_regionkey")))
    t = t.write(nation)
    val rows = t.toDF(spark).count()
    t = t.compact(spark)
    assert(t.partitionColumns == Seq("n_regionkey"))
    assertSameRows(t.toDF(spark),
      nation.union(nation))
    assert(t.toDF(spark).count() == rows)
  }

  test("sorted compaction makes min/max pruning selective") {
    val d = tempDir("zorder")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").repartition(8)
    var t = DeltaTable.forPath(d).write(li)
    // hash layout: every file spans the full key range, nothing prunes
    val before = t.prunedAdds(col("l_orderkey") < 50).size
    assert(before == t.fileUris.size)
    t = t.compact(spark, sortBy = Seq("l_orderkey"), targetFiles = 8)
    val after = t.prunedAdds(col("l_orderkey") < 50).size
    assert(after < t.fileUris.size, s"expected pruning after sort: $after")
    assertSameRows(t.toDF(spark), li)
  }

  test("vacuum removes only unreferenced files past retention") {
    val d = tempDir("vacuum")
    var t = DeltaTable.forPath(d).write(nation)
    t = t.write(nation.filter(col("n_regionkey") === 0), mode = graft.log.WriteMode.Overwrite)
    // dry run with zero retention lists the overwritten (dead) file(s)
    val deletable = t.vacuum(retentionMs = 0L, dryRun = true)
    assert(deletable.nonEmpty)
    val liveCount = t.toDF(spark).count()
    val deleted = t.vacuum(retentionMs = 0L)
    assert(deleted.toSet == deletable.toSet)
    // current snapshot unaffected; time travel to v0 now broken by design
    assert(DeltaTable.forPath(d).toDF(spark).count() == liveCount)
    val v0 = DeltaTable.forPath(d).loadAsVersion(0L)
    // collect, not count: the metadata-only aggregate rule answers a bare
    // count from log stats without opening the (vacuumed) files
    intercept[Exception] { v0.toDF(spark).collect() }
  }

  test("vacuum LITE reclaims exactly the log's expired tombstones, no listing") {
    val d = tempDir("vacuum-lite")
    var t = DeltaTable.forPath(d).write(nation)
    t = t.write(nation.filter(col("n_regionkey") === 0),
      mode = graft.log.WriteMode.Overwrite)
    // a stranded file NO commit knows about: full vacuum's domain, never
    // lite's (lite derives candidates from tombstones, not a listing)
    val stranded = new java.io.File(d, "stranded-not-in-log.parquet")
    java.nio.file.Files.write(stranded.toPath, Array[Byte](1, 2, 3))
    // backdate: with retentionMs=0 the cutoff is "now", and a same-
    // millisecond mtime ties the `<` comparison (observed flake)
    stranded.setLastModified(System.currentTimeMillis() - 10000L)
    val full = t.vacuum(retentionMs = 0L, dryRun = true).toSet
    val lite = t.vacuumLite(retentionMs = 0L, dryRun = true).toSet
    assert(lite.nonEmpty)
    assert(lite.forall(full.contains), "lite must be a subset of full vacuum")
    assert(!lite.exists(_.contains("stranded-not-in-log")),
      "lite must not see files outside the log")
    assert(full.exists(_.contains("stranded-not-in-log")),
      "full vacuum should see the stranded file (listing-based)")
    // retention honored: fresh tombstones are not eligible
    assert(t.vacuumLite(retentionMs = 3600L * 1000, dryRun = true).isEmpty)
    val deleted = t.vacuumLite(retentionMs = 0L)
    assert(deleted.toSet == lite)
    deleted.foreach(u => assert(
      !new java.io.File(new java.net.URI(u).getPath).exists(), s"$u not deleted"))
    // live snapshot unaffected; a second lite pass is a no-op (retry-safe)
    assert(DeltaTable.forPath(d).toDF(spark).count() == t.toDF(spark).count())
    t.vacuumLite(retentionMs = 0L)
  }

  test("vacuum LITE ages a re-added file from its LATEST death") {
    val d = tempDir("vacuum-lite-readd")
    var t = DeltaTable.forPath(d).write(nation)
    val original = t.fileUris.toSet
    // remove everything (overwrite), then soft-re-add the original file
    // via restore, then remove again — two tombstones for one path
    t = t.write(nation.filter(col("n_nationkey") < 5),
      mode = graft.log.WriteMode.Overwrite)
    t = t.restore(0L)
    t = t.write(nation.filter(col("n_nationkey") >= 20),
      mode = graft.log.WriteMode.Overwrite)
    val lite = t.vacuumLite(retentionMs = 0L, dryRun = true).toSet
    assert(original.forall(lite.contains),
      "twice-removed file must be reclaimable once dead and expired")
    // live files never appear even with tombstones present
    val live = t.fileUris.toSet
    assert(lite.intersect(live).isEmpty)
  }

  test("compact WHERE scopes to matching partitions only") {
    val d = tempDir("compact-where")
    var t = DeltaTable.forPath(d)
      .write(nation, partitionBy = Some(Seq("n_regionkey")))
    t = t.write(nation) // 2 files per region
    val beforeByRegion = t.dlog.addActions.values.toSeq
      .groupBy(_.partitionValues("n_regionkey")).view.mapValues(_.size).toMap
    assert(beforeByRegion.values.forall(_ == 2))
    t = t.compact(spark, where = Some(col("n_regionkey") === 0))
    val afterByRegion = t.dlog.addActions.values.toSeq
      .groupBy(_.partitionValues("n_regionkey")).view.mapValues(_.size).toMap
    // only region 0 compacted; every other partition's files untouched
    assert(afterByRegion(Some("0")) == 1)
    assert(afterByRegion.filterNot(_._1 == Some("0")).values.forall(_ == 2))
    assertSameRows(t.toDF(spark), nation.union(nation))
    // data-column predicates are rejected: compaction is file-level
    intercept[IllegalArgumentException](
      t.compact(spark, where = Some(col("n_nationkey") < 5)))
  }

  test("purge rewrites exactly the DV-debt files, dataChange=false") {
    val d = tempDir("purge")
    var t = DeltaTable.forPath(d)
      .write(nation.filter(col("n_nationkey") < 10).coalesce(1))
    t = t.write(nation.filter(col("n_nationkey") >= 10).coalesce(1))
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") === 3))
    val cleanPaths = t.dlog.addActions.values
      .filter(a => graft.sources.DeletionVectors.refOf(a).isEmpty)
      .map(_.path).toSet
    assert(cleanPaths.nonEmpty && cleanPaths.size < t.fileUris.size)
    val live = t.toDF(spark).collect().toSet
    t = t.purge(spark)
    // only the DV'd file was rewritten; the clean file kept its path
    assert(cleanPaths.subsetOf(t.dlog.addActions.keySet))
    assert(t.dlog.addActions.values.forall(a =>
      graft.sources.DeletionVectors.refOf(a).isEmpty))
    assert(t.toDF(spark).collect().toSet == live)
    val (_, ci) = t.history.head
    assert(ci.operation == "REORG")
    assert(ci.operationMetrics.get("numDeletionVectorRowsPurged")
      .exists(_.asLong == 1L))
    // dataChange=false: the strict append-only stream passes it (no abort)
    assert(t.purge(spark) eq t) // no remaining debt: purge is a no-op
  }

  test("purge WHERE scopes to matching partitions; dropped columns rewritten") {
    val d = tempDir("purge-where")
    var t = DeltaTable.forPath(d)
      .write(nation.coalesce(1), partitionBy = Some(Seq("n_regionkey")))
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") === 0)) // region 0
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") === 1)) // region 1
    t = t.purge(spark, where = Some(col("n_regionkey") === 0))
    val dvByRegion = t.dlog.addActions.values
      .filter(a => graft.sources.DeletionVectors.refOf(a).isDefined)
      .map(_.partitionValues("n_regionkey")).toSeq
    assert(dvByRegion == Seq(Some("1")), s"region 1's debt must survive: $dvByRegion")
    assert(t.toDF(spark).count() == 23)

    // metadata-only DROP leaves the bytes in old files; purge rewrites them
    val d2 = tempDir("purge-drop")
    var t2 = DeltaTable.forPath(d2).write(nation.coalesce(1))
    t2 = t2.dropColumn("n_name")
    t2 = t2.write(t2.toDF(spark).limit(5).coalesce(1)) // post-drop file: clean
    val postDropPaths = t2.dlog.addActions.keySet --
      t2.loadAsVersion(1L).dlog.addActions.keySet
    val rows = t2.toDF(spark).collect().toSet
    t2 = t2.purge(spark)
    assert(postDropPaths.subsetOf(t2.dlog.addActions.keySet),
      "file written after the drop must not be rewritten")
    assert((t2.loadAsVersion(1L).dlog.addActions.keySet --
      t2.dlog.addActions.keySet).nonEmpty, "pre-drop file must be rewritten")
    assert(t2.toDF(spark).collect().toSet == rows)
    // the dropped physical column is genuinely gone from every live footer
    val allowed = graft.log.ColumnMapping
      .physicalSchema(t2.dlog.schema).fieldNames.toSet
    t2.fileUris.foreach { u =>
      val fields = spark.read.parquet(u).schema.fieldNames.toSet
      assert(fields.subsetOf(allowed), s"$u still carries $fields")
    }
    assert(t2.purge(spark) eq t2)
  }

  test("enableChangeDataFeed: UPDATE streams exact pre/postimage rows") {
    val d = tempDir("cdc-update")
    var t = DeltaTable.forPath(d).write(nation.coalesce(1))
      .setTableProperties(Map("delta.enableChangeDataFeed" -> "true"))
    val v0 = t.version
    t = t.update(spark, Some(col("n_nationkey") < 3),
      Map("n_regionkey" -> (col("n_regionkey") + lit(100))))
    val ch = t.changesBetween(spark, v0, t.version)
      .select("n_nationkey", "n_regionkey", "_change_type")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    // EXACTLY the 3 matched rows, twice — not the 25-row rewritten file
    assert(ch.size == 6, s"expected 3 pre + 3 post rows, got $ch")
    assert(ch.count(_._3 == "update_preimage") == 3)
    val nat = nation.select("n_nationkey", "n_regionkey")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    (0 to 2).foreach { k =>
      assert(ch.contains((k, nat(k), "update_preimage")))
      assert(ch.contains((k, nat(k) + 100, "update_postimage")))
    }
    // the cdc action is in the log, dataChange=false, under _change_data/
    val cdcActs = t.dlog.entries(t.version).actions
      .collect { case c: graft.log.AddCDCFile => c }
    assert(cdcActs.nonEmpty && cdcActs.forall(_.path.startsWith("_change_data/")))
    // table state is unaffected by cdc actions (not adds)
    assert(t.toDF(spark).count() == 25)
    // without the property the feed falls back to file-level
    // reconstruction (insert + remove_file of the rewritten file)
    val d2 = tempDir("cdc-update-off")
    var t2 = DeltaTable.forPath(d2).write(nation.coalesce(1))
    t2 = t2.update(spark, Some(col("n_nationkey") < 3),
      Map("n_regionkey" -> (col("n_regionkey") + lit(100))))
    val types2 = t2.changesBetween(spark, 0L, t2.version)
      .select("_change_type").distinct().collect().map(_.getString(0)).toSet
    assert(!types2.contains("update_preimage"), types2.toString)
  }

  test("enableChangeDataFeed: copy-on-write DELETE streams exact delete rows") {
    val d = tempDir("cdc-delete")
    var t = DeltaTable.forPath(d).write(nation.coalesce(1))
      .setTableProperties(Map("delta.enableChangeDataFeed" -> "true"))
    val v0 = t.version
    t = t.delete(spark, Some(col("n_nationkey") < 3))
    val ch = t.changesBetween(spark, v0, t.version)
      .select("n_nationkey", "_change_type")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    // EXACTLY the 3 matched rows as `delete` — no insert/remove_file
    // noise from the 25-row file rewrite
    assert(ch == Set((0, "delete"), (1, "delete"), (2, "delete")), ch)
    assert(t.toDF(spark).count() == 22)
    // a no-predicate truncate stays cdc-free (delta's metadata-only
    // delete): the feed reconstructs it through the remove_file channel
    val v1 = t.version
    t = t.delete(spark, None)
    val types = t.changesBetween(spark, v1, t.version)
      .select("_change_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set("remove_file"), types.toString)
    assert(t.dlog.entries(t.version).actions
      .collect { case c: graft.log.AddCDCFile => c }.isEmpty)
  }

  test("enableChangeDataFeed: merge-on-read UPDATE streams the same pre/post contract") {
    val d = tempDir("cdc-mor-update")
    var t = DeltaTable.forPath(d).write(nation.coalesce(1))
      .setTableProperties(Map("delta.enableChangeDataFeed" -> "true"))
    val v0 = t.version
    t = t.updateMergeOnRead(spark, Some(col("n_nationkey") === 7),
      Map("n_regionkey" -> lit(99)))
    val ch = t.changesBetween(spark, v0, t.version)
      .select("n_nationkey", "n_regionkey", "_change_type")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    val old = nation.filter(col("n_nationkey") === 7)
      .select("n_regionkey").head().getInt(0)
    assert(ch == Set((7, old, "update_preimage"), (7, 99, "update_postimage")), ch)
    // table state: the MoR DV + new file semantics are unchanged by cdc
    assert(t.toDF(spark).count() == 25)
    assert(t.toDF(spark).filter(col("n_nationkey") === 7)
      .head().getAs[Int]("n_regionkey") == 99)
  }

  test("enableChangeDataFeed: MERGE streams update pre/post and insert rows") {
    val d = tempDir("cdc-merge")
    var t = DeltaTable.forPath(d)
      .write(nation.filter(col("n_nationkey") < 10).coalesce(1))
      .setTableProperties(Map("delta.enableChangeDataFeed" -> "true"))
    val v0 = t.version
    val source = nation.filter(col("n_nationkey").isin(8, 9, 10, 11))
      .withColumn("n_regionkey", col("n_regionkey") + lit(50))
    t = t.merge(spark, source, Seq("n_nationkey"))
    val ch = t.changesBetween(spark, v0, t.version)
      .select("n_nationkey", "_change_type")
      .collect().map(r => (r.getInt(0), r.getString(1)))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(ch("update_preimage") == Set(8, 9))
    assert(ch("update_postimage") == Set(8, 9))
    assert(ch("insert") == Set(10, 11))
    // vacuum ages change-data files out (never "live", pure retention)
    Thread.sleep(5)
    val deleted = t.vacuum(retentionMs = -1000L)
    assert(deleted.exists(_.contains("_change_data/")),
      s"cdc files must age out under vacuum: $deleted")
  }

  test("vacuum honors delta.deletedFileRetentionDuration") {
    val d = tempDir("vacuum-prop")
    var t = DeltaTable.forPath(d).write(nation)
    t = t.write(nation.filter(col("n_regionkey") === 0),
      mode = graft.log.WriteMode.Overwrite)
    // a 1-week property: nothing deletable yet through the DEFAULT path
    t = t.setTableProperties(
      Map("delta.deletedFileRetentionDuration" -> "interval 1 weeks"))
    assert(t.vacuum(dryRun = true).isEmpty)
    // 0 seconds: the overwritten file ages out immediately
    t = t.setTableProperties(
      Map("delta.deletedFileRetentionDuration" -> "interval 0 seconds"))
    assert(t.vacuum(dryRun = true).nonEmpty)
    // unparseable property fails loudly, never silently defaults
    val bad = t.setTableProperties(
      Map("delta.deletedFileRetentionDuration" -> "sieben Tage"))
    intercept[IllegalArgumentException](bad.vacuum(dryRun = true))
    assert(DeltaTable.parseRetentionInterval("interval 2 days") ==
      2L * 24 * 3600 * 1000)
  }

  test("restoreToTimestamp resolves like versionAt") {
    val d = tempDir("restore-ts")
    var t = DeltaTable.forPath(d).write(nation)
    Thread.sleep(10)
    t = t.write(nation)
    val ts0 = t.history.last._2.timestamp // v0 commit time
    t = t.restoreToTimestamp(ts0)
    assertSameRows(t.toDF(spark), nation)
    assert(t.history.head._2.operation == graft.log.CommitInfo.Op.Restore)
  }

  test("no-match delete commits metrics-zero entry and keeps all files") {
    val d = tempDir("del-nomatch")
    val t0 = DeltaTable.forPath(d).write(nation)
    val files = t0.fileUris.toSet
    val t1 = t0.delete(spark, Some(col("n_nationkey") === -999))
    assert(t1.version == 1L)
    assert(t1.fileUris.toSet == files)
    val m = t1.history.head._2.operationMetrics
    assert(m("num_deleted_rows").asLong() == 0L)
    assert(m("num_removed_files").asLong() == 0L)
    assertSameRows(t1.toDF(spark), nation)
  }

  test("restore to the current version is a no-op diff") {
    val d = tempDir("restore-noop")
    val t0 = DeltaTable.forPath(d).write(nation)
    val t1 = t0.restore(0L)
    assert(t1.version == 1L)
    assertSameRows(t1.toDF(spark), nation)
  }

  test("changesBetween yields inserts per version and skips compaction") {
    val d = tempDir("cdf")
    var t = DeltaTable.forPath(d).write(nation)
    t = t.write(nation.filter(col("n_regionkey") === 1))
    t = t.compact(spark)
    val ch = t.changesBetween(spark, -1L, t.version)
    val byType = ch.groupBy("_change_type", "_commit_version").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(byType(("insert", 0L)) == nation.count())
    assert(byType(("insert", 1L)) == nation.filter(col("n_regionkey") === 1).count())
    // the OPTIMIZE commit (v2) contributes no change rows
    assert(!byType.keys.exists(_._2 == 2L))
    // delete produces remove_file rows for the rewritten file's old content
    val t2 = t.delete(spark, Some(col("n_regionkey") === 2))
    val ch2 = t2.changesBetween(spark, t.version, t2.version)
    assert(ch2.filter(col("_change_type") === "remove_file").count() > 0)
  }
}
