package graft

import graft.sources.{DeletionVectors, DeltaScan}
import org.apache.spark.sql.functions._

/** Merge-on-read DELETE via deletion vectors: sidecar creation, DV-aware
  * scans, interaction with copy-on-write ops, compaction purge, vacuum
  * protection, time travel, clone.
  */
class DeletionVectorsSpec extends SparkSuite {

  private def nation = spark.read.parquet(s"$sfDir/nation.parquet")
  private def lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")

  private def dataFileCount(t: DeltaTable): Int = t.fileUris.size

  test("deleteMergeOnRead drops rows without rewriting data files") {
    val d = tempDir("dv-basic")
    var t = DeltaTable.forPath(d).write(nation).write(nation.filter(col("n_regionkey") < 3))
    val urisBefore = t.fileUris.toSet

    t = t.deleteMergeOnRead(spark, Some(col("n_regionkey") === 1))
    // same data files, re-added with a DV ref
    assert(t.fileUris.toSet == urisBefore, "MoR delete must not rewrite data files")
    val dved = t.dlog.addActions.values.filter(a => DeletionVectors.refOf(a).isDefined)
    assert(dved.nonEmpty, "touched adds should carry deletionVector refs")
    assertSameRows(t.toDF(spark),
      nation.union(nation.filter(col("n_regionkey") < 3))
        .filter(not(col("n_regionkey") === 1)))
    assert(t.history.head._2.operation == "DELETE")
  }

  test("delta.enableDeletionVectors=true writes SPEC roaring DVs foreign readers resolve") {
    val d = tempDir("dv-spec-write")
    val data = spark.range(0, 1000).toDF("id").repartition(1)
    var t = DeltaTable.forPath(d).write(data)
      .setTableProperties(Map("delta.enableDeletionVectors" -> "true"))
    t = t.deleteMergeOnRead(spark, Some(col("id") % 10 === 0))
    // 100 dead rows exceed the inline threshold: descriptor is the delta
    // wire format, file is the uuid-named .bin
    val dref = t.dlog.addActions.values.flatMap(DeletionVectors.refOf(_))
      .collectFirst { case r: DeletionVectors.DeltaRef => r }.get
    assert(dref.storageType == "u", dref.toString)
    assert(dref.cardinality == 100L)
    val bins = new java.io.File(d).listFiles()
      .filter(_.getName.startsWith("deletion_vector_")).map(_.getName)
    assert(bins.length == 1, bins.toSeq.toString)
    // scan resolves through the spec bitmap; a FRESH handle (pure log
    // replay, like a foreign reader) agrees
    assert(t.toDF(spark).count() == 900L)
    assert(DeltaTable.forPath(d).toDF(spark)
      .filter(col("id") % 10 === 0).count() == 0L)

    // re-delete merges prior dead rows into a NEW total bin
    t = t.deleteMergeOnRead(spark, Some(col("id") === 5))
    val ref2 = t.dlog.addActions.values.flatMap(DeletionVectors.refOf(_))
      .collectFirst { case r: DeletionVectors.DeltaRef => r }.get
    assert(ref2.cardinality == 101L)
    assert(DeltaTable.forPath(d).toDF(spark).count() == 899L)

    // the delta-format checkpoint carries the descriptor as a typed
    // struct (what a foreign delta reader consumes)
    t = t.checkpoint()
    val v = t.version
    val ck = spark.read.parquet(s"$d/_delta_log/" + f"$v%020d.checkpoint.parquet")
    val dvRows = ck.filter(col("add.deletionVector.storageType") === "u")
      .select("add.deletionVector.pathOrInlineDv", "add.deletionVector.cardinality")
      .collect()
    assert(dvRows.length == 1, dvRows.toSeq.toString)
    assert(dvRows.head.getLong(1) == ref2.cardinality)

    // vacuum keeps the LIVE bin, removes the superseded one
    t.vacuum(retentionMs = 0L)
    val after = new java.io.File(d).listFiles()
      .filter(_.getName.startsWith("deletion_vector_")).map(_.getName)
    assert(after.length == 1, after.toSeq.toString)
    assert(DeltaTable.forPath(d).toDF(spark).count() == 899L)
  }

  test("tiny spec DVs inline into the descriptor (no per-file .bin)") {
    val d = tempDir("dv-spec-inline")
    val data = spark.range(0, 1000).toDF("id").repartition(1)
    var t = DeltaTable.forPath(d).write(data)
      .setTableProperties(Map("delta.enableDeletionVectors" -> "true"))
    t = t.deleteMergeOnRead(spark, Some(col("id").isin(3L, 7L, 11L)))
    val dref = t.dlog.addActions.values.flatMap(DeletionVectors.refOf(_))
      .collectFirst { case r: DeletionVectors.DeltaRef => r }.get
    assert(dref.storageType == "i", dref.toString)
    assert(dref.cardinality == 3L)
    assert(new java.io.File(d).listFiles()
      .forall(!_.getName.startsWith("deletion_vector_")),
      "inline DV must not write a .bin")
    assert(DeltaTable.forPath(d).toDF(spark).count() == 997L)
    assert(DeltaTable.forPath(d).toDF(spark)
      .filter(col("id").isin(3L, 7L, 11L)).count() == 0L)
    // inline payload survives the typed checkpoint struct
    t = t.checkpoint()
    val v = t.version
    val ck = spark.read.parquet(s"$d/_delta_log/" + f"$v%020d.checkpoint.parquet")
    assert(ck.filter(col("add.deletionVector.storageType") === "i").count() == 1L)
  }

  test("re-delete merges prior dead rows: newest sidecar is total per file") {
    val d = tempDir("dv-redelete")
    var t = DeltaTable.forPath(d).write(nation)
    t = t.deleteMergeOnRead(spark, Some(col("n_regionkey") === 0))
    t = t.deleteMergeOnRead(spark, Some(col("n_regionkey") === 1))
    val expected = nation.filter(col("n_regionkey") =!= 0 && col("n_regionkey") =!= 1)
    assertSameRows(t.toDF(spark), expected)
    // every DV'd add references exactly ONE sidecar whose cardinality is
    // the file's TOTAL dead count (prior + new merged in)
    val refs = t.dlog.addActions.values.flatMap(DeletionVectors.refOf(_)).toSeq
    assert(refs.nonEmpty)
    val totalDead = refs.map(_.cardinality).sum
    assert(totalDead == nation.filter(col("n_regionkey").isin(0, 1)).count())
  }

  test("a fully-dead file leaves the log instead of carrying a 100% DV") {
    val d = tempDir("dv-fulldead")
    // two files: one entirely region 0, one mixed
    var t = DeltaTable.forPath(d)
      .write(nation.filter(col("n_regionkey") === 0))
      .write(nation.filter(col("n_regionkey") > 0))
    assert(dataFileCount(t) == 2)
    t = t.deleteMergeOnRead(spark, Some(col("n_regionkey") === 0))
    assert(dataFileCount(t) == 1, "all-dead file should be removed from the log")
    assert(t.dlog.addActions.values.forall(a => DeletionVectors.refOf(a).isEmpty),
      "surviving file was untouched; no sidecar should be written")
    assertSameRows(t.toDF(spark), nation.filter(col("n_regionkey") > 0))
  }

  test("CDF and OPTIMIZE work over spec-format vectors") {
    val d = tempDir("dv-spec-cdf")
    var t = DeltaTable.forPath(d)
      .write(spark.range(0, 1000).toDF("id").repartition(2))
      .setTableProperties(Map(
        "delta.enableDeletionVectors" -> "true",
        "delta.enableChangeDataFeed" -> "true"))
    val vProps = t.version
    t = t.deleteMergeOnRead(spark, Some(col("id") % 10 === 0))
    // the change feed renders the spec-DV delete as exactly the 100 dead
    // rows (resolved through the roaring bitmaps)
    val changes = t.changesBetween(spark, vProps, t.version)
      .filter(col("_change_type") === "delete")
    assert(changes.count() == 100L, changes.count().toString)
    assert(changes.filter(col("id") % 10 =!= 0).count() == 0L)
    // OPTIMIZE rewrites through the vectors: refs purged, rows stable
    t = t.compact(spark)
    assert(t.dlog.addActions.values
      .forall(a => DeletionVectors.refOf(a).isEmpty),
      "compaction must purge spec refs")
    assert(t.toDF(spark).count() == 900L)
    assert(DeltaTable.forPath(d).toDF(spark).count() == 900L)
  }

  test("MERGE over a spec-DV table reads through the vectors") {
    val d = tempDir("dv-spec-merge")
    var t = DeltaTable.forPath(d)
      .write(spark.range(0, 1000).toDF("id")
        .withColumn("v", col("id") * 2).repartition(1))
      .setTableProperties(Map("delta.enableDeletionVectors" -> "true"))
    t = t.deleteMergeOnRead(spark, Some(col("id") % 10 === 0))
    // source updates 50 live rows and inserts 10 new; the rewrite must
    // read THROUGH the vectors (dead rows must not resurrect)
    val src = spark.range(0, 50).toDF("id").withColumn("v", lit(-1L))
      .union(spark.range(2000, 2010).toDF("id").withColumn("v", lit(0L)))
    t = t.merge(spark, src, Seq("id"))
    val df = DeltaTable.forPath(d).toDF(spark)
    // upsert semantics: the 5 DV-dead ids among 0-49 are NOT MATCHED and
    // re-INSERT (they were deleted, so the source legitimately recreates
    // them); dead ids outside the source stay dead; matched rows update
    assert(df.count() == 900L + 5L + 10L, df.count().toString)
    assert(df.filter(col("id") < 50 && col("v") =!= -1L).count() == 0L)
    assert(df.filter(col("id") % 10 === 0 && col("id") >= 50 && col("id") < 1000)
      .count() == 0L, "dead rows outside the source must stay dead")
    assert(df.filter(col("id") >= 2000).count() == 10L)
  }

  test("v2 checkpoint round-trips spec-DV descriptors") {
    val d = tempDir("dv-spec-v2ckpt")
    var t = DeltaTable.forPath(d)
      .write(spark.range(0, 1000).toDF("id").repartition(1))
      .setTableProperties(Map(
        "delta.enableDeletionVectors" -> "true",
        "delta.checkpointPolicy" -> "v2"))
    t = t.deleteMergeOnRead(spark, Some(col("id") % 10 === 0))
    t = t.checkpoint()
    val v = t.version
    // wipe graft artifacts, BOTH pointers and the JSON log: the v2
    // manifest+sidecars are the only source of truth and must be
    // discovered by LISTING (the pointer is a hint, not a requirement)
    t.logLoc.listSorted().map(_.getPath.getName).foreach { name =>
      val graftArtifact = name.endsWith(".graft-checkpoint.parquet") ||
        name == "_last_checkpoint" ||
        name == graft.log.Checkpoint.LastCheckpointFile
      val cleanedJson = name.matches("^\\d+\\.json$")
      if (graftArtifact || cleanedJson)
        t.logLoc.fs.delete(t.logLoc.child(name).path, false)
    }
    val re = DeltaTable.forPath(d)
    assert(re.version == v)
    assert(re.toDF(spark).count() == 900L)
    assert(re.toDF(spark).filter(col("id") % 10 === 0).count() == 0L)
  }

  test("RESTORE across a MoR delete resurrects the dead rows") {
    // graft-sidecar flavor: the delete re-ADDS the same path with a DV
    // ref, so restore must re-add the PRE-delete action for paths whose
    // action changed, not just paths that disappeared
    val d = tempDir("dv-restore")
    var t = DeltaTable.forPath(d).write(nation)
    val v0 = t.version
    t = t.deleteMergeOnRead(spark, Some(col("n_regionkey") === 0))
    assert(t.toDF(spark).count() < nation.count())
    t = t.restore(v0)
    assertSameRows(t.toDF(spark), nation)

    // spec flavor
    val d2 = tempDir("dv-restore-spec")
    var t2 = DeltaTable.forPath(d2)
      .write(spark.range(0, 1000).toDF("id").repartition(1))
      .setTableProperties(Map("delta.enableDeletionVectors" -> "true"))
    val v1 = t2.version
    t2 = t2.deleteMergeOnRead(spark, Some(col("id") % 10 === 0))
    assert(t2.toDF(spark).count() == 900L)
    t2 = t2.restore(v1)
    assert(t2.toDF(spark).count() == 1000L)

    // restoring TO a DV'd version whose vector was deleted refuses
    val v2 = t2.version // post-restore (clean)
    t2 = t2.deleteMergeOnRead(spark, Some(col("id") < 200)) // "u" bin
    val vDv = t2.version
    t2 = t2.delete(spark, Some(col("id") < 500)) // CoW rewrite purges refs
    new java.io.File(d2).listFiles()
      .filter(_.getName.startsWith("deletion_vector_")).foreach(_.delete())
    val ex = intercept[IllegalStateException](
      DeltaTable.forPath(d2).restore(vDv))
    assert(ex.getMessage.contains("deletion vector"), ex.getMessage)
  }

  test("time travel reads pre-delete versions in full") {
    val d = tempDir("dv-timetravel")
    var t = DeltaTable.forPath(d).write(nation)
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") < 10))
    assertSameRows(t.loadAsVersion(0L).toDF(spark), nation)
    assertSameRows(t.toDF(spark), nation.filter(col("n_nationkey") >= 10))
  }

  test("copy-on-write delete after MoR delete reads through the vector") {
    val d = tempDir("dv-cow-after")
    var t = DeltaTable.forPath(d).write(nation)
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") === 3))
    t = t.delete(spark, Some(col("n_nationkey") === 5))
    // the rewrite purged the DV: no add carries a ref anymore
    assert(t.dlog.addActions.values.forall(a => DeletionVectors.refOf(a).isEmpty))
    assertSameRows(t.toDF(spark),
      nation.filter(col("n_nationkey") =!= 3 && col("n_nationkey") =!= 5))
  }

  test("update and merge observe MoR-deleted rows") {
    val d = tempDir("dv-update")
    var t = DeltaTable.forPath(d).write(nation)
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") < 5))
    // update must not resurrect dead rows
    t = t.update(spark, Some(col("n_nationkey") < 8), Map("n_name" -> lit("X")))
    val got = t.toDF(spark)
    assert(got.count() == nation.filter(col("n_nationkey") >= 5).count())
    assert(got.filter(col("n_name") === "X").count() == 3) // keys 5,6,7
    // merge: upsert a row whose key was MoR-deleted re-inserts exactly once
    val src = nation.filter(col("n_nationkey") === 2)
      .withColumn("n_name", lit("REBORN"))
    t = t.merge(spark, src, Seq("n_nationkey"))
    assert(t.toDF(spark).filter(col("n_nationkey") === 2).count() == 1)
  }

  test("compact purges deletion vectors; vacuum protects live sidecars") {
    val d = tempDir("dv-compact")
    var t = DeltaTable.forPath(d).write(nation).write(nation)
    t = t.deleteMergeOnRead(spark, Some(col("n_regionkey") === 4))
    val expected = nation.union(nation).filter(col("n_regionkey") =!= 4)

    // vacuum with zero retention must NOT delete the referenced sidecar
    t.vacuum(retentionMs = 0L)
    assertSameRows(t.toDF(spark), expected)

    t = t.compact(spark)
    assert(t.dlog.addActions.values.forall(a => DeletionVectors.refOf(a).isEmpty),
      "compaction should purge vectors")
    assertSameRows(t.toDF(spark), expected)

    // now the sidecar is unreferenced: vacuum reclaims it
    val deleted = t.vacuum(retentionMs = 0L)
    assert(deleted.exists(_.contains(DeletionVectors.DvDirName)),
      s"expected sidecar reclaim, got $deleted")
    assertSameRows(t.toDF(spark), expected)
  }

  test("clone re-points sidecar refs; MoR table survives cloning") {
    val d = tempDir("dv-clone-src")
    var t = DeltaTable.forPath(d).write(nation)
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") >= 20))
    val c = t.cloneTo(tempDir("dv-clone-dst"))
    assertSameRows(c.toDF(spark), nation.filter(col("n_nationkey") < 20))
    // the clone is independently deletable (writes its own sidecar)
    val c2 = c.deleteMergeOnRead(spark, Some(col("n_nationkey") === 0))
    assertSameRows(c2.toDF(spark),
      nation.filter(col("n_nationkey") < 20 && col("n_nationkey") =!= 0))
  }

  test("MoR delete on a partitioned table prunes candidate files") {
    val d = tempDir("dv-part")
    var t = DeltaTable.forPath(d)
      .write(lineitem, partitionBy = Some(Seq("l_returnflag")))
    val before = t.fileUris.toSet
    t = t.deleteMergeOnRead(spark, Some(col("l_returnflag") === "R" && col("l_quantity") < 10))
    assert(t.fileUris.toSet == before)
    // only files of the R partition may carry refs
    val dved = t.dlog.addActions.values.filter(a => DeletionVectors.refOf(a).isDefined)
    assert(dved.forall(_.partitionValues.get("l_returnflag").flatten.contains("R")))
    assertSameRows(t.toDF(spark),
      lineitem.filter(not(col("l_returnflag") === "R" && col("l_quantity") < 10)))
  }

  test("DV scan plan: clean tables stay join-free, DV'd files broadcast the dead set") {
    val d = tempDir("dv-plan")
    var t = DeltaTable.forPath(d).write(nation)
    val cleanPlan = t.toDF(spark).queryExecution.executedPlan.toString
    assert(!cleanPlan.contains("Join"), "clean scan must not contain a join")
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") === 0))
    val dvPlan = t.toDF(spark).queryExecution.executedPlan.toString
    assert(dvPlan.contains("BroadcastHashJoin") && dvPlan.contains("LeftAnti"),
      s"DV scan should broadcast-anti-join the dead set:\n$dvPlan")
  }

  test("mergeMergeOnRead ≡ copy-on-write merge, without rewriting target files") {
    val updates = nation.filter(col("n_nationkey") % 5 === 0)
      .withColumn("n_name", lit("UPD"))
    val inserts = nation.filter(col("n_nationkey") < 3)
      .withColumn("n_nationkey", col("n_nationkey") + 100)
    val src = updates.union(inserts)

    var tm = DeltaTable.forPath(tempDir("dv-merge-mor")).write(nation)
    val before = tm.fileUris.toSet
    tm = tm.mergeMergeOnRead(spark, src, Seq("n_nationkey"))
    val tc = DeltaTable.forPath(tempDir("dv-merge-cow")).write(nation)
      .merge(spark, src, Seq("n_nationkey"))
    assertSameRows(tm.toDF(spark), tc.toDF(spark))
    // the original target files were NOT rewritten — marked, not copied
    assert(before.subsetOf(tm.fileUris.toSet),
      "merge-on-read merge must keep original data files live")
    assert(tm.history.head._2.operation == "MERGE")
  }

  test("mergeMergeOnRead CDF: exact delete + insert channels") {
    var t = DeltaTable.forPath(tempDir("dv-merge-cdf")).write(nation)
    val src = nation.filter(col("n_nationkey").isin(1, 2))
      .withColumn("n_name", lit("X"))
    t = t.mergeMergeOnRead(spark, src, Seq("n_nationkey"))
    val c = t.changesBetween(spark, 0L, 1L)
    assertSameRows(c.filter(col("_change_type") === "delete")
        .drop("_commit_version", "_change_type"),
      nation.filter(col("n_nationkey").isin(1, 2)))
    assertSameRows(c.filter(col("_change_type") === "insert")
        .drop("_commit_version", "_change_type"), src)
  }

  test("mergeMergeOnRead reads through existing vectors") {
    var t = DeltaTable.forPath(tempDir("dv-merge-after")).write(nation)
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") < 5))
    // key 2 is dead: the source row is an INSERT, exactly once
    val src = nation.filter(col("n_nationkey") === 2)
      .withColumn("n_name", lit("REBORN"))
    t = t.mergeMergeOnRead(spark, src, Seq("n_nationkey"))
    assert(t.toDF(spark).filter(col("n_nationkey") === 2).count() == 1)
    assertSameRows(t.toDF(spark),
      nation.filter(col("n_nationkey") >= 5).union(src))
  }

  test("updateMergeOnRead ≡ copy-on-write update; CDF = preimage/postimage") {
    var tm = DeltaTable.forPath(tempDir("dv-upd-mor")).write(nation)
    val before = tm.fileUris.toSet
    tm = tm.updateMergeOnRead(spark, Some(col("n_nationkey") < 8),
      Map("n_name" -> lit("U")))
    val tc = DeltaTable.forPath(tempDir("dv-upd-cow")).write(nation)
      .update(spark, Some(col("n_nationkey") < 8), Map("n_name" -> lit("U")))
    assertSameRows(tm.toDF(spark), tc.toDF(spark))
    assert(before.subsetOf(tm.fileUris.toSet), "no touched file may be rewritten")
    val c = tm.changesBetween(spark, 0L, 1L)
    assertSameRows(c.filter(col("_change_type") === "delete")
        .drop("_commit_version", "_change_type"),
      nation.filter(col("n_nationkey") < 8))
    assertSameRows(c.filter(col("_change_type") === "insert")
        .drop("_commit_version", "_change_type"),
      nation.filter(col("n_nationkey") < 8).withColumn("n_name", lit("U")))
    // unmatched predicate: metadata-only commit, no empty file written
    val files = tm.fileUris.size
    val t2 = tm.updateMergeOnRead(spark, Some(col("n_nationkey") === -1),
      Map("n_name" -> lit("Z")))
    assert(t2.fileUris.size == files)
    assertSameRows(t2.toDF(spark), tm.toDF(spark))
  }

  test("countRowsFromStats: metadata-only count through DVs and rewrites") {
    var t = DeltaTable.forPath(tempDir("dv-count")).write(nation).write(nation)
    assert(t.countRowsFromStats.contains(50L))
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") < 5)) // 2x5 rows die
    assert(t.countRowsFromStats.contains(40L))
    assert(t.countRowsFromStats.contains(t.toDF(spark).count()))
    t = t.delete(spark, Some(col("n_regionkey") === 0)) // CoW rewrite
    assert(t.countRowsFromStats.contains(t.toDF(spark).count()))
    t = t.mergeMergeOnRead(spark,
      nation.filter(col("n_nationkey") === 20).withColumn("n_name", lit("M")),
      Seq("n_nationkey"))
    assert(t.countRowsFromStats.contains(t.toDF(spark).count()))
  }

  test("minMaxFromStats: exact on clean snapshots, refuses DV'd ones") {
    var t = DeltaTable.forPath(tempDir("dv-minmax")).write(nation).write(nation)
    assert(t.minMaxFromStats("n_nationkey").contains((0L, 24L)))
    // strings are out of scope (truncated foreign maxima, UTF-16 vs UTF-8
    // ordering): must fall back, never answer
    assert(t.minMaxFromStats("n_name").isEmpty)
    assert(t.minMaxFromStats("nope").isEmpty)
    // NaN poisons footer FP stats; the fast path must refuse, not return
    // a non-NaN max that disagrees with SELECT MAX
    val spark2 = spark
    import spark2.implicits._
    val withNaN = Seq(1.0, Double.NaN, 2.0).toDF("x")
    val tn = DeltaTable.forPath(tempDir("dv-minmax-nan")).write(withNaN)
    assert(tn.minMaxFromStats("x").isEmpty,
      s"NaN column must refuse the fast path, got ${tn.minMaxFromStats("x")}")
    // a dead row may hold the extreme: DV'd snapshots must fall back
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") === 24))
    assert(t.minMaxFromStats("n_nationkey").isEmpty)
    // the CoW rewrite purges the vector; stats are authoritative again
    t = t.delete(spark, Some(col("n_nationkey") === 23))
    assert(t.minMaxFromStats("n_nationkey").contains((0L, 22L)))
  }

  test("DV refs survive the checkpoint fast path") {
    val d = tempDir("dv-checkpoint")
    var t = DeltaTable.forPath(d).copy(checkpointInterval = 2)
    t = t.write(nation).write(nation)
    t = t.deleteMergeOnRead(spark, Some(col("n_regionkey") === 2))
    // force at least one checkpoint at-or-after the DV commit
    t = t.write(nation.limit(0))
    assert(graft.storage.Location(s"$d/_delta_log", t.conf)
      .child(graft.log.Checkpoint.LastCheckpointFile).exists,
      "expected a checkpoint to have been taken")
    // reopen head via the checkpoint fast path: ref must still be applied
    val reopened = DeltaTable.forPath(d)
    assert(reopened.dlog.addActions.values.exists(a =>
      DeletionVectors.refOf(a).isDefined), "ref lost through checkpoint")
    assertSameRows(reopened.toDF(spark),
      nation.union(nation).filter(col("n_regionkey") =!= 2))
  }

  test("changesBetween emits EXACT delete rows for MoR deletes") {
    val d = tempDir("dv-cdf")
    var t = DeltaTable.forPath(d).write(nation)
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") < 10))
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") < 15))
    // v1: delete rows = exactly keys 0-9, no inserts
    val c1 = t.changesBetween(spark, 0L, 1L)
    assertSameRows(c1.filter(col("_change_type") === "delete")
        .drop("_commit_version", "_change_type"),
      nation.filter(col("n_nationkey") < 10))
    assert(c1.filter(col("_change_type") === "insert").count() == 0)
    // v2: only the NEWLY dead keys 10-14 — 0-9 are not re-reported
    val c2 = t.changesBetween(spark, 1L, 2L)
    assertSameRows(c2.filter(col("_change_type") === "delete")
        .drop("_commit_version", "_change_type"),
      nation.filter(col("n_nationkey") >= 10 && col("n_nationkey") < 15))

    // CoW rewrite of a DV'd file: remove_file reads through the
    // pre-commit vector (dead rows don't reappear), insert = kept rows
    t = t.delete(spark, Some(col("n_nationkey") === 20))
    val c3 = t.changesBetween(spark, 2L, 3L)
    assertSameRows(c3.filter(col("_change_type") === "remove_file")
        .drop("_commit_version", "_change_type"),
      nation.filter(col("n_nationkey") >= 15))
    assertSameRows(c3.filter(col("_change_type") === "insert")
        .drop("_commit_version", "_change_type"),
      nation.filter(col("n_nationkey") >= 15 && col("n_nationkey") =!= 20))

    // a MoR delete that kills a file's every remaining row removes the
    // file — but its surviving rows are still row-level DELETEs in CDF
    t = t.deleteMergeOnRead(spark)
    val c4 = t.changesBetween(spark, 3L, 4L)
    assertSameRows(c4.filter(col("_change_type") === "delete")
        .drop("_commit_version", "_change_type"),
      nation.filter(col("n_nationkey") >= 15 && col("n_nationkey") =!= 20))
    assert(c4.filter(col("_change_type") === "remove_file").count() == 0)
  }
}
