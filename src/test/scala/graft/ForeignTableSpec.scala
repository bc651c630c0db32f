package graft

import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Replay of the vendored foreign-conventions fixture
  * (`src/test/resources/foreign-delta-table`, written once by
  * `tools.ForeignFixtureGen` — see its scaladoc): column-mapping `name`
  * mode, a delta-SPEC roaring-bitmap deletion vector (storageType "u"),
  * a classic checkpoint carrying the DV descriptor as a typed struct and
  * a `txn` action, under a reader-3/writer-7 table-features protocol.
  * The recorded answers (127 live rows, Σid = 8169, Σvalue = 4084.5 —
  * 130 rows minus DV'd ids 70/71/75) were computed at generation time.
  *
  * Analogue of the reference's vendored delta-spark compatibility table
  * (reference tests/test_compatibility_spark.py:35-77).
  */
class ForeignTableSpec extends SparkSuite {

  /** Copy the committed fixture into a scratch dir (tests must not write
    * into test-classes) and return its path.
    */
  private def fixtureDir(): String = {
    val src = Paths.get(getClass.getResource("/foreign-delta-table").toURI)
    val dst = Files.createTempDirectory("foreign-table")
    Files.walk(src).forEach { p =>
      val rel = src.relativize(p)
      val target = dst.resolve(rel.toString)
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else Files.copy(p, target, StandardCopyOption.REPLACE_EXISTING)
    }
    dst.toString
  }

  test("foreign fixture: name-mode scan, stats prune, spec-DV resolution") {
    val t = DeltaTable.forPath(fixtureDir())
    assert(t.version == 2L)
    val df = t.toDF(spark)
    // logical names bind through the name-mode mapping
    assert(df.columns.toSeq == Seq("id", "name", "value"))
    assert(df.count() == 127L)
    val r = df.agg(sum("id"), sum("value")).head()
    assert(r.getLong(0) == 8169L, r.toString)
    assert(math.abs(r.getDouble(1) - 4084.5) < 1e-9, r.toString)
    // the roaring-bitmap DV kills exactly rows 0,1,5 of the third file
    assert(df.filter(col("id").isin(70L, 71L, 75L)).count() == 0L)
    assert(df.filter(col("id").isin(72L, 76L)).count() == 2L)
    // stats pruning binds the logical predicate to physical stats keys
    assert(t.prunedAdds(col("id") >= 100L).size == 1)
    assert(t.prunedAdds(col("id") < 40L).size == 1)
    // time travel to the pre-delete pre-append CTAS state
    assert(t.loadAsVersion(0L).toDF(spark).count() == 100L)
  }

  test("foreign fixture: classic checkpoint is authoritative when JSON is cleaned") {
    val d = fixtureDir()
    // wipe every JSON commit — the classic checkpoint + _last_checkpoint
    // become the only source of truth (a log-cleaned foreign table)
    val log = Paths.get(d, "_delta_log")
    Files.list(log).forEach { p =>
      if (p.getFileName.toString.endsWith(".json")) Files.delete(p)
    }
    val t = DeltaTable.forPath(d)
    assert(t.version == 2L)
    val df = t.toDF(spark)
    assert(df.count() == 127L)
    assert(df.agg(sum("id")).head().getLong(0) == 8169L)
    // the DV descriptor survived the typed checkpoint struct round trip
    assert(df.filter(col("id").isin(70L, 71L, 75L)).count() == 0L)
    // the txn action (idempotent-sink watermark) survived the checkpoint
    val txns = t.dlog.entries.values.flatMap(_.actions).collect {
      case tx: graft.log.Txn => tx
    }
    assert(txns.exists(tx => tx.appId == "foreign-app" && tx.version == 7L),
      txns.toString)
  }

  test("roaring DV codec: round trips across container kinds; reads runs") {
    import graft.sources.RoaringBitmaps
    // array container (sparse), bitmap container (>4096 per 16-bit
    // chunk), multiple 32-bit keys (64-bit values)
    val sparse = Array(0L, 1L, 5L, 65536L, 65600L)
    val dense = (0L until 5000L).map(_ * 2).toArray // 5000 > 4096 → bitmap
    val highKey = Array(0L, (1L << 32) | 7L, (5L << 32) | 123456L)
    for (vs <- Seq(sparse, dense, highKey))
      assert(RoaringBitmaps.decodeBlob(RoaringBitmaps.encodeBlob(vs)).sameElements(vs))

    // run containers (written by delta's RoaringBitmapArray for dense
    // ranges): hand-build SERIAL_COOKIE bytes and decode
    val bb = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(RoaringBitmaps.Magic)
    bb.putLong(1L) // one bitmap
    bb.putInt(0)   // key 0
    bb.putInt(12347 | (0 << 16)) // SERIAL_COOKIE, 1 container
    bb.put(1.toByte) // run bitset: container 0 is runs
    bb.putShort(0.toShort) // container key
    bb.putShort(5.toShort) // cardinality-1 (6 values)
    bb.putShort(2.toShort) // 2 runs
    bb.putShort(10.toShort); bb.putShort(2.toShort) // 10,11,12
    bb.putShort(100.toShort); bb.putShort(2.toShort) // 100,101,102
    val runBytes = java.util.Arrays.copyOf(bb.array(), bb.position())
    assert(RoaringBitmaps.decodeBlob(runBytes)
      .sameElements(Array(10L, 11L, 12L, 100L, 101L, 102L)))

    // Z85 uuid round trip
    val u = java.util.UUID.randomUUID()
    assert(RoaringBitmaps.Z85.decodeUuid(RoaringBitmaps.Z85.encodeUuid(u)) == u)

    // seeded fuzz across container-regime boundaries (cardinalities
    // straddling 4096, multi-bucket 64-bit values)
    val rng = new scala.util.Random(42)
    (1 to 50).foreach { i =>
      val n = rng.nextInt(6000) + 1
      val vs = Array.fill(n)(rng.nextLong() & 0x3FFFFFFFFL).distinct.sorted
      assert(RoaringBitmaps.decodeBlob(RoaringBitmaps.encodeBlob(vs)).sameElements(vs),
        s"fuzz case $i (n=$n)")
    }
  }

  test("foreign fixture: soft and deep clones carry the spec DV") {
    val d = fixtureDir()
    val t = DeltaTable.forPath(d)
    // soft clone: the uuid-relative "u" ref is rewritten to an absolute
    // "p" ref at the SOURCE (uuid naming would dangle under the clone
    // root) — dead rows stay dead through the shared file
    val soft = t.cloneTo(Files.createTempDirectory("foreign-soft").toString)
    assert(soft.toDF(spark).count() == 127L)
    assert(soft.toDF(spark).filter(col("id").isin(70L, 71L, 75L)).count() == 0L)
    val softRef = soft.dlog.addActions.values
      .flatMap(graft.sources.DeletionVectors.refOf(_))
      .collectFirst { case r: graft.sources.DeletionVectors.DeltaRef => r }.get
    assert(softRef.storageType == "p", softRef.toString)
    // deep clone: the .bin copies into the clone root under the SAME
    // relative uuid naming, so the "u" ref survives verbatim
    val deepDir = Files.createTempDirectory("foreign-deep").toString
    val deep = t.deepCloneTo(spark, deepDir)
    assert(deep.toDF(spark).count() == 127L)
    assert(Files.exists(Paths.get(deepDir,
      "deletion_vector_01234567-89ab-cdef-fedc-ba9876543210.bin")),
      "deep clone must copy the DV file")
    // clone stays correct after the SOURCE is destroyed
    val log = Paths.get(d)
    Files.walk(log).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    assert(DeltaTable.forPath(deepDir).toDF(spark).count() == 127L)
  }

  test("foreign fixture: vacuum keeps the referenced DV file") {
    val d = fixtureDir()
    val t = DeltaTable.forPath(d)
    t.vacuum(retentionMs = 0L)
    assert(Files.exists(Paths.get(d,
      "deletion_vector_01234567-89ab-cdef-fedc-ba9876543210.bin")),
      "vacuum must not delete a live delta-spec DV file")
    assert(t.toDF(spark).count() == 127L)
  }

  // ---- scenario 4: the SECOND vendored fixture (id mode + V2 checkpoint
  // + inline DV), written by tools.ForeignFixtureGenV2 — recorded answers
  // 117 live rows (120 minus inline-DV'd ids 40/42/44), Σid = 7014,
  // Σvalue = 1753.5 ----

  private def fixtureV2Dir(): String = {
    val src = Paths.get(getClass.getResource("/foreign-delta-table-v2").toURI)
    val dst = Files.createTempDirectory("foreign-table-v2")
    Files.walk(src).forEach { p =>
      val rel = src.relativize(p)
      val target = dst.resolve(rel.toString)
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else Files.copy(p, target, StandardCopyOption.REPLACE_EXISTING)
    }
    dst.toString
  }

  test("foreign v2 fixture: id-mode scan, stats prune, inline-DV resolution") {
    val t = DeltaTable.forPath(fixtureV2Dir())
    assert(t.version == 2L)
    val df = t.toDF(spark)
    // logical names bind through the id-mode mapping (files carry both
    // parquet field ids and col-<uuid> physical names, like delta-spark)
    assert(df.columns.toSeq == Seq("id", "txt", "value"))
    assert(df.count() == 117L)
    val r = df.agg(sum("id"), sum("value")).head()
    assert(r.getLong(0) == 7014L, r.toString)
    assert(math.abs(r.getDouble(1) - 1753.5) < 1e-9, r.toString)
    // the INLINE ("i") roaring DV kills exactly rows 0,2,4 of file 1
    assert(df.filter(col("id").isin(40L, 42L, 44L)).count() == 0L)
    assert(df.filter(col("id").isin(41L, 43L, 45L)).count() == 3L)
    // stats pruning binds logical predicates to the physical stats keys
    assert(t.prunedAdds(col("id") >= 80L).size == 1)
    assert(t.prunedAdds(col("id") < 40L).size == 1)
    // time travel to the pre-delete CTAS state
    assert(t.loadAsVersion(0L).toDF(spark).count() == 80L)
    // the protocol declares v2Checkpoint — a feature this engine supports
    val p = t.dlog.entries.values.flatMap(_.actions).collectFirst {
      case pr: graft.log.Protocol => pr
    }.get
    assert(graft.log.ProtocolGate.readerFeatures(p).contains("v2Checkpoint"))
  }

  test("foreign v2 fixture: UUID-manifest checkpoint + foreign sidecars are authoritative") {
    val d = fixtureV2Dir()
    // wipe every JSON commit — the V2 manifest, its two foreign-named
    // sidecars under _delta_log/_sidecars/, and _last_checkpoint become
    // the only source of truth (a log-cleaned foreign table)
    val log = Paths.get(d, "_delta_log")
    Files.list(log).forEach { p =>
      if (p.getFileName.toString.endsWith(".json")) Files.delete(p)
    }
    val t = DeltaTable.forPath(d)
    assert(t.version == 2L)
    val df = t.toDF(spark)
    assert(df.count() == 117L)
    assert(df.agg(sum("id")).head().getLong(0) == 7014L)
    // the inline-DV descriptor survived the sidecar struct round trip
    assert(df.filter(col("id").isin(40L, 42L, 44L)).count() == 0L)
    // id-mode mapping still binds from the checkpointed metaData
    assert(df.columns.toSeq == Seq("id", "txt", "value"))
    // the txn watermark rode the manifest (idempotent sinks keep working
    // against a log-cleaned table)
    val txns = t.dlog.entries.values.flatMap(_.actions).collect {
      case tx: graft.log.Txn => tx
    }
    assert(txns.exists(tx => tx.appId == "foreign-v2-app" && tx.version == 9L),
      txns.toString)
    // and a commit ON TOP of the checkpoint-only state still works
    val t2 = t.delete(spark, Some(col("id") >= 115L))
    assert(t2.toDF(spark).count() == 112L)
  }

  // ---- scenario 5: the THIRD vendored fixture (ICT + rowTracking with
  // a materialized row-id column + domainMetadata, foreign field order),
  // written by tools.ForeignFixtureGenV3 — recorded answers: 120 rows,
  // Σid = 7140, Σamt = 3570.0, Σ_row_id = 9140, ICTs 1720000000100/200/
  // 300, rowIdHighWaterMark 219 ----

  private def fixtureV3Dir(): String = {
    val src = Paths.get(getClass.getResource("/foreign-delta-table-v3").toURI)
    val dst = Files.createTempDirectory("foreign-table-v3")
    Files.walk(src).forEach { p =>
      val rel = src.relativize(p)
      val target = dst.resolve(rel.toString)
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else Files.copy(p, target, StandardCopyOption.REPLACE_EXISTING)
    }
    dst.toString
  }

  test("foreign v3 fixture: ICT clock, materialized row ids, domain replay") {
    val t = DeltaTable.forPath(fixtureV3Dir())
    assert(t.version == 2L)
    val df = t.toDF(spark)
    // the materialized row-id parquet column is NOT in the logical schema
    assert(df.columns.toSeq == Seq("id", "cat", "amt"))
    assert(df.count() == 120L)
    val r = df.agg(sum("id"), sum("amt")).head()
    assert(r.getLong(0) == 7140L, r.toString)
    assert(math.abs(r.getDouble(1) - 3570.0) < 1e-9, r.toString)
    // row ids: the foreign OPTIMIZE physically re-ordered the 100
    // compacted rows, so base + position would be WRONG for them — the
    // materialized column must win (delta's resolution order); the
    // appended file has no materialized column and falls back to
    // base(200) + position
    val ids = t.toDFWithRowIds(spark)
    assert(ids.agg(sum("_row_id")).head().getLong(0) == 9140L)
    assert(ids.filter(col("id") === 7L).head().getAs[Long]("_row_id") == 7L)
    assert(ids.filter(col("id") === 105L).head().getAs[Long]("_row_id") == 205L)
    assert(ids.filter(col("_row_id") =!= col("id")).count() == 20L)
    // the ICT clock is authoritative: the legacy timestamp field LAGS it
    // in this fixture, so history/timestampAsOf must read inCommitTimestamp
    assert(t.history.map(_._2.effectiveTimestamp) ==
      Seq(1720000000300L, 1720000000200L, 1720000000100L))
    assert(t.versionAt(1720000000250L) == 1L)
    assert(t.versionAt(1720000000100L) == 0L)
    // domain replay: latest config wins, the removed domain stays hidden
    assert(t.domainMetadata.get("foreign.pipeline")
      .contains("""{"stage":"silver"}"""))
    assert(!t.domainMetadata.contains("foreign.retention"))
    assert(graft.log.RowTracking.highWaterMark(t.dlog) == 219L)
  }

  test("foreign v3 fixture: checkpoint-only replay keeps row ids, domains, " +
      "the txn and the ICT clock; fresh writes allocate above the HWM") {
    val d = fixtureV3Dir()
    val log = Paths.get(d, "_delta_log")
    Files.list(log).forEach { p =>
      if (p.getFileName.toString.endsWith(".json")) Files.delete(p)
    }
    val t = DeltaTable.forPath(d)
    assert(t.version == 2L)
    // the checkpoint's TYPED baseRowId/defaultRowCommitVersion columns
    // survived the schema-less replay — row ids identical to the JSON path
    val ids = t.toDFWithRowIds(spark)
    assert(ids.count() == 120L)
    assert(ids.agg(sum("_row_id")).head().getLong(0) == 9140L)
    // domains, txn watermark and the rowTracking HWM rode the checkpoint
    assert(t.domainMetadata.get("foreign.pipeline")
      .contains("""{"stage":"silver"}"""))
    assert(!t.domainMetadata.contains("foreign.retention"))
    val txns = t.dlog.entries.values.flatMap(_.actions).collect {
      case tx: graft.log.Txn => tx
    }
    assert(txns.exists(tx => tx.appId == "foreign-v3-app" && tx.version == 4L))
    assert(graft.log.RowTracking.highWaterMark(t.dlog) == 219L)
    // a fresh engine append on top: new rows allocate ABOVE the foreign
    // high-water mark, and the commit keeps recording inCommitTimestamp
    // (the table's config demands it)
    import spark.implicits._
    val t2 = t.write(Seq((200L, "c0", 100.0), (201L, "c1", 100.5))
      .toDF("id", "cat", "amt"))
    val newAdd = t2.dlog.entries(3L).actions.collectFirst {
      case a: graft.log.AddFile => a
    }.get
    assert(newAdd.baseRowId.contains(220L), newAdd.baseRowId.toString)
    assert(graft.log.RowTracking.highWaterMark(t2.dlog) == 221L)
    val newCommit = t2.dlog.entries(3L).commitInfos.last
    assert(newCommit.extra.contains("inCommitTimestamp"), newCommit.toString)
    assert(newCommit.effectiveTimestamp > 1720000000300L)
    val ids2 = t2.toDFWithRowIds(spark)
    assert(ids2.filter(col("id") === 200L).head().getAs[Long]("_row_id") == 220L)
    assert(ids2.filter(col("id") === 201L).head().getAs[Long]("_row_id") == 221L)
  }

  // ---- scenario 6: the FOURTH vendored fixture (r13-verdict #7) — a V2
  // checkpoint with foreign-named sidecars PLUS a multi-part classic
  // fallback at the same version, under checkpointProtection; written by
  // tools.ForeignFixtureGenV4 — recorded answers: 70 live rows (ids
  // 0..29 ∪ 60..79 ∪ 120..139), Σid = 4415, Σamt = 1103.75, v0 = 80 rows ----

  private def fixtureV4Dir(): String = {
    val src = Paths.get(getClass.getResource("/foreign-delta-table-v4").toURI)
    val dst = Files.createTempDirectory("foreign-table-v4")
    Files.walk(src).forEach { p =>
      val rel = src.relativize(p)
      val target = dst.resolve(rel.toString)
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else Files.copy(p, target, StandardCopyOption.REPLACE_EXISTING)
    }
    dst.toString
  }

  private def assertV4State(t: DeltaTable): Unit = {
    assert(t.version == 1L)
    val df = t.toDF(spark)
    assert(df.count() == 70L)
    val r = df.agg(sum("id"), sum("amt")).head()
    assert(r.getLong(0) == 4415L, r.toString)
    assert(math.abs(r.getDouble(1) - 1103.75) < 1e-9, r.toString)
    assert(df.filter(col("id").between(30L, 59L)).count() == 0L) // F1 removed
    assert(t.domainMetadata.get("foreign.quality")
      .contains("""{"tier":"gold"}"""))
    // checkpointProtection rode in: feature declared, boundary live
    assert(graft.log.ProtocolGate.writerFeatures(t.dlog.currentProtocol)
      .contains("checkpointProtection"))
    assert(t.tableProperties.get(
      "delta.requireCheckpointProtectionBeforeVersion").contains("1"))
  }

  test("foreign v4 fixture: JSON replay, then multi-part classic checkpoint-only") {
    val d = fixtureV4Dir()
    assertV4State(DeltaTable.forPath(d)) // full JSON replay first
    // wipe the JSON log: the reader must pick the CLASSIC multi-part form
    // (graft's documented preference) and replay identical state
    val log = Paths.get(d, "_delta_log")
    Files.list(log).forEach { p =>
      if (p.getFileName.toString.endsWith(".json")) Files.delete(p)
    }
    val t = DeltaTable.forPath(d)
    assertV4State(t)
    // a graft commit on top of the checkpoint-only state keeps the
    // protocol (checkpointProtection must survive the metadata rewrite)
    import spark.implicits._
    val t2 = t.write(Seq((500L, 125.0)).toDF("id", "amt"))
    assert(t2.toDF(spark).count() == 71L)
    assert(graft.log.ProtocolGate.writerFeatures(t2.dlog.currentProtocol)
      .contains("checkpointProtection"))
  }

  test("foreign v4 fixture: V2 manifest + foreign sidecars when the classic parts are gone") {
    val d = fixtureV4Dir()
    val log = Paths.get(d, "_delta_log")
    Files.list(log).forEach { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".json") ||
          n.matches("\\d{20}\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet"))
        Files.delete(p)
    }
    assertV4State(DeltaTable.forPath(d))
    // a missing sidecar is a LOUD corrupt-checkpoint error, not a silent
    // partial snapshot
    Files.list(log.resolve("_sidecars")).forEach(p => Files.delete(p))
    val e = intercept[Exception](DeltaTable.forPath(d).toDF(spark).count())
    assert(e.getMessage.contains("sidecar"), e.getMessage)
  }

  test("foreign v4 fixture: an incomplete multi-part checkpoint fails loudly") {
    val d = fixtureV4Dir()
    val log = Paths.get(d, "_delta_log")
    // drop the JSON log, the v2 manifest AND one classic part: the
    // declared part count (2) no longer matches — replaying the remaining
    // part would silently drop table state
    Files.list(log).forEach { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".json") ||
          n.matches("\\d{20}\\.checkpoint\\.[0-9a-f-]{36}\\.parquet") ||
          n.endsWith(".checkpoint.0000000002.0000000002.parquet"))
        Files.delete(p)
    }
    val e = intercept[Exception](DeltaTable.forPath(d).toDF(spark).count())
    assert(e.getMessage.contains("incomplete") ||
      e.getMessage.contains("corrupt"), e.getMessage)
  }
}
