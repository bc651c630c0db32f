package graft

import graft.log._
import org.apache.spark.sql.functions.col

/** Protocol version/feature gating + delta.appendOnly enforcement
  * (ProtocolGate): the forward-compatibility safety surface delta-spark
  * and delta-rs enforce and the reference only round-trips.
  */
class ProtocolSpec extends SparkSuite {

  private def nationDF = spark.read.parquet(s"$sfDir/nation.parquet")

  /** Commit a raw protocol action, bypassing the writer gate (stands in
    * for a FUTURE engine writing a table this engine must then refuse).
    */
  private def rawProtocolCommit(dir: String, p: Protocol): Unit = {
    val t = DeltaTable.forPath(dir)
    t.dlog.commit(DeltaLogEntry(Vector(p,
      CommitInfo.metaOp(CommitInfo.Op.UpgradeProtocol, Map.empty, t.version))))
  }

  private def features(names: String*): com.fasterxml.jackson.databind.JsonNode =
    Json.arr(names.map(Json.text))

  test("reader gate: unsupported reader feature refuses to open") {
    val d = tempDir("gate-reader")
    DeltaTable.forPath(d).write(nationDF)
    rawProtocolCommit(d, Protocol(3, 7, Map(
      "readerFeatures" -> features("vacuumProtocolCheck"),
      "writerFeatures" -> features("vacuumProtocolCheck"))))
    val e = intercept[IllegalStateException](DeltaTable.forPath(d))
    assert(e.getMessage.contains("vacuumProtocolCheck"))
    // version beyond the spec's current max: also refused
    val d2 = tempDir("gate-reader-v99")
    DeltaTable.forPath(d2).write(nationDF)
    rawProtocolCommit(d2, Protocol(99, 99))
    assert(intercept[IllegalStateException](DeltaTable.forPath(d2))
      .getMessage.contains("minReaderVersion 99"))
  }

  test("writer gate: readable-but-unwritable feature blocks commits only") {
    val d = tempDir("gate-writer")
    DeltaTable.forPath(d).write(nationDF)
    rawProtocolCommit(d, Protocol(3, 7, Map(
      "readerFeatures" -> features("deletionVectors"),
      "writerFeatures" -> features("deletionVectors", "icebergCompatV2"))))
    val t = DeltaTable.forPath(d) // opens fine: reader features all supported
    assert(t.toDF(spark).count() == nationDF.count())
    val e = intercept[IllegalStateException](t.write(nationDF))
    assert(e.getMessage.contains("icebergCompatV2"))
    intercept[IllegalStateException](
      t.delete(spark, Some(col("n_nationkey") < 5)))
  }

  test("writer gate: invariants use-gated; foreign identity columns maintained") {
    import org.apache.spark.sql.types._
    val d = tempDir("gate-identity")
    var t = DeltaTable.forPath(d).write(nationDF)
    // splice identity metadata into the schema the way a foreign writer
    // that owns the feature would
    val meta = t.dlog.latestMetadata.get
    val idField = StructField("row_id", LongType, nullable = true,
      metadata = org.apache.spark.sql.types.Metadata
        .fromJson("""{"delta.identity.start":1}"""))
    val newSchema = StructType(t.schema.fields :+ idField)
    t.dlog.commit(DeltaLogEntry(Vector(
      meta.copy(schemaString = newSchema.json),
      CommitInfo.metaOp(CommitInfo.Op.SetProperties, Map.empty, t.version))))
    val reopened = DeltaTable.forPath(d) // legacy protocol still opens
    // GENERATED ALWAYS: explicit values are rejected (the foreign spec
    // set no allowExplicitInsert)…
    val withId = nationDF.withColumn("row_id",
      org.apache.spark.sql.functions.lit(1L))
    assert(intercept[IllegalArgumentException](reopened.write(withId))
      .getMessage.contains("GENERATED ALWAYS"))
    // …while an omitting write ALLOCATES and advances the foreign mark —
    // this engine now maintains identity high-water marks
    val t2 = reopened.write(nationDF)
    val sp = graft.log.Identity.specs(t2.schema)("row_id")
    assert(sp.highWaterMark.contains(nationDF.count()))

    // schema invariants (delta.invariants) are ENFORCED, not use-gated:
    // a violating write is rejected row-precisely, a conforming one lands
    val d2 = tempDir("gate-invariants")
    val t3 = DeltaTable.forPath(d2).write(nationDF)
    val meta3 = t3.dlog.latestMetadata.get
    val invField = StructField("n_nationkey", IntegerType, nullable = true,
      metadata = org.apache.spark.sql.types.Metadata.fromJson(
        """{"delta.invariants":"{\"expression\":{\"expression\":\"n_nationkey > 0\"}}"}"""))
    val invSchema = StructType(t3.schema.fields.map(f =>
      if (f.name == "n_nationkey") invField else f))
    t3.dlog.commit(DeltaLogEntry(Vector(
      meta3.copy(schemaString = invSchema.json),
      CommitInfo.metaOp(CommitInfo.Op.SetProperties, Map.empty, t3.version))))
    // nation holds n_nationkey = 0 — violates the foreign invariant
    val exInv = intercept[IllegalArgumentException](
      DeltaTable.forPath(d2).write(nationDF))
    assert(exInv.getMessage.contains("invariant on n_nationkey"), exInv.getMessage)
    // a conforming batch is writable (the old gate refused the whole table)
    val t4 = DeltaTable.forPath(d2)
      .write(nationDF.filter(org.apache.spark.sql.functions.col("n_nationkey") > 0))
    assert(t4.toDF(spark).count() == nationDF.count() * 2 - 1)
  }

  test("nested invariants enforced; malformed invariants refuse the write") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{col, struct, lit, when}
    val base = spark.range(1, 6).select(col("id"),
      struct((col("id") * 10).cast("int").as("x"),
        col("id").cast("int").as("y")).as("s"))

    // nested-field invariant (s.x > 0), spliced the way a foreign
    // delta-spark writer records it — on the NESTED field's metadata
    val d = tempDir("nested-invariant")
    val t = DeltaTable.forPath(d).write(base)
    val meta = t.dlog.latestMetadata.get
    def withNestedMeta(metaJson: String): StructType = {
      val inner = StructType(Seq(
        StructField("x", IntegerType, nullable = true,
          metadata = Metadata.fromJson(metaJson)),
        StructField("y", IntegerType, nullable = true)))
      StructType(t.schema.fields.map(f =>
        if (f.name == "s") StructField("s", inner, f.nullable) else f))
    }
    t.dlog.commit(DeltaLogEntry(Vector(
      meta.copy(schemaString = withNestedMeta(
        """{"delta.invariants":"{\"expression\":{\"expression\":\"s.x > 0\"}}"}""").json),
      CommitInfo.metaOp(CommitInfo.Op.SetProperties, Map.empty, t.version))))
    val bad = spark.range(1, 3).select(col("id"),
      struct(lit(0).cast("int").as("x"), lit(1).cast("int").as("y")).as("s"))
    val ex = intercept[IllegalArgumentException](DeltaTable.forPath(d).write(bad))
    assert(ex.getMessage.contains("invariant on s.x"), ex.getMessage)
    val t2 = DeltaTable.forPath(d).write(base) // conforming batch lands
    assert(t2.toDF(spark).count() == 10)

    // malformed invariant JSON: the write is REFUSED (the pre-enforcement
    // gate's behavior), never silently unenforced
    val d2 = tempDir("malformed-invariant")
    val t3 = DeltaTable.forPath(d2).write(base)
    val meta3 = t3.dlog.latestMetadata.get
    t3.dlog.commit(DeltaLogEntry(Vector(
      meta3.copy(schemaString = withNestedMeta(
        """{"delta.invariants":"not json at all"}""").json),
      CommitInfo.metaOp(CommitInfo.Op.SetProperties, Map.empty, t3.version))))
    val exM = intercept[IllegalArgumentException](DeltaTable.forPath(d2).write(base))
    assert(exM.getMessage.contains("cannot parse"), exM.getMessage)
  }

  test("nested NOT NULL enforced only under non-null ancestors") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{col, struct, lit, when}
    val base = spark.range(1, 6).select(col("id"),
      struct(col("id").cast("int").as("x")).as("s"))
    val d = tempDir("nested-notnull")
    val t = DeltaTable.forPath(d).write(base)
    val meta = t.dlog.latestMetadata.get
    val schema = StructType(t.schema.fields.map(f =>
      if (f.name == "s")
        StructField("s", StructType(Seq(
          StructField("x", IntegerType, nullable = false))), nullable = true)
      else f))
    t.dlog.commit(DeltaLogEntry(Vector(
      meta.copy(schemaString = schema.json),
      CommitInfo.metaOp(CommitInfo.Op.SetProperties, Map.empty, t.version))))
    // UPDATE setting s.x to null under a non-null parent → violation
    // (the update path's scan frames are nullable-declared, so the ROW
    // check — not the append-time schema gate — is what fires)
    val ex = intercept[IllegalArgumentException](
      DeltaTable.forPath(d).update(spark, Some(col("id") === 1),
        Map("s" -> struct(lit(null).cast("int").as("x")))))
    assert(ex.getMessage.contains("NOT NULL on s.x"), ex.getMessage)
    // s itself set to null (nullable parent) → no child to check, lands
    val t2 = DeltaTable.forPath(d).update(spark, Some(col("id") === 1),
      Map("s" -> lit(null).cast(schema("s").dataType)))
    assert(t2.toDF(spark).filter(col("s").isNull).count() == 1)
  }

  test("appendOnly: mutations rejected, appends and OPTIMIZE pass") {
    val d = tempDir("append-only")
    var t = DeltaTable.forPath(d).write(nationDF)
      .setTableProperties(Map("delta.appendOnly" -> "true"))
    assert(t.tableProperties("delta.appendOnly") == "true")
    t = t.write(nationDF) // appends stay legal
    assert(t.toDF(spark).count() == 2 * nationDF.count())
    assert(intercept[IllegalStateException](
      t.delete(spark, Some(col("n_nationkey") < 5)))
      .getMessage.contains("only allows appends"))
    intercept[IllegalStateException](
      t.update(spark, Some(col("n_nationkey") < 5),
        Map("n_comment" -> org.apache.spark.sql.functions.lit("x"))))
    intercept[IllegalStateException](
      t.write(nationDF, mode = WriteMode.Overwrite))
    // merge-on-read delete kills rows via DV re-adds, not removes —
    // must be caught by the dataChange-DV-add arm of the guard
    intercept[IllegalStateException](
      t.deleteMergeOnRead(spark, Some(col("n_nationkey") < 5)))
    // OPTIMIZE rewrites with dataChange=false — legal on append-only
    // tables, as in delta
    t = t.compact(spark)
    assert(t.toDF(spark).count() == 2 * nationDF.count())
    // unsetting the property restores mutations
    t = t.unsetTableProperties(Seq("delta.appendOnly"))
    t = t.delete(spark, Some(col("n_nationkey") < 5))
    assert(t.toDF(spark).filter(col("n_nationkey") < 5).count() == 0)
  }

  test("MoR delete bumps protocol to (3,7)+deletionVectors exactly once") {
    val d = tempDir("dv-bump")
    var t = DeltaTable.forPath(d).write(nationDF)
    assert(t.dlog.currentProtocol == Protocol(1, 2))
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") < 5))
    val p = t.dlog.currentProtocol
    assert(p.minReaderVersion == 3 && p.minWriterVersion == 7)
    assert(ProtocolGate.readerFeatures(p) == Set("deletionVectors"))
    // legacy writer-2 features ride along so the jump to v7 drops nothing
    assert(ProtocolGate.writerFeatures(p) ==
      Set("appendOnly", "invariants", "deletionVectors"))
    val protocolActions = t.dlog.entries.values
      .flatMap(_.actions.collect { case pp: Protocol => pp }).toSeq
    assert(protocolActions.count(_.minWriterVersion == 7) == 1)
    // second MoR mutation: no second bump
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") >= 20))
    assert(t.dlog.entries.values
      .flatMap(_.actions.collect { case pp: Protocol => pp })
      .count(_.minWriterVersion == 7) == 1)
    // the bumped table reopens and reads correctly (gate passes: we
    // implement deletionVectors)
    val re = DeltaTable.forPath(d)
    assert(re.toDF(spark).filter(col("n_nationkey") < 5).count() == 0)
  }

  test("feature lists survive the delta-format checkpoint round trip") {
    val d = tempDir("dv-ckpt-protocol")
    var t = DeltaTable.forPath(d).write(nationDF)
      .deleteMergeOnRead(spark, Some(col("n_nationkey") < 5))
    t = t.checkpoint()
    val entry = Checkpoint.readDeltaFormat(t.logLoc, t.version, t.conf).get
    val p = entry.actions.collectFirst { case pp: Protocol => pp }.get
    assert(p.minReaderVersion == 3 && p.minWriterVersion == 7)
    assert(ProtocolGate.readerFeatures(p) == Set("deletionVectors"))
    assert(ProtocolGate.writerFeatures(p).contains("deletionVectors"))
    // and the cleaned-log reopen through the delta checkpoint still
    // enforces + satisfies the gate
    t = t.cleanupLog()
    assert(DeltaTable.forPath(d).dlog.currentProtocol.minReaderVersion == 3)
  }

  test("upgradeProtocol: explicit upgrades, no downgrades, no foot-guns") {
    val d = tempDir("upgrade")
    var t = DeltaTable.forPath(d).write(nationDF)
    t = t.upgradeProtocol(3, 7,
      readerFeatures = Set("deletionVectors"),
      writerFeatures = Set("deletionVectors", "checkConstraints"))
    val p = t.dlog.currentProtocol
    assert(p.minReaderVersion == 3 && p.minWriterVersion == 7)
    // legacy-implied writer-2 features were unioned in
    assert(ProtocolGate.writerFeatures(p).contains("appendOnly"))
    assert(DeltaTable.forPath(d).version == t.version) // reopens fine
    intercept[IllegalArgumentException](t.upgradeProtocol(1, 2)) // downgrade
    // upgrading into a protocol we could no longer write is refused
    intercept[IllegalStateException](
      t.upgradeProtocol(3, 7, writerFeatures = Set("icebergCompatV2")))
    t = t.write(nationDF) // still writable after a legal upgrade
    assert(t.toDF(spark).count() == 2 * nationDF.count())
  }

  test("protocol-version table properties upgrade through the gate") {
    val d = tempDir("proto-props")
    var t = DeltaTable.forPath(d).write(nationDF)
    t = t.setTableProperties(Map(
      "delta.minWriterVersion" -> "3", "team.x" -> "1"))
    // the protocol keys became a protocol action, never configuration
    assert(t.dlog.currentProtocol.minWriterVersion == 3)
    assert(t.tableProperties("team.x") == "1")
    assert(!t.tableProperties.contains("delta.minWriterVersion"))
    // downgrades go through the same upgrade gate and are rejected
    intercept[IllegalArgumentException](
      t.setTableProperties(Map("delta.minWriterVersion" -> "2")))
  }

  test("delta.checkpointInterval property drives auto-checkpoint cadence") {
    val d = tempDir("ckpt-interval")
    var t = DeltaTable.forPath(d).write(nationDF) // v0
    t = t.setTableProperties(Map("delta.checkpointInterval" -> "3")) // v1
    t = t.write(nationDF) // v2
    assert(Checkpoint.lastCheckpointVersion(t.logLoc).isEmpty)
    t = t.write(nationDF) // v3: property cadence (3), not the handle's 10
    assert(Checkpoint.lastCheckpointVersion(t.logLoc).contains(3L))
  }

  test("setTableProperties guards its dedicated-surface keys") {
    val d = tempDir("props-guard")
    val t = DeltaTable.forPath(d).write(nationDF)
    intercept[IllegalArgumentException](
      t.setTableProperties(Map("delta.constraints.c" -> "n_nationkey > 0")))
    intercept[IllegalArgumentException](
      t.setTableProperties(Map(ColumnMapping.ModeConfigKey -> "name")))
    // arbitrary properties round-trip through the log
    val t2 = t.setTableProperties(Map("team.owner" -> "data-eng"))
    assert(DeltaTable.forPath(d).tableProperties("team.owner") == "data-eng")
    assert(t2.history.head._2.operation == CommitInfo.Op.SetProperties)
  }
}
