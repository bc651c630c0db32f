package graft

import graft.log.{ColumnMapping, WriteMode}
import org.apache.spark.sql.functions._

/** Column mapping: RENAME/DROP COLUMN without data rewrite — scans,
  * writes, mutations, skipping, bloom, checkpoints, and the
  * dropped-column-resurrection hazard.
  */
class ColumnMappingSpec extends SparkSuite {
  import spark.implicits._

  private def nation = spark.read.parquet(s"$sfDir/nation.parquet")

  test("id-mode foreign table: reads bind, writes stamp parquet field ids, evolution refused") {
    import org.apache.spark.sql.types._
    val d = tempDir("cm-id-mode")
    var t = DeltaTable.forPath(d).write(nation)
    // splice id-mode mapping the way a foreign id-mode writer declares
    // it: mode=id + per-field physicalName AND columnMapping.id
    val meta = t.dlog.latestMetadata.get
    def ann(f: StructField, id: Long): StructField =
      f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putString(ColumnMapping.PhysicalNameKey, f.name)
        .putLong(ColumnMapping.IdKey, id).build())
    val idSchema = StructType(t.schema.fields.zipWithIndex.map {
      case (f, i) => ann(f, i + 1L) })
    t.dlog.commit(graft.log.DeltaLogEntry(Vector(
      meta.copy(schemaString = idSchema.json,
        configuration = meta.configuration +
          (ColumnMapping.ModeConfigKey -> "id") +
          ("delta.columnMapping.maxColumnId" -> "3")),
      graft.log.CommitInfo.metaOp(graft.log.CommitInfo.Op.SetProperties,
        Map.empty, t.version))))
    val re = DeltaTable.forPath(d)
    assertSameRows(re.toDF(spark), nation)
    // append through the id table: accepted, and the NEW file's parquet
    // schema carries the declared field ids (an id-addressed reader binds)
    val before = re.fileUris.toSet
    val t2 = re.write(nation)
    assertSameRows(t2.toDF(spark), nation.union(nation))
    val newFile = t2.fileUris.toSet.diff(before).head
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(newFile), new org.apache.hadoop.conf.Configuration()))
    val fields = try footer.getFooter.getFileMetaData.getSchema.getFields
      finally footer.close()
    import scala.jdk.CollectionConverters._
    val ids = fields.asScala.map(f => f.getName -> Option(f.getId).map(_.intValue))
    assert(ids.toMap == Map("n_nationkey" -> Some(1), "n_name" -> Some(2),
      "n_regionkey" -> Some(3)), ids.toString)
    // schema evolution would mint id-less columns: refused loudly
    val ex = intercept[IllegalStateException](
      t2.addColumn("extra", StringType))
    assert(ex.getMessage.contains("columnMapping.mode=id"), ex.getMessage)
    // rename keeps the table in id mode (files stay id-bound) and the
    // renamed field keeps its id, so the id-completeness guard passes
    val t3 = t2.renameColumn("n_name", "nation_name")
    assert(ColumnMapping.modeOf(t3.dlog.latestMetadata.get.configuration) == "id")
    assert(t3.schema("nation_name").metadata.getLong(ColumnMapping.IdKey) == 2L)
    assertSameRows(t3.toDF(spark).select(col("nation_name").as("n_name")),
      nation.select("n_name").union(nation.select("n_name")))
  }

  test("id-mode: NESTED fields get parquet field ids; nested renames refused") {
    import org.apache.spark.sql.types._
    val d = tempDir("cm-id-nested")
    val base = spark.range(1, 6).select(col("id"),
      struct(col("id").cast("int").as("x"),
        (col("id") * 2).cast("int").as("y")).as("s"))
    var t = DeltaTable.forPath(d).write(base)
    val meta = t.dlog.latestMetadata.get
    def idMeta(name: String, id: Long): Metadata =
      new MetadataBuilder()
        .putString(ColumnMapping.PhysicalNameKey, name)
        .putLong(ColumnMapping.IdKey, id).build()
    val idSchema = StructType(Seq(
      StructField("id", LongType, nullable = true, idMeta("id", 1)),
      StructField("s", StructType(Seq(
        StructField("x", IntegerType, nullable = true, idMeta("x", 3)),
        StructField("y", IntegerType, nullable = true, idMeta("y", 4)))),
        nullable = true, idMeta("s", 2))))
    t.dlog.commit(graft.log.DeltaLogEntry(Vector(
      meta.copy(schemaString = idSchema.json,
        configuration = meta.configuration +
          (ColumnMapping.ModeConfigKey -> "id") +
          ("delta.columnMapping.maxColumnId" -> "4")),
      graft.log.CommitInfo.metaOp(graft.log.CommitInfo.Op.SetProperties,
        Map.empty, t.version))))
    val re = DeltaTable.forPath(d)
    val before = re.fileUris.toSet
    val t2 = re.write(base)
    val newFile = t2.fileUris.toSet.diff(before).head
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(newFile),
        new org.apache.hadoop.conf.Configuration()))
    val schema = try footer.getFooter.getFileMetaData.getSchema
      finally footer.close()
    // nested leaves must carry their declared ids — an id-addressed
    // foreign reader binds s.x/s.y by field id, not by name
    def typ(g: org.apache.parquet.schema.GroupType, n: String) =
      g.getType(g.getFieldIndex(n))
    val top = schema.asGroupType()
    assert(Option(typ(top, "id").getId).map(_.intValue).contains(1), schema.toString)
    val sGroup = typ(top, "s").asGroupType()
    assert(Option(typ(top, "s").getId).map(_.intValue).contains(2), schema.toString)
    assert(Option(typ(sGroup, "x").getId).map(_.intValue).contains(3), schema.toString)
    assert(Option(typ(sGroup, "y").getId).map(_.intValue).contains(4), schema.toString)

    // nested physical rename: this writer matches nested fields by name,
    // so a differing nested physicalName must refuse the commit
    val renamedSchema = StructType(Seq(
      idSchema.fields(0),
      StructField("s", StructType(Seq(
        StructField("x", IntegerType, nullable = true, idMeta("col-phys-x", 3)),
        StructField("y", IntegerType, nullable = true, idMeta("y", 4)))),
        nullable = true, idMeta("s", 2))))
    val ex = intercept[IllegalStateException] {
      t2.dlog.commit(graft.log.DeltaLogEntry(Vector(
        meta.copy(schemaString = renamedSchema.json,
          configuration = meta.configuration +
            (ColumnMapping.ModeConfigKey -> "id") +
            ("delta.columnMapping.maxColumnId" -> "4")),
        graft.log.CommitInfo.metaOp(graft.log.CommitInfo.Op.SetProperties,
          Map.empty, t2.version))))
      DeltaTable.forPath(d).write(base)
    }
    assert(ex.getMessage.contains("nested"), ex.getMessage)
  }

  test("RESTORE across a rename reverts the logical name and keeps scans working") {
    val d = tempDir("cm-restore-rename")
    var t = DeltaTable.forPath(d).write(nation)
    val v0 = t.version
    t = t.renameColumn("n_name", "nation_name")
    t = t.write(nation.withColumnRenamed("n_name", "nation_name"))
    // restore to the pre-rename version: the ORIGINAL logical name comes
    // back (schema AND configuration restored), post-rename rows leave
    t = t.restore(v0)
    assert(t.toDF(spark).columns.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
    assertSameRows(t.toDF(spark), nation)
    // the restored table stays writable under the restored schema
    val t2 = t.write(nation)
    assert(t2.toDF(spark).count() == nation.count() * 2)
  }

  test("rename is metadata-only: same data, new logical name, old files") {
    val d = tempDir("cm-rename")
    val t0 = DeltaTable.forPath(d).write(nation)
    val filesBefore = t0.fileUris.toSet
    val t1 = t0.renameColumn("n_name", "nation_name")
    assert(t1.fileUris.toSet == filesBefore, "rename must not touch data files")
    assert(t1.version == t0.version + 1)
    val got = t1.toDF(spark)
    assert(got.columns.toSeq == Seq("n_nationkey", "nation_name", "n_regionkey"))
    assertSameRows(got, nation.withColumnRenamed("n_name", "nation_name"))
  }

  test("append after rename goes through the new logical name") {
    val d = tempDir("cm-append")
    val t = DeltaTable.forPath(d).write(nation).renameColumn("n_name", "nation_name")
    val more = nation.withColumnRenamed("n_name", "nation_name")
      .withColumn("n_nationkey", col("n_nationkey") + 100)
    val t2 = t.write(more)
    assertSameRows(t2.toDF(spark),
      nation.withColumnRenamed("n_name", "nation_name").unionByName(more))
    // appending under the OLD name is a schema mismatch
    assertThrows[IllegalArgumentException](t2.write(nation))
  }

  test("filter pushdown and stats skipping survive a rename") {
    val d = tempDir("cm-skip")
    // two files with disjoint key ranges
    val lo = nation.filter(col("n_nationkey") < 10).coalesce(1)
    val hi = nation.filter(col("n_nationkey") >= 10).coalesce(1)
    val t = DeltaTable.forPath(d).write(lo).write(hi)
      .renameColumn("n_nationkey", "nk")
    val pruned = t.prunedAdds(col("nk") >= 20)
    assert(pruned.size == 1, s"stats must prune the low file, got ${pruned.size}")
    val got = t.toDFWhere(spark, col("nk") >= 20)
    assertSameRows(got, nation.filter(col("n_nationkey") >= 20)
      .withColumnRenamed("n_nationkey", "nk"))
    // the exact filter reaches the parquet scan under the PHYSICAL name
    val plan = t.toDF(spark).filter(col("nk") >= 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_nationkey"),
      s"expected pushed filter on physical column:\n$plan")
  }

  test("dropped column disappears; re-added name never resurrects old values") {
    val d = tempDir("cm-drop")
    val t = DeltaTable.forPath(d).write(nation).dropColumn("n_name")
    assert(t.toDF(spark).columns.toSeq == Seq("n_nationkey", "n_regionkey"))
    // re-add a column of the same LOGICAL name via schema merge
    val withNew = t.toDF(spark).withColumn("n_name", lit("fresh"))
    val t2 = t.write(withNew, schemaMode = "merge")
    val vals = t2.toDF(spark).select("n_name").distinct()
      .as[Option[String]].collect().toSet
    assert(vals == Set(None, Some("fresh")),
      s"old files must read NULL for the re-added column, got $vals")
    // physical name of the re-added column is fresh, not n_name
    val phys = ColumnMapping.logicalToPhysical(t2.dlog.schema)("n_name")
    assert(phys.startsWith("col-"), s"expected fresh physical name, got $phys")
  }

  test("rename guards: partition columns, constraints, collisions") {
    val d = tempDir("cm-guards")
    val t = DeltaTable.forPath(d)
      .write(nation, partitionBy = Some(Seq("n_regionkey")))
      .addConstraint(spark, "key_pos", "n_nationkey >= 0")
    assertThrows[IllegalArgumentException](t.renameColumn("n_regionkey", "rk"))
    assertThrows[IllegalArgumentException](t.dropColumn("n_regionkey"))
    assertThrows[IllegalArgumentException](t.renameColumn("n_nationkey", "nk"))
    assertThrows[IllegalArgumentException](t.dropColumn("n_nationkey"))
    assertThrows[IllegalArgumentException](t.renameColumn("n_name", "n_regionkey"))
    assertThrows[IllegalArgumentException](t.renameColumn("nope", "x"))
    // unconstrained, non-partition column renames fine on a partitioned table
    val ok = t.renameColumn("n_name", "nation_label")
    assertSameRows(ok.toDF(spark), nation.withColumnRenamed("n_name", "nation_label"))
  }

  test("first mapping change bumps the protocol to 2/5, exactly once") {
    val d = tempDir("cm-proto")
    val t = DeltaTable.forPath(d).write(nation)
      .renameColumn("n_name", "nn").renameColumn("nn", "nnn")
    val protocols = t.dlog.entries.values.flatMap(_.actions).collect {
      case p: graft.log.Protocol => (p.minReaderVersion, p.minWriterVersion)
    }.toSeq
    assert(protocols == Seq((1, 2), (2, 5)),
      s"expected one create-time and one mapping bump, got $protocols")
  }

  test("time travel reads each version under its own names") {
    val d = tempDir("cm-tt")
    val t = DeltaTable.forPath(d).write(nation).renameColumn("n_name", "nation_name")
    assert(t.loadAsVersion(0L).toDF(spark).columns.contains("n_name"))
    assert(t.toDF(spark).columns.contains("nation_name"))
  }

  test("copy-on-write DELETE and UPDATE work on a renamed column") {
    val d = tempDir("cm-mutate")
    var t = DeltaTable.forPath(d).write(nation).renameColumn("n_name", "nation_name")
    t = t.delete(spark, Some(col("n_nationkey") < 5))
    t = t.update(spark, Some(col("nation_name") === "JAPAN"),
      Map("nation_name" -> lit("NIPPON")))
    val expected = nation.filter(col("n_nationkey") >= 5)
      .withColumn("n_name", when(col("n_name") === "JAPAN", "NIPPON").otherwise(col("n_name")))
      .withColumnRenamed("n_name", "nation_name")
    assertSameRows(t.toDF(spark), expected)
  }

  test("merge-on-read DELETE works after a rename") {
    val d = tempDir("cm-mor")
    val t = DeltaTable.forPath(d).write(nation)
      .renameColumn("n_nationkey", "nk")
      .deleteMergeOnRead(spark, Some(col("nk") < 5))
    assertSameRows(t.toDF(spark), nation.filter(col("n_nationkey") >= 5)
      .withColumnRenamed("n_nationkey", "nk"))
  }

  test("metadata min/max and bloom probe under physical names") {
    val d = tempDir("cm-stats")
    val t = DeltaTable.forPath(d).write(nation).renameColumn("n_nationkey", "nk")
    assert(t.minMaxFromStats("nk").contains((0L, 24L)))
    val ti = t.buildBloomIndex(spark, "nk")
    // bloom proves an absent key missing from every file
    assert(ti.prunedAdds(col("nk") === 999L).isEmpty)
    assert(ti.prunedAdds(col("nk") === 7L).nonEmpty)
  }

  test("generated column: computed when absent, validated when supplied") {
    val d = tempDir("gen")
    val ev = QueryLib.events(spark, sfDir)
    val t = DeltaTable.forPath(d)
      .withGeneratedColumn("event_date", "CAST(ts AS DATE)")
      .write(ev, partitionBy = Some(Seq("event_date")))
    assert(t.partitionColumns == Seq("event_date"))
    assertSameRows(t.toDF(spark), ev.withColumn("event_date", col("ts").cast("date")))
    // a fresh handle derives the expression from the log, not the builder
    val reopened = DeltaTable.forPath(d)
    assert(reopened.generatedColumns == Map("event_date" -> "CAST(ts AS DATE)"))
    val t2 = reopened.write(ev.withColumn("event_id", col("event_id") + 1000000))
    assert(t2.toDF(spark).count() == 2 * ev.count())
    // supplying CORRECT values is allowed; wrong ones are rejected
    val t3 = t2.write(ev.withColumn("event_date", col("ts").cast("date"))
      .withColumn("event_id", col("event_id") + 2000000))
    assertThrows[IllegalArgumentException](t3.write(
      ev.withColumn("event_date", lit("1999-01-01").cast("date"))))
    // the generation SOURCE column cannot be renamed or dropped
    assertThrows[IllegalArgumentException](t3.renameColumn("ts", "t"))
    assertThrows[IllegalArgumentException](t3.dropColumn("ts"))
  }

  test("UPDATE re-derives generated columns; direct SET of one is rejected") {
    val d = tempDir("gen-upd")
    val ev = QueryLib.events(spark, sfDir)
    var t = DeltaTable.forPath(d)
      .withGeneratedColumn("event_date", "CAST(ts AS DATE)")
      .write(ev, partitionBy = Some(Seq("event_date")))
    assertThrows[IllegalArgumentException](t.update(spark,
      Some(col("event_id") === 0), Map("event_date" -> lit("1999-01-01").cast("date"))))
    // shifting ts by 400 days must MOVE the rows to their new partition
    t = t.update(spark, Some(col("event_id") < 100),
      Map("ts" -> (col("ts") + expr("INTERVAL 400 DAYS"))))
    val broken = t.toDF(spark)
      .filter(not(col("event_date") <=> col("ts").cast("date"))).count()
    assert(broken == 0L, s"$broken rows violate the generation invariant")
    assert(t.toDF(spark).filter(col("event_date") > lit("2025-01-01").cast("date"))
      .count() == 100L)
    // merge-on-read flavor keeps the invariant too
    val t2 = t.updateMergeOnRead(spark, Some(col("event_id") === 200),
      Map("ts" -> (col("ts") + expr("INTERVAL 800 DAYS"))))
    assert(t2.toDF(spark)
      .filter(not(col("event_date") <=> col("ts").cast("date"))).count() == 0L)
  }

  test("merge computes an absent generated column on the source rows") {
    val d = tempDir("gen-merge")
    val ev = QueryLib.events(spark, sfDir).limit(200)
    val t = DeltaTable.forPath(d)
      .withGeneratedColumn("event_date", "CAST(ts AS DATE)")
      .write(ev)
    val src = ev.filter(col("event_id") < 50)
      .withColumn("value", lit(0.0)) // update half
      .unionByName(ev.filter(col("event_id") >= 150)
        .withColumn("event_id", col("event_id") + 100000)) // insert half
    val merged = t.merge(spark, src, Seq("event_id"))
    assert(merged.toDF(spark)
      .filter(not(col("event_date") <=> col("ts").cast("date"))).count() == 0L)
    assert(merged.toDF(spark).count() == 250L)
  }

  test("a stale pending declaration does not outlive table creation") {
    val d = tempDir("gen-stale")
    val t = DeltaTable.forPath(d)
      .withGeneratedColumn("gc", "n_nationkey + 1")
      .write(nation)
    // the handle returned by write must have consumed the declaration:
    // dropping gc and appending again must NOT re-inject it
    val dropped = t.dropColumn("gc")
    val appended = dropped.write(nation)
    assert(!appended.toDF(spark).columns.contains("gc"))
  }

  test("mapping never downgrades an already-higher protocol") {
    val d = tempDir("cm-nodown")
    val t0 = DeltaTable.forPath(d).write(nation)
    // a foreign writer raised the protocol (e.g. a DV feature gate)
    val raised = t0.copy(dlog = t0.dlog.commit(
      graft.log.DeltaLogEntry(Vector(graft.log.Protocol(3, 7))), t0.commitContext))
    val renamed = raised.renameColumn("n_name", "nn")
    assert(renamed.dlog.currentProtocol.minReaderVersion == 3)
    assert(renamed.dlog.currentProtocol.minWriterVersion == 7)
  }

  test("backtick-quoted constraint references still block renames") {
    val d = tempDir("cm-btick")
    val t = DeltaTable.forPath(d).write(nation)
      .addConstraint(spark, "named", "`n_name` IS NOT NULL")
    assertThrows[IllegalArgumentException](t.renameColumn("n_name", "nn"))
  }

  test("renaming a GENERATED column keeps its expression and mapping") {
    val d = tempDir("gen-rename")
    val ev = QueryLib.events(spark, sfDir).limit(100)
    val t = DeltaTable.forPath(d)
      .withGeneratedColumn("event_date", "CAST(ts AS DATE)")
      .write(ev)
      .renameColumn("event_date", "day")
    // the expression rides the renamed field; new batches compute `day`
    assert(t.generatedColumns == Map("day" -> "CAST(ts AS DATE)"))
    val t2 = t.write(ev.withColumn("event_id", col("event_id") + 1000))
    assert(t2.toDF(spark)
      .filter(not(col("day") <=> col("ts").cast("date"))).count() == 0L)
    // physical name stays the original — pre-rename files bind correctly
    assert(ColumnMapping.logicalToPhysical(t2.dlog.schema)("day") == "event_date")
    // and UPDATE still re-derives under the new logical name
    val t3 = t2.update(spark, Some(col("event_id") === 0),
      Map("ts" -> (col("ts") + expr("INTERVAL 400 DAYS"))))
    assert(t3.toDF(spark)
      .filter(not(col("day") <=> col("ts").cast("date"))).count() == 0L)
  }

  test("format(graft) writes compute generated columns too") {
    val d = tempDir("gen-ds")
    val ev = QueryLib.events(spark, sfDir).limit(100)
    DeltaTable.forPath(d)
      .withGeneratedColumn("event_date", "CAST(ts AS DATE)")
      .write(ev, partitionBy = Some(Seq("event_date")))
    // a producer using only the registered format never supplies the
    // column; the write path derives it from the log-recorded expression
    ev.withColumn("event_id", col("event_id") + 1000)
      .write.format("graft").mode("append").save(d)
    val got = DeltaTable.forPath(d).toDF(spark)
    assert(got.count() == 200)
    assert(got.filter(not(col("event_date") <=> col("ts").cast("date"))).count() == 0L)
  }

  test("generated columns must be declared before the table exists") {
    val d = tempDir("gen-late")
    val t = DeltaTable.forPath(d).write(nation)
    assertThrows[IllegalArgumentException](
      t.withGeneratedColumn("x", "n_nationkey + 1"))
  }

  test("mapping survives checkpoint, reopen, compact, and clone") {
    val d = tempDir("cm-ckpt")
    var t = DeltaTable.forPath(d).write(nation).renameColumn("n_name", "nation_name")
    t = t.checkpoint()
    val reopened = DeltaTable.forPath(d)
    assert(reopened.toDF(spark).columns.contains("nation_name"))
    val compacted = reopened.write(reopened.toDF(spark)).compact(spark)
    assertSameRows(compacted.toDF(spark),
      nation.unionByName(nation).withColumnRenamed("n_name", "nation_name"))
    val cd = tempDir("cm-clone")
    val cloned = compacted.cloneTo(cd)
    assert(cloned.toDF(spark).columns.contains("nation_name"))
  }

  test("CDF range crossing a RENAME boundary is rejected; either side works") {
    val d = tempDir("cm-cdf-rename")
    var t = DeltaTable.forPath(d).write(nation) // v0
    t = t.write(nation)                         // v1
    t = t.renameColumn("n_name", "nation_name") // v2 (boundary)
    t = t.write(t.toDF(spark).limit(5))         // v3
    val e = intercept[IllegalArgumentException](t.changesBetween(spark, 0L, 3L))
    assert(e.getMessage.contains("RENAME") && e.getMessage.contains("version 2"))
    assert(e.getMessage.contains("n_name") && e.getMessage.contains("nation_name"))
    // below the boundary: pre-rename logical names would be consistent
    assert(t.changesBetween(spark, 0L, 1L).count() == nation.count())
    // from the boundary on: new names, consistent
    val after = t.changesBetween(spark, 2L, 3L)
    assert(after.columns.contains("nation_name"))
    assert(after.count() == 5)
  }

  test("CDF range crossing a DROP boundary is rejected with the dropped name") {
    val d = tempDir("cm-cdf-drop")
    var t = DeltaTable.forPath(d).write(nation) // v0
    t = t.dropColumn("n_regionkey")             // v1 (boundary)
    t = t.write(t.toDF(spark).limit(3))         // v2
    val e = intercept[IllegalArgumentException](t.changesBetween(spark, 0L, 2L))
    assert(e.getMessage.contains("DROP") && e.getMessage.contains("n_regionkey"))
    assert(t.changesBetween(spark, 1L, 2L).count() == 3)
  }
}
