package graft.tools

import graft.sources.RoaringBitmaps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Row, SparkSession}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** One-shot generator for `src/test/resources/foreign-delta-table-v2/` —
  * the SECOND vendored foreign-conventions fixture (VERDICT r11 #7),
  * covering the conventions the first one doesn't:
  *
  *  - column mapping `id` mode: logical names bind through
  *    `delta.columnMapping.id`; the parquet files carry REAL field ids
  *    (`parquet.field.id`) alongside `col-<uuid>` physical names, exactly
  *    what delta-spark writes in id mode
  *  - an INLINE deletion vector: storageType "i", the roaring blob
  *    Z85-encoded directly in `pathOrInlineDv`, NO offset field (strict
  *    parsers reject an inline descriptor that carries one)
  *  - a V2 (UUID-manifest) checkpoint as a FOREIGN writer lays it out:
  *    `%020d.checkpoint.<uuid>.parquet` manifest with protocol/metaData/
  *    txn + `checkpointMetadata` + `sidecar` refs, file actions split
  *    over TWO sidecars under `_delta_log/_sidecars/` with bare
  *    `<uuid>.parquet` names (no graft version prefix — foreign engines
  *    don't use our naming), and a `_last_checkpoint` pointer
  *  - reader-3/writer-7 protocol declaring the `v2Checkpoint` feature
  *
  * Deterministic (fixed uuids, timestamps, row data); run via
  * `sbt "Test/runMain graft.tools.ForeignFixtureGenV2"` and commit the
  * output. ForeignTableSpec scenario 4 replays the committed fixture and
  * asserts the recorded answers — it never regenerates.
  *
  * Recorded answers (printed at generation): 120 rows minus inline-DV'd
  * ids 40/42/44 = 117 live, Σid = 7014, Σvalue = 1753.5.
  */
object ForeignFixtureGenV2 {

  val PhysId = "col-a1b2c3d4e5f60718"
  val PhysTxt = "col-29384756afbecd01"
  val PhysValue = "col-fedcba9876543210"

  def main(args: Array[String]): Unit = {
    val outRoot = Paths.get("src/test/resources/foreign-delta-table-v2")
    deleteRecursively(outRoot)
    Files.createDirectories(outRoot.resolve("_delta_log/_sidecars"))

    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.fieldId.write.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- data files: physical names + parquet field ids ----
    def md(id: Long) = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("parquet.field.id", id).build()
    def frame(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id").as(PhysId, md(1)),
      concat(lit("t"), (col("id") % 5).cast("string")).as(PhysTxt, md(2)),
      (col("id") * 0.25).as(PhysValue, md(3)))
    val files = Seq(
      ("part-00000-20000000-aaaa-4aaa-8aaa-000000000000-c000.snappy.parquet", 0L, 40L),
      ("part-00001-21111111-bbbb-4bbb-8bbb-111111111111-c000.snappy.parquet", 40L, 80L),
      ("part-00002-22222222-cccc-4ccc-8ccc-222222222222-c000.snappy.parquet", 80L, 120L))
    val sizes = files.map { case (name, lo, hi) =>
      val tmp = Files.createTempDirectory("foreignv2-gen")
      frame(lo, hi).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, outRoot.resolve(name), StandardCopyOption.REPLACE_EXISTING)
      name -> Files.size(outRoot.resolve(name))
    }.toMap

    def statsJson(lo: Long, hi: Long): String = {
      val n = hi - lo
      s"""{\\"numRecords\\":$n,\\"minValues\\":{\\"$PhysId\\":$lo,\\"$PhysTxt\\":\\"t0\\",\\"$PhysValue\\":${lo * 0.25}},""" +
        s"""\\"maxValues\\":{\\"$PhysId\\":${hi - 1},\\"$PhysTxt\\":\\"t4\\",\\"$PhysValue\\":${(hi - 1) * 0.25}},""" +
        s"""\\"nullCount\\":{\\"$PhysId\\":0,\\"$PhysTxt\\":0,\\"$PhysValue\\":0}}"""
    }
    def statsPlain(lo: Long, hi: Long): String = statsJson(lo, hi).replace("\\\"", "\"")

    val schemaString = schemaJson()
    val config =
      s"""{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"3"}"""
    val protocolLine =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["columnMapping","deletionVectors","v2Checkpoint"],""" +
        """"writerFeatures":["columnMapping","deletionVectors","v2Checkpoint"]}}"""
    val metaLine =
      s"""{"metaData":{"id":"66666666-7777-8888-9999-aaaaaaaaaaaa","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${schemaString.replace("\\", "\\\\").replace("\"", "\\\"")}",""" +
        s""""partitionColumns":[],"configuration":${config},"createdTime":1710000000000}}"""

    // ---- v0: CTAS — protocol + metaData + first 2 adds ----
    val v0Adds = files.take(2).map { case (name, lo, hi) =>
      s"""{"add":{"path":"$name","partitionValues":{},"size":${sizes(name)},""" +
        s""""modificationTime":1710000000000,"dataChange":true,"stats":"${statsJson(lo, hi)}"}}"""
    }
    val v0Commit =
      """{"commitInfo":{"timestamp":1710000000000,"operation":"CREATE TABLE AS SELECT","operationParameters":{},"engineInfo":"foreign-engine/2.0"}}"""
    writeLines(outRoot.resolve("_delta_log/00000000000000000000.json"),
      Seq(protocolLine, metaLine) ++ v0Adds :+ v0Commit)

    // ---- inline DV: rows 0,2,4 of file part-00001 (ids 40,42,44) ----
    // Z85 works on 4-byte blocks, so the inline form zero-pads the blob
    // (the roaring structure is self-delimiting; trailing pad is inert).
    // sizeInBytes records the REAL blob length, as delta-spark does.
    val blob = RoaringBitmaps.encodeBlob(Array(0L, 2L, 4L))
    val padded = blob ++ Array.fill((4 - blob.length % 4) % 4)(0.toByte)
    val inlineZ85 = RoaringBitmaps.Z85.encode(padded)

    // ---- v1: DV delete on part-00001 (remove + re-add, inline "i") ----
    val (f1, f1lo, f1hi) = files(1)
    val v1 = Seq(
      s"""{"remove":{"path":"$f1","deletionTimestamp":1710000001000,"dataChange":true}}""",
      s"""{"add":{"path":"$f1","partitionValues":{},"size":${sizes(f1)},""" +
        s""""modificationTime":1710000000000,"dataChange":true,"stats":"${statsJson(f1lo, f1hi)}",""" +
        s""""deletionVector":{"storageType":"i","pathOrInlineDv":"$inlineZ85",""" +
        s""""sizeInBytes":${blob.length},"cardinality":3}}}""",
      """{"commitInfo":{"timestamp":1710000001000,"operation":"DELETE","operationParameters":{},"engineInfo":"foreign-engine/2.0"}}""")
    writeLines(outRoot.resolve("_delta_log/00000000000000000001.json"), v1)

    // ---- v2: plain append of the 3rd file, plus txn watermark ----
    val (f2, f2lo, f2hi) = files(2)
    val v2 = Seq(
      s"""{"txn":{"appId":"foreign-v2-app","version":9,"lastUpdated":1710000002000}}""",
      s"""{"add":{"path":"$f2","partitionValues":{},"size":${sizes(f2)},""" +
        s""""modificationTime":1710000002000,"dataChange":true,"stats":"${statsJson(f2lo, f2hi)}"}}""",
      """{"commitInfo":{"timestamp":1710000002000,"operation":"WRITE","operationParameters":{"mode":"Append"},"engineInfo":"foreign-engine/2.0"}}""")
    writeLines(outRoot.resolve("_delta_log/00000000000000000002.json"), v2)

    // ---- V2 checkpoint at v2: UUID manifest + two foreign-named sidecars
    writeV2Checkpoint(spark, outRoot, files, sizes, statsPlain, schemaString,
      inlineZ85, blob.length)
    writeLines(outRoot.resolve("_delta_log/_last_checkpoint"),
      Seq("""{"version":2,"size":7}"""))

    spark.stop()
    println(s"fixture written to $outRoot")
    val live = (0L until 120L).filterNot(Set(40L, 42L, 44L))
    println(s"rows=${live.size} sumId=${live.sum} sumValue=${live.map(_ * 0.25).sum}")
  }

  /** Logical schema in delta-spark's id-mode shape: every field carries
    * columnMapping.id + physicalName (id mode still records physical
    * names per the spec).
    */
  private def schemaJson(): String = {
    import org.apache.spark.sql.types._
    def md(id: Long, phys: String): Metadata = new MetadataBuilder()
      .putLong("delta.columnMapping.id", id)
      .putString("delta.columnMapping.physicalName", phys).build()
    StructType(Seq(
      StructField("id", LongType, nullable = true, md(1, PhysId)),
      StructField("txt", StringType, nullable = true, md(2, PhysTxt)),
      StructField("value", DoubleType, nullable = true, md(3, PhysValue))
    )).json
  }

  private def writeV2Checkpoint(spark: SparkSession, outRoot: Path,
      files: Seq[(String, Long, Long)], sizes: Map[String, Long],
      statsPlain: (Long, Long) => String, schemaString: String,
      inlineZ85: String, dvSize: Int): Unit = {
    import org.apache.spark.sql.types._
    val base = graft.log.Checkpoint.deltaCheckpointSchema
    val sidecarSchema = StructType(base.fields.filter(f =>
      f.name == "add" || f.name == "remove"))
    val manifestSchema = graft.log.Checkpoint.v2ManifestSchema

    // ---- sidecars: file actions split over two foreign-named files ----
    def addRow(i: Int): Row = {
      val (name, lo, hi) = files(i)
      val dv = if (i == 1) Row("i", inlineZ85, null, dvSize, 3L, null) else null
      Row(Row(name, Map.empty[String, String], sizes(name), 1710000000000L,
        false, statsPlain(lo, hi), null, dv, null, null), null)
    }
    val sidecarNames = Seq(
      "3a3a3a3a-0000-4000-8000-000000000001.parquet",
      "3a3a3a3a-0000-4000-8000-000000000002.parquet")
    val groups = Seq(Seq(addRow(0), addRow(1)), Seq(addRow(2)))
    val sidecarRefs = sidecarNames.zip(groups).map { case (name, rows) =>
      val tmp = Files.createTempDirectory("foreignv2-sc")
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), sidecarSchema)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dest = outRoot.resolve(s"_delta_log/_sidecars/$name")
      Files.copy(part, dest, StandardCopyOption.REPLACE_EXISTING)
      name -> Files.size(dest)
    }

    // ---- manifest: protocol + metaData + txn + checkpointMetadata + refs
    // column order: txn, add, remove, metaData, domainMetadata, protocol,
    // checkpointMetadata, sidecar
    def m(txn: Row = null, meta: Row = null, proto: Row = null,
        ckptMeta: Row = null, sidecar: Row = null): Row =
      Row(txn, null, null, meta, null, proto, ckptMeta, sidecar)
    val rows = Seq(
      m(proto = Row(3, 7,
        Seq("columnMapping", "deletionVectors", "v2Checkpoint"),
        Seq("columnMapping", "deletionVectors", "v2Checkpoint"))),
      m(meta = Row("66666666-7777-8888-9999-aaaaaaaaaaaa", null, null,
        Row("parquet", Map.empty[String, String]), schemaString,
        Seq.empty[String],
        Map("delta.columnMapping.mode" -> "id",
          "delta.columnMapping.maxColumnId" -> "3"),
        1710000000000L)),
      m(txn = Row("foreign-v2-app", 9L, 1710000002000L)),
      m(ckptMeta = Row(2L, null))) ++
      sidecarRefs.map { case (name, size) =>
        m(sidecar = Row(name, size, 1710000002000L, null))
      }
    val tmp = Files.createTempDirectory("foreignv2-manifest")
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), manifestSchema)
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.copy(part, outRoot.resolve(
      "_delta_log/00000000000000000002.checkpoint.4b4b4b4b-1111-4111-8111-2c2c2c2c2c2c.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def writeLines(p: Path, lines: Seq[String]): Unit =
    Files.write(p, lines.mkString("\n").getBytes("UTF-8"))

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}
