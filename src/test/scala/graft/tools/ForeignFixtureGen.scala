package graft.tools

import graft.sources.RoaringBitmaps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Row, SparkSession}

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** One-shot generator for `src/test/resources/foreign-delta-table/` — a
  * table in FOREIGN delta-spark conventions this engine must read but
  * never writes itself (analogue of the reference's vendored Spark
  * compatibility table, tests/test_compatibility_spark.py:35-77):
  *
  *  - column mapping `name` mode: logical names bind through
  *    `delta.columnMapping.physicalName` to `col-<uuid>` parquet columns
  *  - a delta-SPEC deletion vector: roaring-bitmap `.bin` sidecar,
  *    storageType "u" (Z85 uuid naming), CRC-framed (PROTOCOL.md
  *    "Deletion Vectors") — NOT graft's parquet-sidecar variant
  *  - a classic `N.checkpoint.parquet` in delta's column layout with the
  *    DV descriptor as a typed struct, plus a `txn` action, and a
  *    `_last_checkpoint` pointer
  *  - reader-3/writer-7 table-features protocol
  *
  * Deterministic (fixed uuids, timestamps, row data); run via
  * `sbt "Test/runMain graft.tools.ForeignFixtureGen"` and commit the
  * output. ForeignTableSpec replays the committed fixture and asserts
  * the recorded answers — it never regenerates.
  */
object ForeignFixtureGen {

  val PhysId = "col-7a8b9c0d1e2f3a4b"
  val PhysName = "col-1f2e3d4c5b6a7988"
  val PhysValue = "col-99aabbccddeeff00"

  val DvUuid = new java.util.UUID(0x0123456789abcdefL, 0xfedcba9876543210L)

  def main(args: Array[String]): Unit = {
    val outRoot = Paths.get("src/test/resources/foreign-delta-table")
    deleteRecursively(outRoot)
    Files.createDirectories(outRoot.resolve("_delta_log"))

    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- data files: 100 rows over 3 range files + a 30-row append ----
    // physical column names; value = id * 0.5, name = "n<id%7>"
    def frame(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id").as(PhysId),
      concat(lit("n"), (col("id") % 7).cast("string")).as(PhysName),
      (col("id") * 0.5).as(PhysValue))
    val files = Seq(
      ("part-00000-f0000000-aaaa-4aaa-8aaa-000000000000-c000.snappy.parquet", 0L, 40L),
      ("part-00001-f1111111-bbbb-4bbb-8bbb-111111111111-c000.snappy.parquet", 40L, 70L),
      ("part-00002-f2222222-cccc-4ccc-8ccc-222222222222-c000.snappy.parquet", 70L, 100L),
      ("part-00003-f3333333-dddd-4ddd-8ddd-333333333333-c000.snappy.parquet", 100L, 130L))
    val sizes = files.map { case (name, lo, hi) =>
      val tmp = Files.createTempDirectory("foreign-gen")
      frame(lo, hi).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, outRoot.resolve(name), StandardCopyOption.REPLACE_EXISTING)
      name -> Files.size(outRoot.resolve(name))
    }.toMap

    def statsJson(lo: Long, hi: Long): String = {
      val n = hi - lo
      s"""{\\"numRecords\\":$n,\\"minValues\\":{\\"$PhysId\\":$lo,\\"$PhysName\\":\\"n0\\",\\"$PhysValue\\":${lo * 0.5}},""" +
        s"""\\"maxValues\\":{\\"$PhysId\\":${hi - 1},\\"$PhysName\\":\\"n6\\",\\"$PhysValue\\":${(hi - 1) * 0.5}},""" +
        s"""\\"nullCount\\":{\\"$PhysId\\":0,\\"$PhysName\\":0,\\"$PhysValue\\":0}}"""
    }
    // unescaped variant for the checkpoint's stats column
    def statsPlain(lo: Long, hi: Long): String = statsJson(lo, hi).replace("\\\"", "\"")

    val schemaString = schemaJson()
    val config =
      s"""{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"3"}"""
    val protocolLine =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["columnMapping","deletionVectors"],""" +
        """"writerFeatures":["columnMapping","deletionVectors"]}}"""
    val metaLine =
      s"""{"metaData":{"id":"11111111-2222-3333-4444-555555555555","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${schemaString.replace("\\", "\\\\").replace("\"", "\\\"")}",""" +
        s""""partitionColumns":[],"configuration":${config},"createdTime":1700000000000}}"""

    // ---- v0: CTAS — protocol + metaData + first 3 adds ----
    val v0Adds = files.take(3).map { case (name, lo, hi) =>
      s"""{"add":{"path":"$name","partitionValues":{},"size":${sizes(name)},""" +
        s""""modificationTime":1700000000000,"dataChange":true,"stats":"${statsJson(lo, hi)}"}}"""
    }
    val v0Commit =
      """{"commitInfo":{"timestamp":1700000000000,"operation":"CREATE TABLE AS SELECT","operationParameters":{},"engineInfo":"foreign-engine/1.0"}}"""
    writeLines(outRoot.resolve("_delta_log/00000000000000000000.json"),
      Seq(protocolLine, metaLine) ++ v0Adds :+ v0Commit)

    // ---- DV sidecar: rows 0,1,5 of file part-00002 (ids 70,71,75) ----
    val blob = RoaringBitmaps.encodeBlob(Array(0L, 1L, 5L))
    val dvName = s"deletion_vector_$DvUuid.bin"
    val dvOut = new DataOutputStream(new FileOutputStream(outRoot.resolve(dvName).toFile))
    dvOut.writeByte(1) // format version
    dvOut.writeInt(blob.length) // big-endian size
    dvOut.write(blob)
    val crc = new java.util.zip.CRC32(); crc.update(blob)
    dvOut.writeInt(crc.getValue.toInt) // big-endian CRC-32
    dvOut.close()
    val dvZ85 = RoaringBitmaps.Z85.encodeUuid(DvUuid)

    // ---- v1: DV delete on part-00002 (remove + re-add with descriptor) ----
    val (f2, f2lo, f2hi) = files(2)
    val v1 = Seq(
      s"""{"remove":{"path":"$f2","deletionTimestamp":1700000001000,"dataChange":true}}""",
      s"""{"add":{"path":"$f2","partitionValues":{},"size":${sizes(f2)},""" +
        s""""modificationTime":1700000000000,"dataChange":true,"stats":"${statsJson(f2lo, f2hi)}",""" +
        s""""deletionVector":{"storageType":"u","pathOrInlineDv":"$dvZ85",""" +
        s""""offset":1,"sizeInBytes":${blob.length},"cardinality":3}}}""",
      """{"commitInfo":{"timestamp":1700000001000,"operation":"DELETE","operationParameters":{},"engineInfo":"foreign-engine/1.0"}}""")
    writeLines(outRoot.resolve("_delta_log/00000000000000000001.json"), v1)

    // ---- v2: plain append of the 4th file ----
    val (f3, f3lo, f3hi) = files(3)
    val v2 = Seq(
      s"""{"add":{"path":"$f3","partitionValues":{},"size":${sizes(f3)},""" +
        s""""modificationTime":1700000002000,"dataChange":true,"stats":"${statsJson(f3lo, f3hi)}"}}""",
      """{"commitInfo":{"timestamp":1700000002000,"operation":"WRITE","operationParameters":{"mode":"Append"},"engineInfo":"foreign-engine/1.0"}}""")
    writeLines(outRoot.resolve("_delta_log/00000000000000000002.json"), v2)

    // ---- classic checkpoint at v2, delta column layout ----
    writeCheckpoint(spark, outRoot, files, sizes, statsPlain, schemaString, config, dvZ85, blob.length)
    writeLines(outRoot.resolve("_delta_log/_last_checkpoint"),
      Seq("""{"version":2,"size":7}"""))

    spark.stop()
    println(s"fixture written to $outRoot")
    // recorded answers for ForeignTableSpec
    val live = (0L until 100L).filterNot(Set(70L, 71L, 75L)) ++ (100L until 130L)
    println(s"rows=${live.size} sumId=${live.sum} " +
      s"sumValue=${live.map(_ * 0.5).sum}")
  }

  /** Logical schema with name-mode mapping metadata, as delta-spark
    * records it: every field carries physicalName + columnMapping.id.
    */
  private def schemaJson(): String = {
    import org.apache.spark.sql.types._
    def md(id: Long, phys: String): Metadata = new MetadataBuilder()
      .putLong("delta.columnMapping.id", id)
      .putString("delta.columnMapping.physicalName", phys).build()
    StructType(Seq(
      StructField("id", LongType, nullable = true, md(1, PhysId)),
      StructField("name", StringType, nullable = true, md(2, PhysName)),
      StructField("value", DoubleType, nullable = true, md(3, PhysValue))
    )).json
  }

  private def writeCheckpoint(spark: SparkSession, outRoot: Path,
      files: Seq[(String, Long, Long)], sizes: Map[String, Long],
      statsPlain: (Long, Long) => String, schemaString: String,
      config: String, dvZ85: String, dvSize: Int): Unit = {
    val schema = graft.log.Checkpoint.deltaCheckpointSchema
    // column order: txn, add, remove, metaData, domainMetadata, protocol
    val protoRow = Row(null, null, null, null, null,
      Row(3, 7, Seq("columnMapping", "deletionVectors"),
        Seq("columnMapping", "deletionVectors")))
    val metaRow = Row(null, null, null,
      Row("11111111-2222-3333-4444-555555555555", null, null,
        Row("parquet", Map.empty[String, String]), schemaString,
        Seq.empty[String],
        Map("delta.columnMapping.mode" -> "name",
          "delta.columnMapping.maxColumnId" -> "3"),
        1700000000000L),
      null, null)
    val txnRow = Row(Row("foreign-app", 7L, 1700000002000L), null, null, null, null, null)
    val addRows = files.zipWithIndex.map { case ((name, lo, hi), i) =>
      val dv = if (i == 2)
        Row("u", dvZ85, 1, dvSize, 3L, null)
      else null
      Row(null,
        Row(name, Map.empty[String, String], sizes(name), 1700000000000L,
          false, statsPlain(lo, hi), null, dv, null, null),
        null, null, null, null)
    }
    val rows = Seq(protoRow, metaRow, txnRow) ++ addRows
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val tmp = Files.createTempDirectory("foreign-ckpt")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.copy(part,
      outRoot.resolve("_delta_log/00000000000000000002.checkpoint.parquet"),
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
