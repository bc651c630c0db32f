package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders, SparkSession}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** One-shot generator for `src/test/resources/foreign-delta-table-v3` —
  * the THIRD vendored foreign-conventions fixture (r12-verdict #8),
  * covering the read-interop combinations the first two don't:
  *
  *  - **inCommitTimestamp** (delta's ICT writer feature): every commit
  *    carries the authoritative `inCommitTimestamp` in commitInfo while
  *    the legacy `timestamp` field deliberately LAGS it — history and
  *    timestamp→version resolution must read the ICT clock, not the
  *    wall-clock field or file mtimes
  *  - **rowTracking with a MATERIALIZED row-id column**: v0's two adds
  *    carry `baseRowId`/`defaultRowCommitVersion`; v1 is a foreign
  *    OPTIMIZE (dataChange=false) compacting both files into one whose
  *    physical order is SHUFFLED (sorted by cat, id) and whose
  *    materialized `_row-id-col-…` parquet column carries each row's
  *    ORIGINAL id — fresh `baseRowId + position` alone would assign
  *    wrong ids, so the replay proves delta's resolution order
  *    (materialized value, else base + position)
  *  - **domainMetadata**: a live foreign domain updated across commits,
  *    plus a REMOVED domain tombstone that must stay hidden, plus the
  *    `delta.rowTracking` high-water-mark domain the next writer
  *    allocates above
  *  - **foreign field order**: commitInfo written FIRST in each commit
  *    file, action fields scrambled (`path` last, `stats` first) — the
  *    parser must be order-agnostic
  *  - a classic delta-layout checkpoint at v2 whose add structs carry
  *    TYPED `baseRowId`/`defaultRowCommitVersion` columns (delta-spark's
  *    checkpoint schema): after the JSON log is wiped, row ids, domains,
  *    the txn watermark and the ICT clock must all replay from the
  *    checkpoint alone
  *
  * Deterministic (fixed timestamps, closed-form row data); run via
  * `sbt "Test/runMain graft.tools.ForeignFixtureGenV3"` and commit the
  * output. ForeignTableSpec scenario 5 replays the committed fixture and
  * asserts the recorded answers — it never regenerates.
  *
  * Recorded answers: 120 rows (ids 0..119), Σid = 7140, Σamt = 3570.0;
  * `_row_id` = id for the 100 compacted rows (materialized) and id + 100
  * for the 20 appended rows (base 200 + position), Σ = 9140; ICTs
  * 1720000000100/200/300; rowIdHighWaterMark 219.
  */
object ForeignFixtureGenV3 {

  val MatCol = "_row-id-col-77777777-8888-4999-8aaa-bbbbbbbbbbbb"

  val F0 = "part-00000-30000000-aaaa-4aaa-8aaa-000000000000-c000.snappy.parquet"
  val F1 = "part-00001-31111111-bbbb-4bbb-8bbb-111111111111-c000.snappy.parquet"
  val F2 = "part-00002-32222222-cccc-4ccc-8ccc-222222222222-c000.snappy.parquet"
  val F3 = "part-00003-33333333-dddd-4ddd-8ddd-333333333333-c000.snappy.parquet"

  def main(args: Array[String]): Unit = {
    val outRoot = Paths.get("src/test/resources/foreign-delta-table-v3")
    deleteRecursively(outRoot)
    Files.createDirectories(outRoot.resolve("_delta_log"))

    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- data files ----
    def frame(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"),
      concat(lit("c"), (col("id") % 4).cast("string")).as("cat"),
      (col("id") * 0.5).as("amt"))
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Long = {
      val tmp = Files.createTempDirectory("foreignv3-gen")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.copy(part, outRoot.resolve(name), StandardCopyOption.REPLACE_EXISTING)
      Files.size(outRoot.resolve(name))
    }
    val s0 = writeOne(frame(0, 50), F0)
    val s1 = writeOne(frame(50, 100), F1)
    // the foreign OPTIMIZE output: all 100 rows physically re-ordered by
    // (cat, id), each carrying its ORIGINAL row id in the materialized col
    val s2 = writeOne(frame(0, 100).withColumn(MatCol, col("id"))
      .orderBy("cat", "id"), F2)
    val s3 = writeOne(frame(100, 120), F3)

    def stats(lo: Long, hi: Long): String = {
      val n = hi - lo
      s"""{\\"numRecords\\":$n,\\"minValues\\":{\\"id\\":$lo,\\"amt\\":${lo * 0.5}},""" +
        s"""\\"maxValues\\":{\\"id\\":${hi - 1},\\"amt\\":${(hi - 1) * 0.5}},""" +
        s"""\\"nullCount\\":{\\"id\\":0,\\"cat\\":0,\\"amt\\":0}}"""
    }
    // foreign field order: stats first, path LAST
    def add(name: String, size: Long, lo: Long, hi: Long, base: Long,
        drcv: Long, dataChange: Boolean): String =
      s"""{"add":{"stats":"${stats(lo, hi)}","dataChange":$dataChange,""" +
        s""""size":$size,"modificationTime":1720000000000,""" +
        s""""baseRowId":$base,"defaultRowCommitVersion":$drcv,""" +
        s""""partitionValues":{},"path":"$name"}}"""

    val schemaString = schemaJson().replace("\\", "\\\\").replace("\"", "\\\"")
    val protocolLine =
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["rowTracking","domainMetadata","inCommitTimestamp"]}}"""
    val metaLine =
      s"""{"metaData":{"configuration":{"delta.enableRowTracking":"true",""" +
        s""""delta.rowTracking.materializedRowIdColumnName":"$MatCol",""" +
        s""""delta.enableInCommitTimestamps":"true",""" +
        s""""delta.inCommitTimestampEnablementVersion":"0",""" +
        s""""delta.inCommitTimestampEnablementTimestamp":"1720000000100"},""" +
        s""""partitionColumns":[],"schemaString":"$schemaString",""" +
        s""""format":{"provider":"parquet","options":{}},""" +
        s""""id":"99999999-aaaa-4bbb-8ccc-dddddddddddd","createdTime":1720000000000}}"""
    // domainMetadata with scrambled field order (configuration first)
    def domain(name: String, cfg: String, removed: Boolean = false): String =
      s"""{"domainMetadata":{"configuration":"${cfg.replace("\"", "\\\"")}",""" +
        s""""removed":$removed,"domain":"$name"}}"""
    def commitInfo(op: String, ict: Long): String =
      s"""{"commitInfo":{"inCommitTimestamp":$ict,"timestamp":${ict - 1100000},""" +
        s""""operation":"$op","operationParameters":{},"engineInfo":"foreign-engine/3.0"}}"""

    // ---- v0: CTAS — commitInfo FIRST (delta-spark's own order) ----
    writeLines(outRoot.resolve("_delta_log/00000000000000000000.json"), Seq(
      commitInfo("CREATE TABLE AS SELECT", 1720000000100L),
      protocolLine, metaLine,
      domain("delta.rowTracking", """{"rowIdHighWaterMark":99}"""),
      domain("foreign.pipeline", """{"stage":"bronze"}"""),
      domain("foreign.retention", """{"days":30}"""),
      add(F0, s0, 0, 50, base = 0, drcv = 0, dataChange = true),
      add(F1, s1, 50, 100, base = 50, drcv = 0, dataChange = true)))

    // ---- v1: foreign OPTIMIZE — compaction with materialized row ids ----
    writeLines(outRoot.resolve("_delta_log/00000000000000000001.json"), Seq(
      commitInfo("OPTIMIZE", 1720000000200L),
      domain("delta.rowTracking", """{"rowIdHighWaterMark":199}"""),
      domain("foreign.pipeline", """{"stage":"silver"}"""),
      domain("foreign.retention", """{"days":30}""", removed = true),
      s"""{"remove":{"deletionTimestamp":1720000000200,"dataChange":false,"path":"$F0"}}""",
      s"""{"remove":{"deletionTimestamp":1720000000200,"dataChange":false,"path":"$F1"}}""",
      add(F2, s2, 0, 100, base = 100, drcv = 1, dataChange = false)))

    // ---- v2: append + txn watermark ----
    writeLines(outRoot.resolve("_delta_log/00000000000000000002.json"), Seq(
      commitInfo("WRITE", 1720000000300L),
      s"""{"txn":{"appId":"foreign-v3-app","version":4,"lastUpdated":1720000000300}}""",
      domain("delta.rowTracking", """{"rowIdHighWaterMark":219}"""),
      add(F3, s3, 100, 120, base = 200, drcv = 2, dataChange = true)))

    // ---- classic delta-layout checkpoint at v2, typed rowTracking cols
    val ckptLines = Seq(
      protocolLine, metaLine,
      s"""{"txn":{"appId":"foreign-v3-app","version":4,"lastUpdated":1720000000300}}""",
      domain("delta.rowTracking", """{"rowIdHighWaterMark":219}"""),
      domain("foreign.pipeline", """{"stage":"silver"}"""),
      domain("foreign.retention", """{"days":30}""", removed = true),
      s"""{"remove":{"deletionTimestamp":1720000000200,"dataChange":false,"path":"$F0"}}""",
      s"""{"remove":{"deletionTimestamp":1720000000200,"dataChange":false,"path":"$F1"}}""",
      add(F2, s2, 0, 100, base = 100, drcv = 1, dataChange = false),
      add(F3, s3, 100, 120, base = 200, drcv = 2, dataChange = true))
    val ckptDf = spark.read.schema(graft.log.Checkpoint.deltaCheckpointSchema)
      .json(spark.createDataset(ckptLines)(Encoders.STRING))
    val tmp = Files.createTempDirectory("foreignv3-ckpt")
    ckptDf.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.copy(part,
      outRoot.resolve("_delta_log/00000000000000000002.checkpoint.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    writeLines(outRoot.resolve("_delta_log/_last_checkpoint"),
      Seq(s"""{"version":2,"size":${ckptLines.size}}"""))

    spark.stop()
    println(s"fixture written to $outRoot")
    println(s"rows=120 sumId=${(0L until 120L).sum} sumAmt=${(0L until 120L).map(_ * 0.5).sum}")
    println(s"sumRowId=${(0L until 100L).sum + (200L until 220L).sum}")
  }

  private def schemaJson(): String = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("id", LongType),
      StructField("cat", StringType),
      StructField("amt", DoubleType))).json
  }

  private def writeLines(p: Path, lines: Seq[String]): Unit =
    Files.write(p, lines.mkString("\n").getBytes("UTF-8"))

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}
