package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders, SparkSession}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** One-shot generator for `src/test/resources/foreign-delta-table-v4` —
  * the FOURTH vendored foreign-conventions fixture (r13-verdict #7),
  * covering the one read-interop combination the first three don't:
  * a **V2-checkpoint table with a multi-part CLASSIC fallback at the
  * same version, under `checkpointProtection`** — delta-spark's
  * compatibility-checkpoint shape, where a v2-capable reader takes the
  * UUID manifest + sidecars and a v2-unaware one the classic parts, and
  * BOTH must replay to identical state once the JSON log is cleaned:
  *
  *  - v1 checkpoint as a UUID-named manifest
  *    (`%020d.checkpoint.<uuid>.parquet`: protocol/metaData/domain +
  *    `checkpointMetadata` + two `sidecar` refs) whose file actions live
  *    in two FOREIGN-named (bare-uuid, no version prefix) sidecars under
  *    `_delta_log/_sidecars/`
  *  - the SAME state as a classic multi-part checkpoint
  *    (`%020d.checkpoint.%010d.%010d.parquet`, 2 parts) — graft's
  *    documented preference order (classic before v2, never mixed) gets
  *    exercised one way, and deleting the parts exercises the other
  *  - `checkpointProtection` declared (writer feature) with
  *    `delta.requireCheckpointProtectionBeforeVersion=1` — the
  *    protected-history boundary a log cleaner must honor
  *  - protocol at (3,7) with `v2Checkpoint` in BOTH feature lists and
  *    `delta.checkpointPolicy=v2`
  *
  * Deterministic (fixed timestamps, closed-form rows); run via
  * `sbt "Test/runMain graft.tools.ForeignFixtureGenV4"` and commit the
  * output. ForeignTableSpec scenario 6 replays the committed fixture and
  * asserts the recorded answers — it never regenerates.
  *
  * Recorded answers: live rows 70 (ids 0..29 ∪ 60..79 ∪ 120..139),
  * Σid = 4415, Σamt (= id·0.25) = 1103.75; v0 = 80 rows.
  */
object ForeignFixtureGenV4 {

  val F0 = "part-00000-40000000-aaaa-4aaa-8aaa-000000000000-c000.snappy.parquet"
  val F1 = "part-00001-41111111-bbbb-4bbb-8bbb-111111111111-c000.snappy.parquet"
  val F2 = "part-00002-42222222-cccc-4ccc-8ccc-222222222222-c000.snappy.parquet"
  val F3 = "part-00003-43333333-dddd-4ddd-8ddd-333333333333-c000.snappy.parquet"
  val S0 = "e1f2a3b4-0000-4aaa-8aaa-aaaaaaaaaaaa.parquet" // foreign sidecar names
  val S1 = "e1f2a3b4-1111-4bbb-8bbb-bbbbbbbbbbbb.parquet"
  val ManifestUuid = "c0ffee00-1234-4abc-8def-0123456789ab"

  def main(args: Array[String]): Unit = {
    val outRoot = Paths.get("src/test/resources/foreign-delta-table-v4")
    deleteRecursively(outRoot)
    Files.createDirectories(outRoot.resolve("_delta_log/_sidecars"))

    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- data files ----
    def frame(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"), (col("id") * 0.25).as("amt"))
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Long = {
      val tmp = Files.createTempDirectory("foreignv4-gen")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.copy(part, outRoot.resolve(name), StandardCopyOption.REPLACE_EXISTING)
      Files.size(outRoot.resolve(name))
    }
    val s0 = writeOne(frame(0, 30), F0)
    val s1 = writeOne(frame(30, 60), F1)
    val s2 = writeOne(frame(60, 80), F2)
    val s3 = writeOne(frame(120, 140), F3)

    def stats(lo: Long, hi: Long): String =
      s"""{\\"numRecords\\":${hi - lo},\\"minValues\\":{\\"id\\":$lo,\\"amt\\":${lo * 0.25}},""" +
        s"""\\"maxValues\\":{\\"id\\":${hi - 1},\\"amt\\":${(hi - 1) * 0.25}},""" +
        s"""\\"nullCount\\":{\\"id\\":0,\\"amt\\":0}}"""
    def add(name: String, size: Long, lo: Long, hi: Long): String =
      s"""{"add":{"stats":"${stats(lo, hi)}","dataChange":true,"size":$size,""" +
        s""""modificationTime":1730000000000,"partitionValues":{},"path":"$name"}}"""
    val removeF1 =
      s"""{"remove":{"deletionTimestamp":1730000000200,"dataChange":true,"path":"$F1"}}"""

    val schemaString = schemaJson().replace("\\", "\\\\").replace("\"", "\\\"")
    val protocolLine =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"],""" +
        """"writerFeatures":["v2Checkpoint","checkpointProtection","domainMetadata"]}}"""
    val metaLine =
      s"""{"metaData":{"configuration":{"delta.checkpointPolicy":"v2",""" +
        s""""delta.requireCheckpointProtectionBeforeVersion":"1"},""" +
        s""""partitionColumns":[],"schemaString":"$schemaString",""" +
        s""""format":{"provider":"parquet","options":{}},""" +
        s""""id":"44444444-aaaa-4bbb-8ccc-eeeeeeeeeeee","createdTime":1730000000000}}"""
    val domainLine =
      """{"domainMetadata":{"domain":"foreign.quality","configuration":"{\"tier\":\"gold\"}","removed":false}}"""
    def commitInfo(op: String, ts: Long): String =
      s"""{"commitInfo":{"timestamp":$ts,"operation":"$op",""" +
        s""""operationParameters":{},"engineInfo":"foreign-engine/4.0"}}"""

    // ---- v0: CTAS (3 files, 80 rows) ----
    writeLines(outRoot.resolve("_delta_log/00000000000000000000.json"), Seq(
      commitInfo("CREATE TABLE AS SELECT", 1730000000100L),
      protocolLine, metaLine, domainLine,
      add(F0, s0, 0, 30), add(F1, s1, 30, 60), add(F2, s2, 60, 80)))

    // ---- v1: delete F1's rows (remove) + append F3 ----
    writeLines(outRoot.resolve("_delta_log/00000000000000000001.json"), Seq(
      commitInfo("WRITE", 1730000000200L),
      removeF1, add(F3, s3, 120, 140)))

    // ---- checkpoint at v1, BOTH forms carrying the same state ----
    val stateLines = Seq(protocolLine, metaLine, domainLine)
    val fileLines = Seq(add(F0, s0, 0, 30), add(F2, s2, 60, 80),
      add(F3, s3, 120, 140), removeF1)
    def writeParquet(lines: Seq[String],
        schema: org.apache.spark.sql.types.StructType, dest: Path): Long = {
      val df = spark.read.schema(schema)
        .json(spark.createDataset(lines)(Encoders.STRING))
      val tmp = Files.createTempDirectory("foreignv4-ckpt")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.copy(part, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.size(dest)
    }
    val classic = graft.log.Checkpoint.deltaCheckpointSchema
    // foreign sidecars: file actions only, split across two bare-uuid files
    val szS0 = writeParquet(fileLines.take(2), classic,
      outRoot.resolve(s"_delta_log/_sidecars/$S0"))
    val szS1 = writeParquet(fileLines.drop(2), classic,
      outRoot.resolve(s"_delta_log/_sidecars/$S1"))
    // V2 manifest: state + checkpointMetadata + sidecar refs
    val manifestLines = stateLines ++ Seq(
      """{"checkpointMetadata":{"version":1}}""",
      s"""{"sidecar":{"path":"$S0","sizeInBytes":$szS0,"modificationTime":1730000000300}}""",
      s"""{"sidecar":{"path":"$S1","sizeInBytes":$szS1,"modificationTime":1730000000300}}""")
    writeParquet(manifestLines, graft.log.Checkpoint.v2ManifestSchema,
      outRoot.resolve(s"_delta_log/00000000000000000001.checkpoint.$ManifestUuid.parquet"))
    // classic multi-part fallback: the same state split across 2 parts
    writeParquet(stateLines ++ fileLines.take(1), classic, outRoot.resolve(
      "_delta_log/00000000000000000001.checkpoint.0000000001.0000000002.parquet"))
    writeParquet(fileLines.drop(1), classic, outRoot.resolve(
      "_delta_log/00000000000000000001.checkpoint.0000000002.0000000002.parquet"))
    writeLines(outRoot.resolve("_delta_log/_last_checkpoint"),
      Seq(s"""{"version":1,"size":${stateLines.size + fileLines.size + 1},"parts":2}"""))

    spark.stop()
    println(s"fixture written to $outRoot")
    val live = (0L until 30L) ++ (60L until 80L) ++ (120L until 140L)
    println(s"rows=${live.size} sumId=${live.sum} sumAmt=${live.map(_ * 0.25).sum}")
  }

  private def schemaJson(): String = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("id", LongType),
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
