package graft

import graft.log.{Action, AddFile, CommitInfo, Json, Metadata, Protocol, RemoveFile, Txn}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

import scala.jdk.CollectionConverters._

/** Delta-protocol conformance of the JSON log itself — the write-side
  * complement to the fixture REPLAY tests (LogSpec): every action graft
  * emits must use delta's exact field vocabulary, so a foreign
  * delta-protocol reader parses our log without special cases. The
  * ground truth is twofold: the delta-rs-written fixture under
  * `/_delta_log` (reference tests/fixtures), and the protocol's
  * documented field sets. This is the strongest cross-engine evidence
  * available offline (reference tests/test_compatibility.py:20-168 runs
  * live engines; no delta jars exist here).
  */
class LogConformanceSpec extends SparkSuite {

  private def nation = spark.read.parquet(s"$sfDir/nation.parquet")

  // delta's field vocabulary per action (protocol + delta-rs/delta-spark
  // writers); graft may emit a SUBSET, never a key outside it — except
  // the documented graft extension: deletionVector.sidecar
  private val allowed: Map[String, Set[String]] = Map(
    "protocol" -> Set("minReaderVersion", "minWriterVersion",
      "readerFeatures", "writerFeatures"),
    "metaData" -> Set("id", "name", "description", "format", "schemaString",
      "partitionColumns", "configuration", "createdTime"),
    "add" -> Set("path", "partitionValues", "size", "modificationTime",
      "dataChange", "stats", "tags", "deletionVector", "baseRowId",
      "defaultRowCommitVersion", "clusteringProvider"),
    "remove" -> Set("path", "deletionTimestamp", "dataChange",
      "extendedFileMetadata", "partitionValues", "size", "stats", "tags",
      "deletionVector", "baseRowId", "defaultRowCommitVersion"),
    "txn" -> Set("appId", "version", "lastUpdated"))
  // commitInfo is free-form per the protocol ("implementations are free
  // to store any valid JSON") — not key-checked

  private def actionsOf(dir: String): Seq[(String, com.fasterxml.jackson.databind.JsonNode)] = {
    val logDir = new java.io.File(s"$dir/_delta_log")
    logDir.listFiles().toSeq.filter(_.getName.matches("\\d+\\.json")).sortBy(_.getName)
      .flatMap { f =>
        scala.io.Source.fromFile(f).getLines().filter(_.nonEmpty).map { line =>
          val root = Json.mapper.readTree(line)
          val names = root.fieldNames.asScala.toList
          assert(names.size == 1, s"one action per NDJSON line, got $names")
          names.head -> root.get(names.head)
        }.toList
      }
  }

  test("every emitted action uses delta's field vocabulary") {
    val d = tempDir("conform")
    var t = DeltaTable.forPath(d)
      .write(nation, partitionBy = Some(Seq("n_regionkey")))
    t = t.write(nation)
    t = t.delete(spark, Some(col("n_nationkey") === 1))          // CoW: add + remove
    t = t.deleteMergeOnRead(spark, Some(col("n_nationkey") === 2)) // DV re-add
    val acts = actionsOf(d)
    val kinds = acts.map(_._1).toSet
    assert(Set("protocol", "metaData", "add", "remove", "commitInfo").subsetOf(kinds), kinds)
    acts.foreach { case (kind, body) =>
      assert(allowed.contains(kind) || kind == "commitInfo", s"unknown action type $kind")
      if (kind != "commitInfo") {
        // the one documented graft extension rides INSIDE deletionVector,
        // not at action level — nothing else may stick out
        val extra = body.fieldNames.asScala.toSet -- allowed(kind)
        assert(extra.isEmpty, s"$kind carries non-delta keys: $extra")
      }
    }
    // required keys are present where delta requires them
    acts.collect { case ("add", b) => b }.foreach { b =>
      assert(Set("path", "partitionValues", "size", "modificationTime", "dataChange")
        .subsetOf(b.fieldNames.asScala.toSet))
      // stats is delta's JSON-string stats object with delta's key names
      val st = Json.mapper.readTree(b.get("stats").asText())
      assert(Set("numRecords", "minValues", "maxValues", "nullCount")
        .subsetOf(st.fieldNames.asScala.toSet))
      // partition values are the string-encoded map delta specifies
      assert(b.get("partitionValues").fieldNames.asScala.toSet == Set("n_regionkey"))
    }
    acts.collect { case ("metaData", b) => b }.foreach { b =>
      assert(b.get("format").get("provider").asText() == "parquet")
      // schemaString is delta's schema JSON = Spark's StructType.json
      val parsed = DataType.fromJson(b.get("schemaString").asText())
      assert(parsed.isInstanceOf[StructType])
      assert(b.get("partitionColumns").get(0).asText() == "n_regionkey")
    }
    acts.collect { case ("protocol", b) => b }.foreach { b =>
      assert(b.get("minReaderVersion").isInt && b.get("minWriterVersion").isInt)
    }
  }

  test("streaming txn actions conform") {
    val d = tempDir("conform-txn")
    val t = DeltaTable.forPath(d).write(nation.limit(5).coalesce(1))
    t.dlog.commit(graft.log.DeltaLogEntry(Vector(
      Txn(appId = "conform-app", version = 7L, lastUpdated = Some(123L)))))
    val txns = actionsOf(d).collect { case ("txn", b) => b }
    assert(txns.nonEmpty)
    txns.foreach { b =>
      assert(b.fieldNames.asScala.toSet.subsetOf(allowed("txn")))
      assert(b.get("appId").isTextual && b.get("version").canConvertToLong)
    }
  }

  test("the delta-rs fixture parses into typed actions, never RawAction") {
    (0 to 2).foreach { v =>
      val in = getClass.getResourceAsStream(f"/_delta_log/$v%020d.json")
      assert(in != null)
      val lines = scala.io.Source.fromInputStream(in).getLines().filter(_.nonEmpty)
      lines.foreach { line =>
        val a = Action.parse(line)
        val typed = a.isInstanceOf[Protocol] || a.isInstanceOf[Metadata] ||
          a.isInstanceOf[AddFile] || a.isInstanceOf[RemoveFile] ||
          a.isInstanceOf[CommitInfo] || a.isInstanceOf[Txn]
        assert(typed, s"fixture action fell back to RawAction: ${line.take(80)}")
        // and the round trip preserves the action type's single top key
        val back = Json.mapper.readTree(a.toLine)
        assert(back.fieldNames.asScala.toList ==
          Json.mapper.readTree(line).fieldNames.asScala.toList)
      }
    }
  }
}
