package graft.log

import graft.storage.Location
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.hadoop.{ParquetFileWriter, ParquetReader}
import org.apache.parquet.schema.{MessageTypeParser, Types}

import scala.collection.immutable.SortedMap

/** Log checkpoints: a parquet snapshot of the table state at version V, so
  * opening a long-lived table replays ONE parquet file plus the JSON
  * entries after V instead of every commit since version 0.
  *
  * This is the driver-side scale feature the reference lacks entirely: at
  * 100 TB a table accumulates 10^4–10^6 commits, and listing + parsing
  * every JSON file per table open dominates planning time.
  *
  * Format: one UTF-8 action-JSON line per row (the exact NDJSON objects
  * the log stores), in `%020d.graft-checkpoint.parquet` beside the
  * commits, discovered via `_graft_last_checkpoint`. The names are
  * deliberately NOT delta's (`_last_checkpoint` / `N.checkpoint.parquet`):
  * the row layout here is graft-native (a `json` column rather than
  * delta's nested per-action structs), and a Delta-protocol engine that
  * honored delta's pointer would fail to parse it and refuse to open a
  * table it could otherwise read. With graft-specific names, foreign
  * readers never see the checkpoint and fall back to plain JSON replay —
  * cross-engine readability is preserved; only the replay speedup is
  * graft-local.
  *
  * JSON commit files are never deleted, so time travel below the
  * checkpoint falls back to full JSON replay.
  */
object Checkpoint {

  val LastCheckpointFile = "_graft_last_checkpoint"

  private val parquetSchema = MessageTypeParser.parseMessageType(
    "message graft_checkpoint { required binary json (UTF8); }")

  def checkpointFilename(v: Long): String = f"$v%020d.graft-checkpoint.parquet"

  /** Snapshot-state actions at the log's head: protocol, latest metadata,
    * the latest `txn` per streaming app (so idempotent sinks keep their
    * progress across the checkpoint fast path, as Delta checkpoints do),
    * every live add (replay result, not history).
    */
  private def snapshotActions(dlog: DeltaLog): Seq[Action] = {
    val protocol = dlog.entries.valuesIterator
      .flatMap(_.actions.collect { case p: Protocol => p })
      .toSeq.lastOption.getOrElse(Protocol())
    val metadata = dlog.entries.keys.toSeq.reverseIterator
      .flatMap(v => dlog.entries(v).metadataAction)
      .nextOption()
      .getOrElse(throw new IllegalStateException("cannot checkpoint an empty log"))
    var txns = scala.collection.immutable.ListMap.empty[String, Txn]
    dlog.entries.valuesIterator.foreach(_.actions.foreach {
      case t: Txn => txns = txns.updated(t.appId, t)
      case _ => ()
    })
    Seq(protocol, metadata) ++ txns.values ++ dlog.addActions.values
  }

  /** Write the checkpoint for the log's current version and point
    * the pointer file at it.
    */
  def write(dlog: DeltaLog, conf: Configuration): Unit = {
    val v = dlog.version
    val actions = snapshotActions(dlog)
    val out = dlog.loc.child(checkpointFilename(v))
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(out.path, conf))
      .withType(parquetSchema)
      .withConf(conf)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .build()
    val factory = new SimpleGroupFactory(parquetSchema)
    try actions.foreach { a =>
      writer.write(factory.newGroup().append("json", a.toLine))
    } finally writer.close()
    dlog.loc.child(LastCheckpointFile)
      .writeString(s"""{"version":$v,"size":${actions.size}}""")
    gcOldCheckpoints(dlog.loc, keep = 2, conf)
  }

  private val CheckpointRe = "^(\\d+)\\.graft-checkpoint\\.parquet$".r
  private val LegacyCheckpointRe = "^(\\d+)\\.checkpoint\\.parquet$".r

  /** True iff `name` is a parquet file with graft's one-json-column row
    * layout — i.e. a checkpoint written by a pre-rename graft build under
    * Delta's filename. A genuine Delta-protocol checkpoint (nested
    * per-action structs) never matches.
    */
  private def isGraftLayout(loc: Location, name: String, conf: Configuration): Boolean =
    try {
      val in = HadoopInputFile.fromPath(loc.child(name).path, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try reader.getFooter.getFileMetaData.getSchema.equals(parquetSchema)
      finally reader.close()
    } catch { case _: Exception => false }

  /** Drop superseded checkpoint files, keeping the newest `keep` so a
    * reader that just fetched the pointer never loses its file.
    *
    * Also removes checkpoints orphaned by the round-3 rename: earlier graft
    * builds wrote `N.checkpoint.parquet` + `_last_checkpoint` (Delta's
    * names) with graft's row layout, which breaks foreign readers that
    * honor Delta's pointer. Those are deleted here — gated on the layout
    * check, so a real Delta engine's checkpoint is never touched — and the
    * legacy pointer goes with them once its target is gone (for a Delta
    * reader a missing pointer just means JSON replay).
    */
  private def gcOldCheckpoints(loc: Location, keep: Int, conf: Configuration): Unit = {
    var legacy = List.empty[String]
    val versions = loc.listSorted().flatMap { st =>
      st.getPath.getName match {
        case CheckpointRe(v) => Some(v.toLong)
        case LegacyCheckpointRe(_) => legacy ::= st.getPath.getName; None
        case _ => None
      }
    }
    versions.sorted.dropRight(keep).foreach { v =>
      try loc.fs.delete(loc.child(checkpointFilename(v)).path, false)
      catch { case _: Exception => () }
    }
    val removedLegacy = legacy.filter(isGraftLayout(loc, _, conf))
    removedLegacy.foreach { name =>
      try loc.fs.delete(loc.child(name).path, false)
      catch { case _: Exception => () }
    }
    if (removedLegacy.nonEmpty) {
      val ptr = loc.child("_last_checkpoint")
      val target =
        try Json.longOpt(Json.mapper.readTree(ptr.readString()), "version")
        catch { case _: Exception => None }
      val targetGone = target.exists { v =>
        removedLegacy.contains(f"$v%020d.checkpoint.parquet")
      }
      if (targetGone)
        try loc.fs.delete(ptr.path, false)
        catch { case _: Exception => () }
    }
  }

  /** The checkpoint pointer, if present and parseable. */
  def lastCheckpointVersion(loc: Location): Option[Long] = {
    val ptr = loc.child(LastCheckpointFile)
    if (!ptr.exists) None
    else
      try Json.longOpt(Json.mapper.readTree(ptr.readString()), "version")
      catch { case _: Exception => None }
  }

  /** Read the checkpoint at version `v` into a synthetic base entry. */
  def read(loc: Location, v: Long, conf: Configuration): DeltaLogEntry = {
    val file = loc.child(checkpointFilename(v))
    val reader = ParquetReader
      .builder(new GroupReadSupport(), file.path)
      .withConf(conf)
      .build()
    val actions = Vector.newBuilder[Action]
    try {
      var g: Group = reader.read()
      while (g != null) {
        actions += Action.parse(g.getString("json", 0))
        g = reader.read()
      }
    } finally reader.close()
    DeltaLogEntry(actions.result())
  }

  /** Load the log via the checkpoint fast path: the checkpoint becomes the
    * base entry at its version; only JSON entries AFTER it are parsed.
    * Returns None when no usable checkpoint exists (caller falls back to
    * full JSON replay).
    */
  def loadFrom(loc: Location, conf: Configuration): Option[DeltaLog] =
    lastCheckpointVersion(loc).flatMap { v =>
      try {
        val base = read(loc, v, conf)
        var entries = SortedMap[Long, DeltaLogEntry](v -> base)
        loc.listSorted().foreach { st =>
          val name = st.getPath.getName
          if (DeltaLog.EntryFilenameRe.matches(name)) {
            val ev = name.split("\\.", 2)(0).toLong
            if (ev > v)
              entries = entries.updated(ev, DeltaLogEntry.fromNdjson(loc.child(name).readString()))
          }
        }
        Some(DeltaLog(loc, entries))
      } catch { case _: Exception => None }
    }
}
