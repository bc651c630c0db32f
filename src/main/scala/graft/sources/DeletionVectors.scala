package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import graft.log.{AddFile, Json}
import graft.storage.Location
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Merge-on-read deletion vectors: a DELETE that marks rows dead in a
  * sidecar instead of rewriting data files.
  *
  * The reference deletes copy-on-write only (xdlake/__init__.py:192-224):
  * dropping one row from a 1 GB file rewrites the full gigabyte. At 100 TB
  * that write amplification is the dominant cost of row-level deletes
  * (GDPR erasure, targeted decontamination), which is why Delta, Iceberg
  * and Hudi all grew a merge-on-read path. Graft's variant:
  *
  *  - A delete commit writes ONE sidecar parquet directory under
  *    `_graft_dv/` holding `(path, row_index)` of every dead row of every
  *    touched file (prior dead rows of a re-deleted file are merged in,
  *    so the newest sidecar is total per file — a file never needs more
  *    than one sidecar lookup at scan time).
  *  - Each touched `AddFile` is re-added (same data file, same stats) with
  *    `extra("deletionVector") = {"sidecar": <dir>, "cardinality": N}`.
  *    The JSON `extra` field round-trips through log replay, checkpoints
  *    (raw-line format) and foreign-file import untouched.
  *  - Scans anti-join only the DV'd files' rows against the dead set
  *    (`DeltaTable.scanAdds`/`dvScan` — the path every internal read,
  *    DELETE/UPDATE/MERGE/compact/CDF included, goes through); clean files
  *    keep their join-free whole-stage-codegen plan. Dead-set size is known
  *    driver-side from the recorded cardinalities, so the broadcast
  *    decision needs no job. `compact()` purges vectors (its rewrite reads
  *    through them); `vacuum()` keeps referenced sidecar dirs.
  *
  * Row identity is `(file basename, parquet row index)` via Spark's
  * `_metadata.file_path` / `_metadata.row_index` scan columns. Basenames
  * are UUID-unique for graft-written files; scans verify uniqueness
  * driver-side and fall back to exact per-file joins on the (rare)
  * imported-file collision.
  */
object DeletionVectors {

  /** `AddFile.extra` key carrying the DV reference. */
  val ExtraKey = "deletionVector"

  /** Sidecar directory name under the table root. */
  val DvDirName = "_graft_dv"

  /** Sidecar schema: the owning add's log path + dead row index. */
  val sidecarSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("row_index", LongType, nullable = false)))

  /** Above this many total dead rows the scan-side anti-join shuffles
    * instead of broadcasting (~tens of MB serialized at the threshold).
    */
  val BroadcastMaxDeadRows = 2L * 1000 * 1000

  /** A file's deletion-vector reference — either graft's parquet sidecar
    * or a delta-spec descriptor (PROTOCOL.md "Deletion Vectors": roaring
    * bitmap blobs, storageType u/i/p) recorded by a foreign writer.
    */
  sealed trait DvRef { def cardinality: Long }

  /** Graft's native ref: a `(path, row_index)` parquet sidecar dir. */
  final case class SidecarRef(sidecar: String, cardinality: Long) extends DvRef

  /** Delta-spec descriptor. `ownerPath` is the referencing add's recorded
    * path — delta DV row indexes are relative to the owning data file, so
    * resolution must re-key them under it. `offset` is present ONLY for
    * on-disk vectors (storageType u/p): the delta protocol omits it for
    * inline ("i") descriptors, and strict parsers (delta-kernel) REJECT
    * an inline descriptor that carries one.
    */
  final case class DeltaRef(storageType: String, pathOrInlineDv: String,
      offset: Option[Long], sizeInBytes: Long, cardinality: Long,
      ownerPath: String) extends DvRef

  object DvRef {
    /** Sidecar construction shorthand (the write path's spelling). */
    def apply(sidecar: String, cardinality: Long): SidecarRef =
      SidecarRef(sidecar, cardinality)
  }

  def refOf(a: AddFile): Option[DvRef] =
    a.extra.get(ExtraKey).map { node =>
      Json.strOpt(node, "sidecar") match {
        case Some(sc) => SidecarRef(sc, Json.longOpt(node, "cardinality").getOrElse(0L))
        case None =>
          val st = Json.strOpt(node, "storageType").getOrElse(
            throw new IllegalArgumentException(
              s"deletionVector on ${a.path} carries neither a graft sidecar " +
                "nor a delta storageType — cannot resolve its dead rows"))
          DeltaRef(st,
            Json.strOpt(node, "pathOrInlineDv").getOrElse(throw
              new IllegalArgumentException(s"deletionVector on ${a.path} has no pathOrInlineDv")),
            Json.longOpt(node, "offset"),
            Json.longOpt(node, "sizeInBytes").getOrElse(0L),
            Json.longOpt(node, "cardinality").getOrElse(0L),
            a.path)
      }
    }

  def withRef(a: AddFile, ref: DvRef): AddFile = {
    val node = Json.obj()
    ref match {
      case SidecarRef(sc, card) =>
        node.put("sidecar", sc)
        node.put("cardinality", card)
      case DeltaRef(st, poi, off, size, card, _) =>
        node.put("storageType", st)
        node.put("pathOrInlineDv", poi)
        off.foreach(node.put("offset", _))
        node.put("sizeInBytes", size)
        node.put("cardinality", card)
    }
    a.copy(extra = a.extra + (ExtraKey -> (node: JsonNode)), dataChange = true)
  }

  /** Resolve a delta descriptor's DV file path (storageType u/p). */
  def deltaDvPath(storageType: String, pathOrInlineDv: String,
      tableRoot: Location, conf: Configuration): org.apache.hadoop.fs.Path =
    storageType match {
      case "p" => Location.resolve(pathOrInlineDv, tableRoot, conf).path
      case "u" =>
        // pathOrInlineDv = <optional random prefix><20-char Z85 uuid>;
        // the file lives at <root>/<prefix>/deletion_vector_<uuid>.bin
        val prefix = pathOrInlineDv.dropRight(20)
        val uuid = RoaringBitmaps.Z85.decodeUuid(pathOrInlineDv.takeRight(20))
        val dir =
          if (prefix.isEmpty) tableRoot
          else tableRoot.child(prefix)
        dir.child(s"deletion_vector_$uuid.bin").path
      case other =>
        throw new IllegalArgumentException(s"no DV file for storageType '$other'")
    }

  /** Dead rows `(path, row_index)` of the given refs, deduplicated across
    * sidecars (distinct refs may share a sidecar directory). Delta-spec
    * refs decode in EXECUTORS (one task partition per slice of refs —
    * a 10⁵-file DV'd table must not funnel every bitmap through the
    * driver); their `path` is the owning add's recorded path, matching
    * the sidecar rows' recording-time-path convention.
    */
  def deadRows(spark: SparkSession, refs: Iterable[DvRef], tableRoot: Location,
      conf: Configuration): DataFrame = {
    val (sidecars, deltas) = refs.toSeq.partition(_.isInstanceOf[SidecarRef])
    val dirs = sidecars.collect { case SidecarRef(s, _) => s }.distinct
      .map(s => Location.resolve(s, tableRoot, conf).uri)
    val sidecarDf =
      if (dirs.isEmpty) DeltaScan.emptyDF(spark, sidecarSchema)
      else spark.read.schema(sidecarSchema).parquet(dirs: _*)
    if (deltas.isEmpty) sidecarDf
    else {
      import spark.implicits._
      import scala.jdk.CollectionConverters._
      val rootUri = tableRoot.uri
      // Hadoop conf as a plain serializable map (covers custom schemes)
      val confMap = conf.iterator().asScala.map(e => e.getKey -> e.getValue).toMap
      val descs = deltas.collect { case d: DeltaRef =>
        (d.ownerPath, d.storageType, d.pathOrInlineDv,
          d.offset.getOrElse(1L), d.sizeInBytes)
      }
      val deltaDf = spark.createDataset(descs)
        .flatMap { case (owner, st, poi, off, size) =>
          val blob: Array[Byte] =
            if (st == "i") RoaringBitmaps.Z85.decode(poi)
            else {
              val hconf = new Configuration(false)
              confMap.foreach { case (k, v) => hconf.set(k, v) }
              val root = Location(rootUri, hconf)
              val p = deltaDvPath(st, poi, root, hconf)
              val fs = p.getFileSystem(hconf)
              val in = fs.open(p)
              try {
                val version = in.readByte()
                require(version == 1, s"unsupported DV file version $version at $p")
                in.seek(off)
                val sz = in.readInt() // big-endian (DataInput)
                require(size <= 0 || sz == size,
                  s"DV size mismatch at $p: descriptor $size, stored $sz")
                val buf = new Array[Byte](sz)
                in.readFully(buf)
                val crc = in.readInt()
                val c = new java.util.zip.CRC32()
                c.update(buf)
                require(crc == c.getValue.toInt,
                  s"DV checksum mismatch at $p offset $off")
                buf
              } finally in.close()
            }
          RoaringBitmaps.decodeBlob(blob).toSeq.map(idx => (owner, idx))
        }.toDF("path", "row_index")
      sidecarDf.unionByName(deltaDf)
    }
  }

  /** Sidecar/DV-file URIs referenced by any of `adds` (vacuum's live set);
    * inline DVs contribute nothing.
    */
  def referencedSidecarUris(adds: Iterable[AddFile], tableRoot: Location,
      conf: Configuration): Set[String] =
    adds.flatMap(refOf(_)).flatMap {
      case SidecarRef(s, _) =>
        Some(Location.canonical(Location.resolve(s, tableRoot, conf).uri))
      case DeltaRef(st @ ("u" | "p"), poi, _, _, _, _) =>
        Some(Location.canonical(deltaDvPath(st, poi, tableRoot, conf).toString))
      case _ => None
    }.toSet

  /** Clone support: re-point a relative ref at the source table. Graft
    * sidecars resolve absolute; uuid-relative delta DVs become absolute
    * "p" refs (the uuid naming is root-relative and would dangle under
    * the clone's root); absolute/inline refs pass through.
    */
  def rewriteRefAbsolute(a: AddFile, srcRoot: Location, conf: Configuration): AddFile =
    refOf(a) match {
      case Some(ref: SidecarRef) =>
        withRef(a, ref.copy(sidecar = Location.resolve(ref.sidecar, srcRoot, conf).uri))
      case Some(ref @ DeltaRef("u", poi, _, _, _, _)) =>
        withRef(a, ref.copy(storageType = "p",
          pathOrInlineDv = deltaDvPath("u", poi, srcRoot, conf).toString))
      case _ => a
    }

  /** Drop dead rows from a scan of DV'd files. `df` must carry
    * `DeltaScan.MetaPath` / `DeltaScan.MetaRow`; the result keeps them.
    *
    * Fast path: one anti-join on (file basename, row index) — valid when
    * the DV'd basenames are unique, which the caller has verified. The
    * dead set is scoped to the scanned files' basenames BEFORE the join:
    * a shared sidecar also holds rows of files outside this scan (e.g. a
    * pruned scan of 2 of a commit's 1000 touched files), and without the
    * scope those rows would bloat the broadcast — and, were basenames
    * ever to collide across a sidecar, cross-kill live rows. (Collisions
    * inside one sidecar cannot happen: `deleteMergeOnRead` refuses to
    * write one, see its basename-uniqueness require.)
    */
  def dropDead(spark: SparkSession, df: DataFrame, dved: Seq[AddFile],
      tableRoot: Location, conf: Configuration): DataFrame = {
    val refs = dved.flatMap(refOf(_))
    if (refs.isEmpty) return df
    import spark.implicits._
    val totalDead = refs.map(_.cardinality).sum
    val names = broadcast(
      dved.map(a => new org.apache.hadoop.fs.Path(a.path).getName).toDF("_dv_name"))
    val dead0 = deadRows(spark, refs, tableRoot, conf)
      .select(substring_index(col("path"), "/", -1).as("_dv_name"),
        col("row_index").as("_dv_idx"))
      .join(names, Seq("_dv_name"), "left_semi")
    val dead = if (totalDead <= BroadcastMaxDeadRows) broadcast(dead0) else dead0
    df.join(dead,
        substring_index(col(DeltaScan.MetaPath), "/", -1) === col("_dv_name") &&
          col(DeltaScan.MetaRow) === col("_dv_idx"),
        "left_anti")
  }

  /** Exact per-file variant for basename collisions AMONG the scanned
    * DV'd files (each colliding file carries its own ref, committed by
    * separate deletes): each file's rows anti-join only its own sidecar's
    * entries for its basename. Basename — not exact log path — because a
    * clone rewrites add paths absolute while sidecar rows keep the
    * recording-time path; within one sidecar the basename is unique (the
    * write-side invariant above), so the match is still exact.
    */
  def dropDeadPerFile(spark: SparkSession, dfFor: AddFile => DataFrame,
      dved: Seq[AddFile], tableRoot: Location, conf: Configuration): DataFrame = {
    require(dved.nonEmpty, "dropDeadPerFile needs at least one add")
    dved.map { a =>
      refOf(a) match {
        case None => dfFor(a) // ref-less add: nothing dead, scan as-is
        case Some(ref) =>
          val name = new org.apache.hadoop.fs.Path(a.path).getName
          val dead = deadRows(spark, Seq(ref), tableRoot, conf)
            .filter(substring_index(col("path"), "/", -1) === lit(name))
            .select(col("row_index").as("_dv_idx"))
          dfFor(a).join(broadcast(dead), col(DeltaScan.MetaRow) === col("_dv_idx"), "left_anti")
      }
    }.reduce(_.union(_))
  }
}
