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

  final case class DvRef(sidecar: String, cardinality: Long)

  def refOf(a: AddFile): Option[DvRef] =
    a.extra.get(ExtraKey).map { node =>
      DvRef(
        Json.strOpt(node, "sidecar").getOrElse(
          throw new IllegalArgumentException(s"deletionVector without sidecar on ${a.path}")),
        Json.longOpt(node, "cardinality").getOrElse(0L))
    }

  def withRef(a: AddFile, ref: DvRef): AddFile = {
    val node = Json.obj()
    node.put("sidecar", ref.sidecar)
    node.put("cardinality", ref.cardinality)
    a.copy(extra = a.extra + (ExtraKey -> (node: JsonNode)), dataChange = true)
  }

  /** Dead rows `(path, row_index)` of the given refs, deduplicated across
    * sidecars (distinct refs may share a sidecar directory).
    */
  def deadRows(spark: SparkSession, refs: Iterable[DvRef], tableRoot: Location,
      conf: Configuration): DataFrame = {
    val dirs = refs.map(_.sidecar).toSeq.distinct
      .map(s => Location.resolve(s, tableRoot, conf).uri)
    if (dirs.isEmpty) DeltaScan.emptyDF(spark, sidecarSchema)
    else spark.read.schema(sidecarSchema).parquet(dirs: _*)
  }

  /** Sidecar directory URIs referenced by any of `adds` (vacuum's live set). */
  def referencedSidecarUris(adds: Iterable[AddFile], tableRoot: Location,
      conf: Configuration): Set[String] =
    adds.flatMap(refOf(_)).map(r =>
      Location.canonical(Location.resolve(r.sidecar, tableRoot, conf).uri)).toSet

  /** Clone support: re-point a relative sidecar ref at the source table. */
  def rewriteRefAbsolute(a: AddFile, srcRoot: Location, conf: Configuration): AddFile =
    refOf(a) match {
      case Some(ref) =>
        withRef(a, ref.copy(sidecar = Location.resolve(ref.sidecar, srcRoot, conf).uri))
      case None => a
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
