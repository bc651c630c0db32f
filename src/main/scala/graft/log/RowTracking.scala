package graft.log

/** Delta's `rowTracking` writer feature: every data file owns a disjoint
  * fresh-row-id range `[baseRowId, baseRowId + numRecords)`, allocated at
  * commit time from a table-wide high-water mark stored as domainMetadata
  * under the `delta.rowTracking` domain. A row's fresh id is
  * `baseRowId + physical position`, so it is stable across commits that
  * do not rewrite its file, and deletion vectors never shift it (MoR
  * deletes keep survivors' positions).
  *
  * Scale shape: allocation is a driver-side fold over the commit's adds
  * (O(adds) metadata, no data pass), and the ids are NEVER materialized
  * at write — scans derive them from parquet reader metadata
  * (DeltaTable.toDFWithRowIds), so the feature costs zero bytes at rest
  * and zero shuffle at 100 TB.
  *
  * The high-water mark is exactly the snapshot-state domainMetadata this
  * engine checkpoints and replays (DeltaLog.domainMetadata), so it
  * survives log cleanup like delta-spark's does.
  */
object RowTracking {

  val Domain = "delta.rowTracking"
  val EnableKey = "delta.enableRowTracking"
  val Feature = "rowTracking"

  /** Config key naming the MATERIALIZED row-id column (delta-spark's own
    * key): dataChange=false rewrites (OPTIMIZE/auto-compact/REORG) write
    * each surviving row's stable id under this physical parquet column,
    * so ids survive file rewrites — fresh `baseRowId + position` only
    * covers rows still in their birth file. The name is minted once
    * (uuid-suffixed, delta-spark's format) when row tracking is enabled,
    * never collides with user columns, and is invisible to normal scans
    * (it is absent from the logical schema, so the read projection never
    * selects it).
    */
  val MaterializedColKey = "delta.rowTracking.materializedRowIdColumnName"

  def enabled(meta: Option[Metadata]): Boolean =
    meta.exists(_.configuration.get(EnableKey).contains("true"))

  def materializedCol(meta: Option[Metadata]): Option[String] =
    meta.flatMap(_.configuration.get(MaterializedColKey))

  def mintMaterializedCol(): String =
    s"_row-id-col-${java.util.UUID.randomUUID()}"

  /** Highest allocated row id, -1 when none allocated yet. */
  def highWaterMark(dlog: DeltaLog): Long =
    dlog.domainMetadata.get(Domain).flatMap { d =>
      try Json.longOpt(Json.mapper.readTree(d.configuration), "rowIdHighWaterMark")
      catch { case _: Exception => None }
    }.getOrElse(-1L)

  /** Assign fresh `baseRowId`s to `entry`'s unassigned adds and record
    * the advanced high-water mark as domainMetadata in the SAME commit
    * (atomic: a torn allocation cannot exist). Identity when the feature
    * is off or every add already carries an id (e.g. an OCC rebase
    * re-committing an already-assigned entry). Files without numRecords
    * stats cannot be ranged and fail loudly, as in delta.
    */
  def assign(entry: DeltaLogEntry, log: DeltaLog): DeltaLogEntry = {
    val meta = entry.metadataAction.orElse(log.latestMetadata)
    if (!enabled(meta)) return entry
    val unassigned = entry.actions.collect {
      case a: AddFile if a.baseRowId.isEmpty => a
    }
    if (unassigned.isEmpty) return entry
    var hwm = highWaterMark(log)
    val v = log.versionToWrite
    val assigned = unassigned.map { a =>
      val n = a.numRecords.getOrElse(throw new IllegalStateException(
        s"rowTracking requires numRecords stats to range row ids; " +
          s"file ${a.path} carries none"))
      val base = hwm + 1
      hwm += n
      a.path -> a.withRowIds(base, v)
    }.toMap
    val dm = DomainMetadata(Domain, s"""{"rowIdHighWaterMark":$hwm}""")
    DeltaLogEntry(entry.actions.map {
      case a: AddFile => assigned.getOrElse(a.path, a)
      case x => x
    } :+ dm)
  }
}
