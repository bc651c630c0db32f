package graft.sources

import graft.log.AddFile
import graft.storage.Location
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Log-backed [[FileIndex]]: the snapshot's live files served straight from
  * the transaction log — the architecture delta-spark's own scans use.
  *
  * What this buys over a path-listing scan at 100 TB:
  *
  *  - **Zero filesystem listing.** File sizes and modification times come
  *    from the log's `AddFile` entries; opening a 10⁵-file snapshot costs
  *    no `listStatus` storm against the object store.
  *  - **Stats skipping inside the PLANNER.** `listFiles` receives every
  *    partition and data filter Catalyst pushed down and evaluates them
  *    against log-recorded partition values and per-file min/max/
  *    nullCount/bloom (the same [[DataSkipping.FilePruner]] the driver-side
  *    `toDFWhere` uses) — so ANY `df.filter(...)` on ANY snapshot scan
  *    prunes files before tasks are planned, not just the opt-in
  *    `toDFWhere` path.
  *  - **Log-authoritative partition values** (reference semantics, S2):
  *    partition columns are attached from the log, never parsed from
  *    paths, so foreign layouts (zero-copy imports, clones) get the same
  *    single-relation plan as native writes — no more per-partition-group
  *    union fallback.
  */
final class GraftFileIndex(
    spark: SparkSession,
    private val tableRoot: Location,
    physSchema: StructType,
    partitionCols: Seq[String],
    adds: Seq[AddFile],
    hconf: Configuration) extends FileIndex {

  // Plan-identity equality: Spark's cache lookup and exchange reuse
  // compare CANONICALIZED plans, and LogicalRelation equality descends
  // into the relation's FileIndex. Without this, two scans of the same
  // snapshot built by different `toDF` calls never compare equal, every
  // cached-DataFrame lookup misses, and persisted intermediates
  // re-materialize per query (measured 3x on the dedup family).
  // Identity = table root + the exact live-file set (path, size,
  // modTime), compared as SORTED VALUES (never by 32-bit hash — a
  // collision would serve a stale cached VERSION; and sorting makes
  // checkpoint-fast-path vs JSON-replay handles of the same version,
  // whose replay orders differ, compare equal). STRICTER than
  // InMemoryFileIndex's root-path equality: two different VERSIONS of
  // one table correctly compare unequal.
  private lazy val addIdentity: Seq[(String, Long, Long)] =
    adds.map(a => (a.path, a.size, a.modificationTime)).sortBy(_._1)

  override def equals(other: Any): Boolean = other match {
    case g: GraftFileIndex =>
      g.tableRoot.uri == tableRoot.uri && g.addIdentity == addIdentity
    case _ => false
  }

  override def hashCode: Int = tableRoot.uri.hashCode * 31 + addIdentity.hashCode()

  override val partitionSchema: StructType =
    StructType(partitionCols.map(c => physSchema(c)))

  // metadata-only aggregate rule hooks: the live add-list this snapshot
  // scan serves, with the physical schema its stats are keyed under
  private[graft] def liveAdds: Seq[AddFile] = adds
  private[graft] def statsSchema: StructType = physSchema
  private[graft] def partitionColumnNames: Seq[String] = partitionCols

  private val resolved: Seq[(AddFile, Path)] =
    adds.map(a => a -> Location.resolve(a.path, tableRoot, hconf).path)

  override def rootPaths: Seq[Path] = Seq(tableRoot.path)

  override def sizeInBytes: Long = adds.map(_.size).sum

  override def inputFiles: Array[String] = resolved.map(_._2.toString).toArray

  override def refresh(): Unit = ()

  // partition strings were rendered by the WRITER in the session
  // timezone; casting them back must use the same zone or
  // timestamp-typed partition values shift
  private val sessionTz: String =
    spark.conf.get("spark.sql.session.timeZone",
      java.util.TimeZone.getDefault.getID)

  /** Cast a log-recorded partition string to its internal value. */
  private def partValue(s: Option[String], dt: org.apache.spark.sql.types.DataType): Any =
    s match {
      case None => null
      case Some(v) =>
        Cast(Literal.create(org.apache.spark.unsafe.types.UTF8String.fromString(v),
          StringType), dt, Some(sessionTz)).eval(null)
    }

  // Per-(snapshot, filter-set) memo: Spark asks the index for the same
  // listing more than once per query (PruneFileSourcePartitions at
  // optimization time, FileSourceScanExec.selectedPartitions at planning/
  // execution), and the stats pruner walks every file's min/max/bloom on
  // each ask. The snapshot is immutable (this index IS the snapshot), so
  // the listing is a pure function of the filter set — keyed on
  // CANONICALIZED expressions so exprId churn between identical asks
  // still hits. Bounded by the handful of distinct filter-sets a query
  // plans against one scan; lives only as long as the plan holds the
  // index. Cross-statement reuse needs no memo here: equal snapshots
  // compare equal (addIdentity above), so cached DataFrames/exchanges
  // already dedupe whole scans.
  private val listingMemo = new java.util.concurrent.ConcurrentHashMap[
    (Seq[Expression], Seq[Expression]), Seq[PartitionDirectory]]

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val key = (partitionFilters.map(_.canonicalized), dataFilters.map(_.canonicalized))
    listingMemo.computeIfAbsent(key,
      _ => listFilesUncached(partitionFilters, dataFilters))
  }

  private def listFilesUncached(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    GraftFileIndex.listingComputations.incrementAndGet()
    // PARTITION filters are the planner's contract: files returned for a
    // partition are NOT re-filtered on partition columns, so they must be
    // evaluated EXACTLY — done by binding the predicate over the
    // log-recorded partition values (the PartitioningAwareFileIndex
    // pattern). DATA filters may be conservative: the driver-side stats
    // pruner (min/max/nullCount/bloom) drops provably-dead files and
    // Spark still applies the exact predicate per row.
    val dataSurvivors: Seq[(AddFile, Path)] =
      dataFilters.reduceOption(And) match {
        case None => resolved
        case Some(p) =>
          val pruner = new DataSkipping.FilePruner(physSchema, partitionCols)
          val n = DataSkipping.normalize(p)
          resolved.filter { case (a, _) => pruner.mayMatch(n, a) }
      }
    // generated partition columns: filters on the SOURCE column imply
    // partition predicates (delta's OptimizeGeneratedColumn) — exact,
    // stats-free pruning for the common "partition on a derived date,
    // query by timestamp" shape, including imports with no footer stats
    val derived = GeneratedPruning.derive(dataFilters, physSchema,
      partitionCols, sessionTz)
    val partEval: InternalRow => Boolean =
      (partitionFilters ++ derived).reduceOption(And) match {
        case None => _ => true
        case Some(p) =>
          val bound = p.transform {
            case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
              val i = partitionCols.indexWhere(_ == a.name)
              require(i >= 0, s"partition filter references non-partition column ${a.name}")
              org.apache.spark.sql.catalyst.expressions.BoundReference(
                i, partitionSchema(i).dataType, nullable = true)
          }
          val pred = org.apache.spark.sql.catalyst.expressions.Predicate
            .createInterpreted(bound)
          row => pred.eval(row)
      }
    dataSurvivors
      .groupBy { case (a, _) => partitionCols.map(c => a.partitionValues.getOrElse(c, None)) }
      .toSeq
      .flatMap { case (values, group) =>
        val row = InternalRow.fromSeq(partitionCols.zip(values).map {
          case (c, v) => partValue(v, physSchema(c).dataType)
        })
        if (!partEval(row)) None
        else {
          // FileStatus materialized from the LOG (size + modTime ride the
          // AddFile) — no filesystem call per file
          val statuses = group.map { case (a, p) =>
            new FileStatus(a.size, false, 1, 0L, a.modificationTime, p)
          }.toArray
          Some(PartitionDirectory(row, statuses))
        }
      }
  }
}

object GraftFileIndex {

  /** Uncached [[GraftFileIndex.listFiles]] evaluations — the observable
    * for "pruner work runs once per (snapshot, filter-set)" assertions.
    */
  val listingComputations = new java.util.concurrent.atomic.AtomicLong(0L)

  /** The snapshot as ONE relation over the log-backed index: parquet
    * reads under the PHYSICAL schema, partition columns appended from the
    * index (log-authoritative), planner-time stats pruning via
    * [[GraftFileIndex.listFiles]].
    */
  def baseRelation(spark: SparkSession, tableRoot: Location, physSchema: StructType,
      partitionCols: Seq[String], adds: Seq[AddFile],
      hconf: Configuration): HadoopFsRelation = {
    val index = new GraftFileIndex(spark, tableRoot, physSchema, partitionCols, adds, hconf)
    val dataSchema = StructType(
      physSchema.fields.filterNot(f => partitionCols.contains(f.name)))
    HadoopFsRelation(index, index.partitionSchema, dataSchema,
      bucketSpec = None, fileFormat = new ParquetFileFormat(),
      options = Map.empty)(spark)
  }

  def relation(spark: SparkSession, tableRoot: Location, physSchema: StructType,
      partitionCols: Seq[String], adds: Seq[AddFile],
      hconf: Configuration): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .baseRelationToDataFrame(
        baseRelation(spark, tableRoot, physSchema, partitionCols, adds, hconf))
}
