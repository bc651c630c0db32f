package graft.log

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame}

/** Column mapping: RENAME/DROP COLUMN as metadata-only commits, no data
  * rewrite — Delta's `columnMapping.mode = name` convention (the reference
  * has no rename at all; delta-rs/delta-spark rewrite nothing either).
  *
  * The contract: every logical field carries its parquet ("physical")
  * column name in `StructField` metadata under Delta's key; physical names
  * NEVER change once a file is written. A rename changes only the logical
  * name; a drop removes the logical field and leaves the physical column
  * dead in old files; a column added while mapping is active gets a fresh
  * `col-<uuid>` physical name so re-adding a dropped column can never
  * resurrect stale values from pre-drop files.
  *
  * At 100 TB this is the difference between an O(1) commit and a
  * full-table rewrite: renaming a column on a 10⁵-file table touches one
  * JSON log entry.
  *
  * Scale/plan notes: scans read parquet under the PHYSICAL schema and
  * alias back to logical names in the same projection — Catalyst collapses
  * the alias into the scan, so pushdown/pruning/codegen are identical to
  * an unmapped table (plan-spec asserted). Driver-side data skipping
  * rewrites predicates logical→physical and probes footer stats under
  * physical keys, so skipping keeps working across renames.
  */
object ColumnMapping {

  /** Delta's field-metadata key for the parquet column name. */
  val PhysicalNameKey = "delta.columnMapping.physicalName"

  /** Delta's field-metadata key for the parquet FIELD ID (id mode). */
  val IdKey = "delta.columnMapping.id"

  /** Spark's field-metadata key that makes the parquet writer stamp a
    * field_id into the file schema.
    */
  val ParquetFieldIdKey = "parquet.field.id"

  /** Delta's table-configuration key; "name" or "id" marks mapping
    * active (id-mode tables also carry physicalName on every field per
    * the protocol, so name-addressed reads stay correct — the extra
    * obligation id mode puts on US is writing real parquet field ids).
    */
  val ModeConfigKey = "delta.columnMapping.mode"

  def modeOf(configuration: Map[String, String]): String =
    configuration.getOrElse(ModeConfigKey, "none")

  /** Write-side schema reconcile for an id-mode table: merge
    * `parquet.field.id` metadata (from the table schema's
    * `delta.columnMapping.id`) into the frame's schema RECURSIVELY —
    * nested struct fields included, wherever they appear (struct, array
    * element, map key/value) — then apply it with `Dataset.to`, the one
    * mechanism that can attach NESTED field metadata (an alias only
    * reaches top level, which is how id-mode files used to ship nested
    * columns id-less that id-addressed foreign readers cannot bind).
    * Spark's parquet writer (`spark.sql.parquet.fieldId.write.enabled`,
    * default on) stamps the ids at every level. Top-level fields match
    * by PHYSICAL name (`toPhysical` has already renamed them); nested
    * fields match by field name (nested physical renames are refused at
    * commit time — see the id gate). No-op for name/none modes or
    * id-less schemas.
    */
  def attachFieldIds(df: DataFrame, tableSchema: StructType): DataFrame = {
    // nested physical renames would make this match bind the wrong
    // parquet column name (nested matching is by field name): refuse the
    // write loudly rather than ship files name-addressed readers of this
    // table cannot find
    def assertNoNestedRenames(prefix: Seq[String],
        dt: org.apache.spark.sql.types.DataType, top: Boolean): Unit = dt match {
      case st: StructType => st.fields.foreach { f =>
        if (!top && physicalName(f) != f.name)
          throw new IllegalStateException(
            s"columnMapping: nested column ${(prefix :+ f.name).mkString(".")} " +
              s"carries physicalName '${physicalName(f)}' differing from its " +
              "field name — nested physical renames are not supported by " +
              "this writer")
        assertNoNestedRenames(prefix :+ f.name, f.dataType, top = false)
      }
      case org.apache.spark.sql.types.ArrayType(e, _) =>
        assertNoNestedRenames(prefix, e, top = false)
      case org.apache.spark.sql.types.MapType(k, v, _) =>
        assertNoNestedRenames(prefix, k, top = false)
        assertNoNestedRenames(prefix, v, top = false)
      case _ =>
    }
    assertNoNestedRenames(Seq.empty, StructType(tableSchema.fields), top = true)
    var any = false
    def mergeDt(d: org.apache.spark.sql.types.DataType,
        t: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType =
      (d, t) match {
        case (ds: StructType, ts: StructType) => mergeSt(ds, ts)
        case (org.apache.spark.sql.types.ArrayType(de, n),
              org.apache.spark.sql.types.ArrayType(te, _)) =>
          org.apache.spark.sql.types.ArrayType(mergeDt(de, te), n)
        case (org.apache.spark.sql.types.MapType(dk, dv, n),
              org.apache.spark.sql.types.MapType(tk, tv, _)) =>
          org.apache.spark.sql.types.MapType(mergeDt(dk, tk), mergeDt(dv, tv), n)
        case _ => d
      }
    def mergeSt(dfSt: StructType, tblSt: StructType): StructType = {
      val byName = tblSt.fields.map(f => f.name -> f).toMap
      StructType(dfSt.fields.map { f =>
        byName.get(f.name) match {
          case Some(t) =>
            val md =
              if (t.metadata.contains(IdKey)) {
                any = true
                new MetadataBuilder().withMetadata(f.metadata)
                  .putLong(ParquetFieldIdKey, t.metadata.getLong(IdKey)).build()
              } else f.metadata
            f.copy(dataType = mergeDt(f.dataType, t.dataType), metadata = md)
          case None => f
        }
      })
    }
    // top level keys by physical name (the frame is already physical)
    val topAsPhysical = StructType(tableSchema.fields.map(f =>
      f.copy(name = physicalName(f))))
    val target = mergeSt(df.schema, topAsPhysical)
    if (!any) df
    else df.select(target.fields.toSeq.map { f =>
      // top-level ids ride ALIAS metadata; NESTED ids ride the column's
      // DataType (a cast to the metadata-annotated struct type — the
      // parquet writer reads nested field ids from the schema's nested
      // StructField metadata, which an alias alone cannot reach).
      // `Dataset.to` looks like the natural tool but skips
      // metadata-only differences, silently writing no ids at all.
      val orig = df.schema(f.name).dataType
      val c = if (f.dataType.json == orig.json) col(f.name)
              else col(f.name).cast(f.dataType)
      c.as(f.name, f.metadata)
    }: _*)
  }

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalNameKey)) f.metadata.getString(PhysicalNameKey)
    else f.name

  def logicalToPhysical(schema: StructType): Map[String, String] =
    schema.fields.map(f => f.name -> physicalName(f)).toMap

  def isIdentity(mapping: Map[String, String]): Boolean =
    mapping.forall { case (l, p) => l == p }

  /** Schema with fields renamed to their physical names (for parquet
    * reads and stats probing). Field metadata rides along — harmless.
    */
  def physicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f => f.copy(name = physicalName(f))))

  /** Rename a DataFrame's columns logical→physical (write side). */
  def toPhysical(df: DataFrame, mapping: Map[String, String]): DataFrame =
    if (isIdentity(mapping)) df
    else df.select(df.columns.toSeq.map(c => col(c).as(mapping.getOrElse(c, c))): _*)

  /** Rewrite a user predicate's attributes logical→physical so driver-side
    * data skipping can probe footer stats (which are keyed by the parquet
    * column names). Exact-case names only — same contract as the schema.
    */
  def toPhysicalPredicate(pred: Column, mapping: Map[String, String]): Column =
    if (isIdentity(mapping)) pred
    else ColumnShim.column(ColumnShim.expression(pred).transform {
      case u: UnresolvedAttribute if u.nameParts.size == 1 && mapping.contains(u.name) =>
        UnresolvedAttribute(Seq(mapping(u.name)))
      case ar: AttributeReference if mapping.contains(ar.name) =>
        UnresolvedAttribute(Seq(mapping(ar.name)))
    })

  def withPhysical(f: StructField, phys: String): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(PhysicalNameKey, phys).build())

  /** Fresh physical name for a column born while mapping is active. */
  def freshPhysicalName(): String =
    "col-" + java.util.UUID.randomUUID().toString.replace("-", "").take(16)

  /** Annotate an incoming write schema for a mapped table: fields the
    * table already has inherit its physical names; NEW fields (schema
    * merge / overwrite) get fresh physical names. Identity when mapping
    * is inactive, so unmapped tables are byte-for-byte unaffected.
    */
  def annotateForWrite(tableSchema: Option[StructType], active: Boolean,
      incoming: StructType): StructType =
    if (!active) incoming
    else {
      val existing: Map[String, StructField] =
        tableSchema.map(s => s.fields.map(f => f.name -> f).toMap).getOrElse(Map.empty)
      StructType(incoming.fields.map { f =>
        existing.get(f.name) match {
          case Some(t) => withPhysical(f, physicalName(t))
          case None => withPhysical(f, freshPhysicalName())
        }
      })
    }
}
