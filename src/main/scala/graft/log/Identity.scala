package graft.log

import org.apache.spark.sql.types.{LongType, Metadata => FieldMeta, MetadataBuilder, StructField, StructType}

/** Identity columns (delta's `identityColumns`, writer v6): a LongType
  * column whose values the ENGINE assigns as `start, start+step, …`,
  * with the last allocated value tracked as `delta.identity.highWaterMark`
  * in the field's schema metadata — delta-spark's exact keys, so a
  * foreign engine sees the same state. Allocation is per-write
  * (DeltaTable.applyIdentity): contiguous ids via `zipWithIndex` — the
  * same two-pass per-partition block allocation delta-spark performs
  * (one count task set, then offset arithmetic; no global sort, no
  * driver collect) — and the advanced mark rides the SAME commit's
  * metaData action, so a torn allocation cannot exist.
  */
object Identity {

  val StartKey = "delta.identity.start"
  val StepKey = "delta.identity.step"
  val HwmKey = "delta.identity.highWaterMark"
  val AllowKey = "delta.identity.allowExplicitInsert"

  final case class Spec(start: Long, step: Long, allowExplicitInsert: Boolean,
      highWaterMark: Option[Long])

  /** Identity specs declared in a schema's field metadata. */
  def specs(schema: StructType): Map[String, Spec] =
    schema.fields.flatMap { f =>
      val m = f.metadata
      if (m.contains(StartKey))
        Some(f.name -> Spec(
          m.getLong(StartKey),
          if (m.contains(StepKey)) m.getLong(StepKey) else 1L,
          m.contains(AllowKey) && m.getBoolean(AllowKey),
          if (m.contains(HwmKey)) Some(m.getLong(HwmKey)) else None))
      else None
    }.toMap

  private def fieldMeta(base: FieldMeta, sp: Spec): FieldMeta = {
    val b = new MetadataBuilder().withMetadata(base)
      .putLong(StartKey, sp.start)
      .putLong(StepKey, sp.step)
      .putBoolean(AllowKey, sp.allowExplicitInsert)
    sp.highWaterMark.foreach(b.putLong(HwmKey, _))
    b.build()
  }

  /** Attach `specs` to their fields (declaration time; fields must exist
    * and be LongType — identity is a bigint surface in delta).
    */
  def annotate(schema: StructType, sps: Map[String, Spec]): StructType =
    StructType(schema.fields.map { f =>
      sps.get(f.name) match {
        case Some(sp) =>
          require(f.dataType == LongType,
            s"identity column ${f.name} must be BIGINT, got ${f.dataType.simpleString}")
          f.copy(metadata = fieldMeta(f.metadata, sp))
        case None => f
      }
    })

  /** The schema with advanced high-water marks applied. */
  def withHwms(schema: StructType, hwms: Map[String, Long]): StructType =
    if (hwms.isEmpty) schema
    else StructType(schema.fields.map { f =>
      hwms.get(f.name) match {
        case Some(h) =>
          f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putLong(HwmKey, h).build())
        case None => f
      }
    })
}
