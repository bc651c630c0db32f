package graft.log

import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}

/** Generated columns — Delta's `delta.generationExpression` convention:
  * a column whose value is a deterministic SQL expression over the row's
  * other columns, recorded in `StructField` metadata and COMPUTED AT WRITE
  * TIME when the writer doesn't supply it (supplied values are validated
  * against the expression, delta-spark's rule).
  *
  * The canonical use is partitioning on a derived value — e.g.
  * `event_date DATE GENERATED ALWAYS AS (CAST(ts AS DATE))`, partition by
  * `event_date` — which at 100 TB gives date-pruned scans without every
  * producer having to remember the derivation: the table computes it.
  */
object Generated {

  /** Delta's field-metadata key holding the generation SQL. */
  val ExprKey = "delta.generationExpression"

  /** name -> generation SQL for every generated field of the schema. */
  def expressions(schema: StructType): Map[String, String] =
    schema.fields.flatMap { f =>
      if (f.metadata.contains(ExprKey)) Some(f.name -> f.metadata.getString(ExprKey))
      else None
    }.toMap

  def withExpr(f: StructField, sql: String): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(ExprKey, sql).build())
}

/** Column DEFAULT values — delta's `allowColumnDefaults` writer feature:
  * a constant SQL expression recorded under Spark's `CURRENT_DEFAULT`
  * field-metadata key (the exact key delta-spark writes), substituted at
  * WRITE time when the writer omits the column. Existing rows are never
  * touched: delta deliberately forbids adding a column and its default
  * in one statement, so a default only ever applies to future inserts
  * and there is no EXISTS_DEFAULT backfill problem.
  *
  * Unlike generated columns the expression may reference NO other
  * columns (it must be constant-foldable — delta's rule), which is what
  * makes the write-side fill a literal projection with zero plan cost.
  */
object Defaults {

  /** Spark/delta's field-metadata key for the active default. */
  val CurrentKey = "CURRENT_DEFAULT"

  val Feature = "allowColumnDefaults"

  /** name -> default SQL for every defaulted field of the schema. */
  def expressions(schema: StructType): Map[String, String] =
    schema.fields.flatMap { f =>
      if (f.metadata.contains(CurrentKey))
        Some(f.name -> f.metadata.getString(CurrentKey))
      else None
    }.toMap

  def withDefault(f: StructField, sql: String): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(CurrentKey, sql).build())

  def withoutDefault(f: StructField): StructField = {
    val b = new MetadataBuilder().withMetadata(f.metadata)
    b.remove(CurrentKey)
    f.copy(metadata = b.build())
  }
}
