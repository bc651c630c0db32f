package graft.operators

import graft.DeltaTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Slowly-changing-dimension Type 2 maintenance (Kimball's versioned
  * dimension — the table keeps EVERY historical version of a row, with
  * `_valid_from` / `_valid_to` / `_is_current` bookkeeping columns).
  *
  * The whole apply is ONE atomic [[DeltaTable.merge]] commit: a changed
  * key's current row is CLOSED (an update of the existing
  * `(key, _valid_from)` row) and its new version INSERTED (a fresh
  * `(key, batchTime)` key) — expressing SCD2 as a plain whole-row upsert
  * on the composite key `(keyCols, _valid_from)` instead of a bespoke
  * multi-action writer. Unchanged keys (tracked columns null-safe-equal)
  * produce NO new version, so a full-snapshot source is re-appliable.
  *
  * Scale shape: change detection is one equi-join of the source against
  * only the CURRENT rows (stats/predicate-prunable on `_is_current`);
  * the merge then touches only files owning changed keys — history rows
  * are never rewritten, which is the point: an SCD2 table is append-mostly
  * and its history dwarfs its current set.
  */
object Scd {

  val ValidFrom = "_valid_from"
  val ValidTo = "_valid_to"
  val IsCurrent = "_is_current"

  /** Bootstrap: every row becomes the current version as of `asOf`. */
  def scdType2Init(df: DataFrame, asOf: Column): DataFrame =
    df.withColumn(ValidFrom, asOf.cast("timestamp_ntz"))
      .withColumn(ValidTo, lit(null).cast("timestamp_ntz"))
      .withColumn(IsCurrent, lit(true))

  /** Apply a source snapshot at `batchTime`: changed keys close + re-open,
    * new keys open, unchanged keys untouched. Source columns must equal
    * the table's value columns (everything except the bookkeeping three).
    */
  def scdType2Apply(spark: SparkSession, table: DeltaTable, source: DataFrame,
      keyCols: Seq[String], trackedCols: Seq[String],
      batchTime: Column): DeltaTable = {
    require(keyCols.nonEmpty && trackedCols.nonEmpty,
      "scdType2Apply needs key and tracked columns")
    val valueCols = table.toDF(spark).columns.toSeq
      .filterNot(Set(ValidFrom, ValidTo, IsCurrent))
    val ts = batchTime.cast("timestamp_ntz")
    val cur = table.toDF(spark).filter(col(IsCurrent))
    // changed = current rows whose tracked columns differ from the source
    // (null-safe), keyed join — the only per-row work in the apply
    val joined = cur.alias("t").join(source.alias("s"), keyCols)
    val changedPred = trackedCols
      .map(c => not(col(s"t.$c") <=> col(s"s.$c"))).reduce(_ || _)
    val changed = joined.filter(changedPred)
    val closes = changed.select(
      (keyCols.map(col) ++
        valueCols.filterNot(keyCols.contains).map(c => col(s"t.$c").as(c)) ++
        Seq(col(s"t.$ValidFrom").as(ValidFrom), ts.as(ValidTo),
          lit(false).as(IsCurrent))): _*)
    val changedNew = changed.select(
      (keyCols.map(col) ++
        valueCols.filterNot(keyCols.contains).map(c => col(s"s.$c").as(c))): _*)
    val brandNew = source.join(cur, keyCols, "left_anti")
      .select(valueCols.map(col): _*)
    val opens = changedNew.unionByName(brandNew)
      .withColumn(ValidFrom, ts)
      .withColumn(ValidTo, lit(null).cast("timestamp_ntz"))
      .withColumn(IsCurrent, lit(true))
    table.merge(spark, closes.unionByName(opens), keyCols :+ ValidFrom)
  }
}
