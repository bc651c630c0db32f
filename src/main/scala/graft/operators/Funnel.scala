package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Filter-funnel accounting — the per-stage survival report every
  * production pretraining pipeline publishes (C4's table 1, Gopher's
  * A1.1 ablations, the Dolma/FineWeb "documents remaining after each
  * rule" funnel). Given an ORDERED list of named keep-predicates, report
  * for each stage how many documents ENTERED it (survived every earlier
  * stage), how many it dropped, and how many remain — the numbers that
  * tell you which rule is doing the work and which is dead weight
  * BEFORE you commit a 100 TB pass to the full pipeline.
  *
  * Scale shape: ONE corpus scan, no shuffle of rows — each stage's
  * survival is a cumulative AND folded left-to-right into per-row flags,
  * then a single map-side-combined aggregation sums the flags (stages ×
  * 1 longs per partition on the wire). A naive loop of
  * `df.filter(p1).count(); df.filter(p1 && p2).count(); …` re-reads the
  * corpus once per stage; this is the same report in one pass.
  *
  * A stage predicate that evaluates NULL drops the row (filter
  * semantics: only TRUE survives) — pinned in the spec.
  */
object Funnel {

  /** One row per stage, in order: stage rank (1-based), name, entered,
    * dropped, kept — plus a final "TOTAL" row (rank stages+1) with the
    * corpus size entering and surviving the whole funnel.
    */
  def report(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = df.sparkSession
    import spark.implicits._
    // cumulative survival flags: _s1 = p1 true; _si = _s(i-1) && pi true
    val flagged = stages.zipWithIndex.foldLeft(df) {
      case (acc, ((_, pred), i)) =>
        val surv = coalesce(pred, lit(false)).cast("long")
        acc.withColumn(s"_s${i + 1}",
          if (i == 0) surv else col(s"_s$i") * surv)
    }
    // coalesce: sum() over zero rows is NULL — an empty corpus must
    // degrade to an all-zeros report, not an NPE
    val aggs = count(lit(1)).as("_n") +:
      stages.indices.map(i =>
        coalesce(sum(col(s"_s${i + 1}")), lit(0L)).as(s"_k${i + 1}"))
    val row = flagged.agg(aggs.head, aggs.tail: _*).collect().head
    val total = row.getLong(0)
    val kept = stages.indices.map(i => row.getLong(i + 1))
    val perStage = stages.zipWithIndex.map { case ((name, _), i) =>
      val entered = if (i == 0) total else kept(i - 1)
      (i + 1L, name, entered, entered - kept(i), kept(i))
    }
    (perStage :+ ((stages.size + 1L, "TOTAL", total,
      total - kept.last, kept.last)))
      .toDF("rank", "stage", "entered", "dropped", "kept")
  }

  /** The funnel's survivors: rows passing every stage — the same
    * cumulative-AND the report counts, as a filter.
    */
  def survivors(df: DataFrame, stages: Seq[(String, Column)]): DataFrame =
    df.filter(stages.map(s => coalesce(s._2, lit(false))).reduce(_ && _))
}
