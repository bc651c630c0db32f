package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Multi-input resolution (reference dataset_utils.py:98-142): unify a
  * heterogeneous batch of inputs under one schema before a write.
  *
  * Spark collapses the reference's input zoo (Table/RecordBatch/Dataset/
  * pandas/paths) into `DataFrame`, so only the schema-mode semantics
  * remain: `merge` unifies fields (missing columns null-backfilled),
  * `common` intersects them (non-shared columns dropped) — reference
  * `dataset_utils.py:26-44`.
  */
object DatasetUtils {

  /** Union `dfs` under the given schema mode ("merge" | "common"). */
  def unionInputs(dfs: Seq[DataFrame], schemaMode: String = "merge"): DataFrame = {
    require(dfs.nonEmpty, "no inputs")
    schemaMode match {
      case "merge" =>
        dfs.reduce(_.unionByName(_, allowMissingColumns = true))
      case "common" =>
        val common = dfs.map(_.columns.toSeq).reduce((a, b) => a.filter(b.contains))
        require(common.nonEmpty, "Schemas have no common columns")
        dfs.map(_.select(common.map(col): _*)).reduce(_.unionByName(_))
      case other =>
        throw new IllegalArgumentException(s"Unknown schema mode: $other")
    }
  }
}
