package graft.log

import scala.jdk.CollectionConverters._

/** Liquid-clustering state (delta-spark's `clustering` writer feature):
  * the clustering columns live in `delta.clustering` domainMetadata as
  * `{"clusteringColumns":[["c1"],["c2"]]}` — an array of column PATHS
  * (each itself an array, for nested fields), which is delta-spark's
  * exact physical layout, so the state round-trips with a foreign
  * engine. Only top-level columns are supported here (nested clustering
  * keys cannot feed the Morton interleave anyway).
  */
object Clustering {

  val Domain = "delta.clustering"
  val Feature = "clustering"

  def render(cols: Seq[String]): String = {
    val arr = Json.mapper.createArrayNode()
    cols.foreach { c =>
      val path = Json.mapper.createArrayNode()
      path.add(c)
      arr.add(path)
    }
    val o = Json.obj()
    o.set[com.fasterxml.jackson.databind.JsonNode]("clusteringColumns", arr)
    o.toString
  }

  def parse(configuration: String): Seq[String] =
    try {
      val root = Json.mapper.readTree(configuration)
      val arr = root.get("clusteringColumns")
      if (arr == null || !arr.isArray) Seq.empty
      else arr.elements().asScala.map { path =>
        // a nested path like ["a","b"] re-joins with dots; graft only
        // ever writes single-segment paths
        path.elements().asScala.map(_.asText()).mkString(".")
      }.toSeq
    } catch { case _: Exception => Seq.empty }
}
