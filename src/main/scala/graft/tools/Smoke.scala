package graft.tools

import graft.{DeltaTable}
import graft.log.WriteMode
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end smoke drive of the public DeltaTable API over real testdata.
  * Run: `sbt "runMain graft.tools.Smoke"` — prints each step's observation
  * and exits non-zero on any mismatch.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val n = li.count()
    val dir = java.nio.file.Files.createTempDirectory("graft-smoke").toString
    println(s"table dir: $dir  lineitem rows: $n")

    def check(label: String, got: Any, want: Any): Unit = {
      val ok = got == want
      println(f"${if (ok) "PASS" else "FAIL"}%-4s $label%-46s got=$got want=$want")
      if (!ok) sys.exit(1)
    }

    // v0 create + v1 append
    var dt = DeltaTable.forPath(dir)
    dt = dt.write(li)
    dt = dt.write(li)
    check("two appends: version", dt.version, 1L)
    check("two appends: count", dt.toDF(spark).count(), 2 * n)

    // time travel
    check("time travel v0 count", dt.loadAsVersion(0L).toDF(spark).count(), n)

    // overwrite
    val subset = li.filter(col("l_returnflag") === "R")
    val nr = subset.count()
    dt = dt.write(subset, mode = WriteMode.Overwrite)
    check("overwrite count", dt.toDF(spark).count(), nr)
    check("history newest op", dt.history.head._2.operation, "WRITE")

    // delete copy-on-write
    val nDel = dt.toDF(spark).filter(col("l_quantity") > 25).count()
    dt = dt.delete(spark, Some(col("l_quantity") > 25))
    check("delete(l_quantity>25) count", dt.toDF(spark).count(), nr - nDel)
    check("delete history op", dt.history.head._2.operation, "DELETE")

    // UPDATE copy-on-write
    val preUpdate = dt.toDF(spark).filter(col("l_quantity") <= 10).count()
    dt = dt.update(spark, Some(col("l_quantity") <= 10), Map("l_tax" -> lit(0.0)))
    check("update history op", dt.history.head._2.operation, "UPDATE")
    check("update zeroed rows",
      dt.toDF(spark).filter(col("l_tax") === 0.0 && col("l_quantity") <= 10).count(),
      preUpdate)

    // restore to pre-overwrite state (version 1)
    dt = dt.restore(1L)
    check("restore(1) count", dt.toDF(spark).count(), 2 * n)

    // clone preserves all versions
    val cdir = java.nio.file.Files.createTempDirectory("graft-clone").toString
    val clone = dt.cloneTo(cdir)
    check("clone current count", clone.toDF(spark).count(), 2 * n)
    check("clone v0 count", clone.loadAsVersion(0L).toDF(spark).count(), n)

    // partitioned table
    val pdir = java.nio.file.Files.createTempDirectory("graft-part").toString
    var pt = DeltaTable.forPath(pdir)
    pt = pt.write(li, partitionBy = Some(Seq("l_returnflag")))
    check("partitioned count", pt.toDF(spark).count(), n)
    check("partitioned filter", pt.toDF(spark).filter(col("l_returnflag") === "R").count(), nr)
    check("partition cols", pt.partitionColumns, Seq("l_returnflag"))

    // error / ignore modes
    val errGot = try { pt.write(li, mode = WriteMode.ErrorIfExists); "no-error" }
    catch { case _: java.nio.file.FileAlreadyExistsException => "FileAlreadyExists" }
    check("error mode raises", errGot, "FileAlreadyExists")
    check("ignore mode returns self", pt.write(li, mode = WriteMode.Ignore).version, pt.version)

    // schema mismatch on append; merge mode backfills nulls
    val extra = li.withColumn("extra_col", lit(1L))
    val mmGot = try { pt.write(extra); "no-error" }
    catch { case e: IllegalArgumentException =>
      if (e.getMessage.startsWith("Schema mismatch")) "Schema mismatch"
      else e.getMessage }
    check("schema mismatch raises", mmGot, "Schema mismatch")
    pt = pt.write(extra, schemaMode = "merge")
    check("merge append count", pt.toDF(spark).count(), 2 * n)
    check("merge null backfill", pt.toDF(spark).filter(col("extra_col").isNull).count(), n)

    // replaceWhere: atomic partition backfill
    val rwDir = java.nio.file.Files.createTempDirectory("graft-rw").toString
    var rw = DeltaTable.forPath(rwDir)
      .write(li, partitionBy = Some(Seq("l_returnflag")))
    val rwVersion = rw.version
    rw = rw.replaceWhere(spark, col("l_returnflag") === "R",
      li.filter(col("l_returnflag") === "R").withColumn("l_tax", lit(0.0)))
    check("replaceWhere one commit", rw.version, rwVersion + 1)
    check("replaceWhere count", rw.toDF(spark).count(), n)
    check("replaceWhere zeroed",
      rw.toDF(spark).filter(col("l_returnflag") === "R" && col("l_tax") =!= 0.0).count(), 0L)

    // delete everything (no predicate)
    pt = pt.delete(spark)
    check("delete-all count", pt.toDF(spark).count(), 0L)

    println("ALL SMOKE CHECKS PASSED")
    spark.stop()
  }
}
