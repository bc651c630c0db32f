package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session + row-set comparison helpers. */
trait SparkSuite extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def sfDir: String = "/root/testdata/sf0.001"

  def tempDir(prefix: String = "graft-test"): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Order-insensitive multiset equality (reference comparison semantics,
    * tests/utils.py:101-108).
    */
  def assertSameRows(got: DataFrame, expected: DataFrame): Unit = {
    assert(got.schema.fieldNames.sorted.sameElements(expected.schema.fieldNames.sorted),
      s"schema mismatch: ${got.schema.fieldNames.mkString(",")} vs ${expected.schema.fieldNames.mkString(",")}")
    val cols = got.schema.fieldNames.sorted.toSeq
    val g = got.select(cols.head, cols.tail: _*)
    val e = expected.select(cols.head, cols.tail: _*)
    val onlyGot = g.exceptAll(e).count()
    val onlyExpected = e.exceptAll(g).count()
    assert(onlyGot == 0 && onlyExpected == 0,
      s"row mismatch: $onlyGot rows only in result, $onlyExpected only in expected " +
        s"(result=${g.count()}, expected=${e.count()})")
  }
}
