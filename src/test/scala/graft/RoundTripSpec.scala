package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Randomized round-trip tests over the full supported type matrix —
  * the reference's TableGen layer (tests/utils.py:21-98): K generated
  * tables appended, read back, compared order-insensitively to the
  * in-memory union; then delete/restore/clone/partitioned variants.
  * Seeded, so failures reproduce.
  */
class RoundTripSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("order", LongType, nullable = false),
    StructField("bool", BooleanType),
    StructField("i8", ByteType),
    StructField("i16", ShortType),
    StructField("i32", IntegerType),
    StructField("i64", LongType),
    StructField("f32", FloatType),
    StructField("f64", DoubleType),
    StructField("str", StringType),
    StructField("bin", BinaryType),
    StructField("date", DateType),
    StructField("ts_ntz", TimestampNTZType),
    StructField("cats", StringType),
    StructField("bats", IntegerType)))

  private var orderCounter = 0L

  /** 11-row table over the whole type matrix (reference rows=11). */
  private def genTable(rng: scala.util.Random): DataFrame = {
    val rows = (0 until 11).map { _ =>
      orderCounter += 1
      Row(
        orderCounter,
        rng.nextBoolean(),
        rng.nextInt().toByte,
        rng.nextInt().toShort,
        rng.nextInt(),
        rng.nextLong(),
        rng.nextFloat(),
        rng.nextDouble(),
        rng.alphanumeric.take(8).mkString,
        Array.fill(6)(rng.nextInt().toByte),
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(rng.nextInt(20000).toLong)),
        java.time.LocalDateTime.ofEpochSecond(rng.nextInt(1600000000).toLong, 0,
          java.time.ZoneOffset.UTC),
        Seq("S", "A", "D")(rng.nextInt(3)),
        rng.nextInt(3) + 1)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("K appends read back as the union (all types)") {
    val rng = new scala.util.Random(42)
    val tables = (1 to 3).map(_ => genTable(rng))
    val d = tempDir("rt-append")
    var t = DeltaTable.forPath(d)
    tables.foreach(df => t = t.write(df))
    assert(t.version == 2L)
    assertSameRows(t.toDF(spark), tables.reduce(_.union(_)))
    // every intermediate version time-travels to its prefix
    (0 until 3).foreach { v =>
      assertSameRows(t.loadAsVersion(v.toLong).toDF(spark),
        tables.take(v + 1).reduce(_.union(_)))
    }
  }

  test("nested types (array/map/struct) round-trip; stats degrade gracefully") {
    import org.apache.spark.sql.SparkSession
    val s: SparkSession = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(1L, 2L, 3L), Map("a" -> 1L), ("x", 10L)),
      (2L, Seq.empty[Long], Map.empty[String, Long], ("y", 20L)),
      (3L, Seq(7L), Map("b" -> 2L, "c" -> 3L), ("z", 30L)))
      .toDF("id", "arr", "m", "st")
    val d = tempDir("rt-nested")
    var t = DeltaTable.forPath(d).write(df)
    t = t.write(df)
    // set-op comparison can't handle MAP columns (Spark limitation);
    // normalize the map to key-sorted entry arrays
    def norm(x: DataFrame) = x.withColumn("m", array_sort(map_entries(col("m"))))
    assertSameRows(norm(t.toDF(spark)), norm(df.union(df)))
    // leaf-column stats still exist and skipping still prunes on the
    // scalar column without tripping over the nested ones
    assert(t.prunedAdds(col("id") > 100L).isEmpty)
    assertSameRows(norm(t.toDFWhere(spark, col("id") === 1L)),
      norm(df.union(df).filter(col("id") === 1L)))
    // delete over a nested predicate rewrites copy-on-write
    t = t.delete(spark, Some(size(col("arr")) > 1))
    assertSameRows(norm(t.toDF(spark)),
      norm(df.union(df).filter(size(col("arr")) <= 1)))
  }

  test("delete predicate over generated data equals filter complement") {
    val rng = new scala.util.Random(7)
    val df = (1 to 2).map(_ => genTable(rng)).reduce(_.union(_))
    val d = tempDir("rt-del")
    val pred = col("cats") === "A" || col("f64") > 0.9
    val t = DeltaTable.forPath(d).write(df).delete(spark, Some(pred))
    assertSameRows(t.toDF(spark), df.filter(!pred))
    val m = t.history.head._2.operationMetrics
    assert(m("num_deleted_rows").asLong() == df.filter(pred).count())
  }

  test("partitioned write round-trips typed partition values (string + int)") {
    val rng = new scala.util.Random(11)
    val df = genTable(rng)
    val d = tempDir("rt-part")
    val t = DeltaTable.forPath(d).write(df, partitionBy = Some(Seq("cats", "bats")))
    assertSameRows(t.toDF(spark), df)
    assert(t.toDF(spark).schema("bats").dataType == IntegerType)
    // partition + stats pruning agree with the actual content
    val a = t.toDFWhere(spark, col("cats") === "A" && col("bats") === 1)
    assertSameRows(a, df.filter(col("cats") === "A" && col("bats") === 1))
  }

  test("restore and clone preserve generated content across versions") {
    val rng = new scala.util.Random(23)
    val t1 = genTable(rng); val t2 = genTable(rng)
    val d = tempDir("rt-restore")
    var t = DeltaTable.forPath(d).write(t1).write(t2)
    t = t.restore(0L)
    assert(t.version == 2L)
    assertSameRows(t.toDF(spark), t1)
    val clone = t.cloneTo(tempDir("rt-clone"))
    (0 to 2).foreach { v =>
      assertSameRows(clone.loadAsVersion(v.toLong).toDF(spark),
        t.loadAsVersion(v.toLong).toDF(spark))
    }
  }

  test("null partition values round-trip via __HIVE_DEFAULT_PARTITION__") {
    val rng = new scala.util.Random(47)
    val df = genTable(rng)
      .withColumn("cats", when(col("bats") === 1, lit(null)).otherwise(col("cats")))
    val d = tempDir("rt-nullpart")
    val t = DeltaTable.forPath(d).write(df, partitionBy = Some(Seq("cats")))
    // the log records None for the default partition
    assert(t.dlog.addActions.values.exists(_.partitionValues.get("cats").contains(None)))
    assertSameRows(t.toDF(spark), df)
    assertSameRows(t.toDF(spark).filter(col("cats").isNull),
      df.filter(col("cats").isNull))
  }

  test("concurrent appenders with retry all land distinct versions") {
    val rng = new scala.util.Random(53)
    val df = genTable(rng)
    val d = tempDir("rt-concurrent")
    DeltaTable.forPath(d).write(df)
    val threads = 4
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val futures = (1 to threads).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val t = DeltaTable.forPath(d).write(df, maxRetries = 10)
            results.add(t.version)
          }
        })
      }
      futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    import scala.jdk.CollectionConverters._
    assert(results.asScala.toSet.size == threads, s"versions: $results")
    val t = DeltaTable.forPath(d)
    assert(t.version == threads.toLong)
    assert(t.toDF(spark).count() == 11L * (threads + 1))
  }

  test("append retry aborts when a concurrent create changed partitioning") {
    val rng = new scala.util.Random(67)
    val df = genTable(rng)
    val d = tempDir("rt-partconflict")
    // handle A resolves against an EMPTY table (partitionBy=None -> Seq())
    val a = DeltaTable.forPath(d)
    // writer B wins version 0 with a partitioned create
    DeltaTable.forPath(d).write(df, partitionBy = Some(Seq("cats")))
    // A's staged unpartitioned files must NOT be re-committed on retry:
    // they'd sit outside the hive layout B established
    val e = intercept[IllegalStateException] {
      a.write(df, maxRetries = 5)
    }
    assert(e.getMessage.contains("partition columns"))
    // the table B created is intact
    val t = DeltaTable.forPath(d)
    assert(t.version == 0L && t.partitionColumns == Seq("cats"))
    assert(t.toDF(spark).count() == 11L)
  }

  test("schema evolution: appended columns null-backfill on generated data") {
    val rng = new scala.util.Random(31)
    val df = genTable(rng)
    val d = tempDir("rt-evolve")
    var t = DeltaTable.forPath(d).write(df.drop("bin", "ts_ntz"))
    t = t.write(df, schemaMode = "merge")
    val out = t.toDF(spark)
    assert(out.columns.toSet == schema.fieldNames.toSet)
    assert(out.filter(col("bin").isNull).count() == 11)
    assert(out.count() == 22)
  }
}
