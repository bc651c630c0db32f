package graft

import org.apache.spark.sql.functions._

/** Hilbert-curve clustering: the HilbertIndex expression's space-filling
  * properties (exhaustively, on full small grids) and the OPTIMIZE
  * curve="hilbert" rewrite.
  */
class HilbertSpec extends SparkSuite {
  import org.apache.spark.sql.graftshim.ColumnShim
  import spark.implicits._

  private def hilbert(bits: Int, cols: org.apache.spark.sql.Column*) =
    ColumnShim.column(
      graft.functions.HilbertIndex(cols.map(ColumnShim.expression), bits))

  test("2D Hilbert: bijective and every consecutive pair spatially adjacent") {
    val bits = 5 // full 32x32 grid, exhaustive
    val n = 1 << bits
    val cells = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    val got = cells.toDF("x", "y")
      .select(col("x"), col("y"), hilbert(bits, col("x"), col("y")).as("h"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    // bijective onto [0, n^2)
    assert(got.map(_._3).toSeq == (0L until (n.toLong * n)).toSeq)
    // THE Hilbert property: consecutive curve positions are Manhattan-1
    // neighbors (Morton fails this at every power-of-two boundary)
    got.sliding(2).foreach { case Array((x1, y1, h1), (x2, y2, h2)) =>
      val dist = math.abs(x2 - x1) + math.abs(y2 - y1)
      assert(dist == 1, s"jump of $dist between h=$h1 ($x1,$y1) and h=$h2 ($x2,$y2)")
    }
  }

  test("3D Hilbert: bijective and adjacent on the full 8x8x8 grid") {
    val bits = 3
    val n = 1 << bits
    val cells = for (x <- 0 until n; y <- 0 until n; z <- 0 until n)
      yield (x.toLong, y.toLong, z.toLong)
    val got = cells.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        hilbert(bits, col("x"), col("y"), col("z")).as("h"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    assert(got.map(_._4).toSeq == (0L until (1L << (3 * bits))).toSeq)
    got.sliding(2).foreach { case Array((x1, y1, z1, _), (x2, y2, z2, _)) =>
      assert(math.abs(x2 - x1) + math.abs(y2 - y1) + math.abs(z2 - z1) == 1)
    }
  }

  test("interpreted eval matches codegen") {
    val bits = 7
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (100L, 27L),
      (127L, 127L), (64L, 63L))
    val fromDf = rows.toDF("a", "b")
      .select(hilbert(bits, col("a"), col("b")).as("h"))
      .as[Long].collect()
    rows.zip(fromDf).foreach { case ((a, b), h) =>
      assert(graft.functions.HilbertIndex.index(Array(a, b), bits) == h)
    }
    // null rank = coordinate 0
    val withNull = Seq((Some(3L), Option.empty[Long])).toDF("a", "b")
      .select(hilbert(bits, col("a"), col("b")).as("h")).as[Long].head()
    assert(withNull == graft.functions.HilbertIndex.index(Array(3L, 0L), bits))
  }

  test("Hilbert beats Morton on total per-file bounding-box span (2D uniform grid)") {
    // 64x64 uniform grid cut into 13 equal runs along each curve (13 so
    // runs STRADDLE dyadic block boundaries — at power-of-two-aligned run
    // sizes both curves degenerate to the same dyadic blocks): the sum of
    // per-run (xspan + yspan) measures how tight each file's min/max box
    // would be. Hilbert's runs are connected subpaths; Morton's take
    // diagonal jumps. Require hilbert strictly better — this is the
    // data-skipping payoff, stated deterministically on a full grid.
    val bits = 6
    val n = 1 << bits
    val cells = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
    def spanSum(order: Seq[(Long, Long)]): Long =
      order.grouped(order.size / 13 + 1).map { run =>
        (run.map(_._1).max - run.map(_._1).min) +
          (run.map(_._2).max - run.map(_._2).min)
      }.sum
    val byHilbert = cells.sortBy { case (x, y) =>
      graft.functions.HilbertIndex.index(Array(x, y), bits) }
    def mortonRef(a: Long, b: Long): Long = {
      var out = 0L
      for (bit <- 0 until 32) {
        out |= ((a >>> bit) & 1L) << (bit * 2)
        out |= ((b >>> bit) & 1L) << (bit * 2 + 1)
      }
      out
    }
    val byMorton = cells.sortBy { case (x, y) => mortonRef(x, y) }
    assert(spanSum(byHilbert) < spanSum(byMorton),
      s"hilbert=${spanSum(byHilbert)} morton=${spanSum(byMorton)}")
  }

  test("OPTIMIZE curve=hilbert: rows invariant, stats prune, history records") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").repartition(8)
    val d = tempDir("hilbert-optimize")
    var t = DeltaTable.forPath(d).write(li)
    t = t.compact(spark, sortBy = Seq("l_orderkey", "l_quantity"),
      targetFiles = 8, zOrder = true, curve = "hilbert")
    assertSameRows(t.toDF(spark), li)
    // min/max pruning selective on BOTH clustered dims
    val total = t.fileUris.size
    assert(t.prunedAdds(col("l_orderkey") < 50).size < total)
    assert(t.prunedAdds(col("l_quantity") < 3).size < total)
    intercept[IllegalArgumentException](
      t.compact(spark, sortBy = Seq("l_orderkey", "l_quantity"),
        zOrder = true, curve = "peano"))
  }

  test("clusterBy table honors graft.clustering.curve=hilbert on default OPTIMIZE") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").repartition(4)
    val d = tempDir("hilbert-liquid")
    var t = DeltaTable.forPath(d).write(li)
      .setTableProperties(Map("graft.clustering.curve" -> "hilbert"))
      .clusterBy(Seq("l_orderkey", "l_quantity"))
    t = t.compact(spark, targetFiles = 8)
    assertSameRows(t.toDF(spark), li)
    assert(t.prunedAdds(col("l_quantity") < 3).size < t.fileUris.size)
  }
}
