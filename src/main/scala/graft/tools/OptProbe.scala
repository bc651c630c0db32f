package graft.tools
import graft.QueryLib
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Ad-hoc optimization-round timing experiments (r14). Each section times
  * sub-pipelines of a hot bench query so a change targets the measured
  * stage, not a guess. Not part of any driver contract.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sections = args.lift(1).map(_.split(",").toSet).getOrElse(Set("q20"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      // warm once, then best-of-2 timed
      f
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"OPT $label%-40s ${runs.map(_._1).min}%7.3fs rows=${runs.head._2}")
    }

    if (sections("stages")) {
      import org.apache.spark.scheduler._
      val sc = spark.sparkContext
      sc.addSparkListener(new SparkListener {
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val m = i.taskMetrics
          println(f"STAGE ${i.stageId}%4d tasks=${i.numTasks}%4d " +
            f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.2fMB " +
            f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.2fMB " +
            f"recW=${m.shuffleWriteMetrics.recordsWritten}%9d ${i.name.take(60)}")
        }
      })
      val docs = QueryLib.delta(spark, sfDir, "documents")
      docs.count()
      val q = args.lift(2).getOrElse("q20_ngram_jaccard")
      graft.SparkEntry.queries(q)(spark, sfDir).count() // warm
      println(s"=== timed run of $q ===")
      graft.SparkEntry.queries(q)(spark, sfDir).count()
      org.apache.spark.graftshim.ListenerShim.waitUntilEmpty(sc, 30000)
    }

    if (sections("q20")) {
      val docs = QueryLib.delta(spark, sfDir, "documents")
      docs.count()
      // full operator
      time("q20 full")(Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
      // shingling alone (no cache)
      time("shingle+explode+hash")(
        docs.select(col("doc_id"),
            explode(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3)).as("_s0"))
          .select(xxhash64(col("_s0")).as("_s")).count())
      // df aggregate alone
      time("df groupBy")(
        docs.select(col("doc_id"),
            explode(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3)).as("_s0"))
          .select(xxhash64(col("_s0")).as("_s"))
          .groupBy("_s").agg(count(lit(1)).as("_df"))
          .filter(col("_df") >= 2 && col("_df") <= 1024).count())
    }

    if (sections("cc")) {
      val docs = QueryLib.delta(spark, sfDir, "documents")
      docs.count()
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      time("pairs count")(pairs.count())
      time("cc full")(Dedup.connectedComponents(pairs).count())
    }

    if (sections("q151")) {
      // VERDICT r14 item 8: can the 64 md5-per-component MinHash
      // signature derive from TWO md5s (Kirsch–Mitzenmacher double
      // hashing, h_i = h1 + i*h2)? The construction is published and
      // collision-sound, but the component VALUES differ from the
      // declared store contract (the oracle replays md5(i || ':' || s)
      // per component bit-for-bit), so landing it would change q151's
      // result — this section only MEASURES the forgone win.
      import org.apache.spark.sql.graftshim.ColumnShim
      def md5p60(c: org.apache.spark.sql.Column) = ColumnShim.column(
        graft.functions.Md5Prefix60(ColumnShim.expression(c.cast("binary"))))
      val docs = QueryLib.delta(spark, sfDir, "documents")
        .filter(col("doc_id") % 2 === 1)
      docs.count()
      val noop = (df: org.apache.spark.sql.DataFrame) => {
        df.write.format("noop").mode("overwrite").save(); 0L
      }
      time("q151 full operator")(
        Dedup.minHashStoreDedup(spark, QueryLib.minhashStoreDir(spark, sfDir),
          docs, "doc_id", "text", bands = 16, estThreshold = 0.7).count())
      time("sigOf 64-md5 (contract)")(
        noop(Dedup.sigOf(docs, "doc_id", "text", 3, 64)))
      // double-hash variant, same explode + 64-min-aggregate shape
      val tok = Dedup.shingled(
        graft.operators.Par.spread(docs.select(col("doc_id"), col("text"))
          .filter(size(split(lower(col("text")), " ")) >= 3), "doc_id"),
        "doc_id", "text", 3)
        .select(col("_id").as("id"), explode_outer(col("_sh")).as("_s"))
        .withColumn("_h1", md5p60(concat(lit("0:"), col("_s"))))
        .withColumn("_h2", md5p60(concat(lit("1:"), col("_s"))))
      // mixer choice is immaterial for TIMING (any O(1) combine of two
      // md5-derived 60-bit values); xor+shift avoids ANSI long overflow
      // that the literal h1 + i*h2 affine form hits at i*h2 > 2^63
      val mask = (1L << 60) - 1
      val comps2 = (0 until 64).map(i =>
        min(col("_h1").bitwiseXOR(shiftleft(col("_h2"), i % 60))
          .bitwiseAND(lit(mask))).as(s"_c$i"))
      time("sigOf 2-md5 double-hash")(
        noop(tok.groupBy("id").agg(comps2.head, comps2.tail: _*)
          .select(col("id"),
            array((0 until 64).map(i => col(s"_c$i")): _*).as("sig"))))
    }

    if (sections("open")) {
      val dir = QueryLib.deltaDir(spark, sfDir, "documents")
      time("forPath open+plan")(
        { graft.DeltaTable.forPath(dir).toDF(spark); 0L })
      time("forPath open+count")(
        graft.DeltaTable.forPath(dir).toDF(spark).count())
    }
    spark.stop()
  }
}
