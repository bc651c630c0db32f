package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    // filter+project over delta scan: expect PushedFilters + pruned ReadSchema
    val li = graft.QueryLib.delta(spark, d, "lineitem")
    println("=== q08 filter+project plan ===")
    li.filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp") && col("l_discount") > 0.05)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
      .explain("formatted")
    println("=== q06 partitioned scan + partition filter ===")
    val lp = graft.QueryLib.delta(spark, d, "lineitem", partitionBy = Seq("l_returnflag"))
    lp.filter(col("l_returnflag") === "A").groupBy().count().explain("formatted")
    println("=== q10 join strategy ===")
    graft.QueryLib.delta(spark, d, "orders")
      .join(graft.QueryLib.delta(spark, d, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1))).explain("formatted")
    spark.stop()
  }
}
