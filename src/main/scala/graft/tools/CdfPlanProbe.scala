package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: physical plan + stage count of the derived change feed
  * over the cdc fixture — verifies the shared diff aggregation reuses
  * one exchange for both directions (insert and delete filters). */
object CdfPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q_change_feed")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val shuffles = "Exchange".r.findAllIn(plan).length
    val reused = "ReusedExchange".r.findAllIn(plan).length
    val aggs = "HashAggregate".r.findAllIn(plan).length
    println(s"[cdfprobe] exchanges=$shuffles reused=$reused hashAggs=$aggs")
    df.explain("formatted")
    spark.stop()
  }
}
