package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: physical plan + stage count of the derived change feed's
  * INTERNAL derivation (the outer plan is just a composed V1 scan) —
  * verifies the shared diff aggregation reuses one exchange for both
  * directions, and times construction vs execution. */
object CdfPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = graft.queries.DeltaQueries.cdcTable(spark, sfDir)
    val snap = graft.delta.DeltaTable.forPath(spark, path)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = graft.delta.scan.CommitRangeScan.changesBetween(
        spark, path, snap, 1, snap.version)
      val t1 = System.nanoTime()
      val n = df.count()
      val t2 = System.nanoTime()
      println(f"[cdfprobe] run $i construct ${(t1 - t0) / 1e9}%.3f s " +
        f"execute ${(t2 - t1) / 1e9}%.3f s rows=$n")
      if (i == 1) {
        val plan = df.queryExecution.executedPlan.toString
        def c(re: String) = re.r.findAllIn(plan).length
        println(s"[cdfprobe] exchanges=${c("Exchange")} " +
          s"reused=${c("ReusedExchange")} hashAggs=${c("HashAggregate")} " +
          s"scans=${c("Scan parquet|FileScan")}")
      }
    }
    spark.stop()
  }
}
