package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.delta.log.CommitWriter

/** Probe: does runtime (dynamic-partition) filtering engage on the
  * native DSv2 graftdelta scan when joined to a filtered dim? Prints
  * the executed plan's scan lines. Not part of the driver contract. */
object DppProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft_dpp")
    val p = new java.io.File(dir.toFile, "tbl").getAbsolutePath
    // fact: 100k rows over 20 partitions
    CommitWriter.createTable(spark,
      spark.range(100000).select(col("id"),
        (col("id") % 20).cast("int").as("part")),
      p, partitionColumns = Seq("part"))
    // dim: 2 interesting partitions — parquet-backed, NOT a local
    // relation (a Filter over LocalRelation constant-folds away before
    // PartitionPruning looks for the selective predicate)
    val dimPath = new java.io.File(dir.toFile, "dim").getAbsolutePath
    Seq((3, "a"), (7, "b")).toDF("part_key", "tag")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)

    val fact = spark.read.format("graftdelta").option("path", p).load()
    // DPP needs a SELECTIVE predicate on the build side
    val joined = fact.join(broadcast(dim.where(col("tag") === "a")),
      fact("part") === dim("part_key"))
    val n = joined.count()
    println(s"[dpp] joined rows = $n (expect 10000)")
    println("[dpp] optimized has DynamicPruning=" +
      joined.queryExecution.optimizedPlan.toString
        .toLowerCase.contains("dynamicpruning"))
    joined.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation =>
        println(s"[dpp] v2 scan class = ${r.scan.getClass.getName}, " +
          s"runtime-filterable = ${r.scan.isInstanceOf[
            org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]}")
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/dpp_optimized.txt"),
      joined.queryExecution.optimizedPlan.toString.getBytes("UTF-8"))
    // full executed plan (post-AQE), written to a file for inspection
    val planStr = joined.queryExecution.executedPlan.toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/dpp_plan.txt"),
      planStr.getBytes("UTF-8"))
    println("[dpp] has-RuntimeFilters=" + planStr.contains("RuntimeFilters"))
    println("[dpp] has-dynamicpruning=" +
      planStr.toLowerCase.contains("dynamicpruning"))
    // authoritative: the scan's numFiles metric after execution
    def leaves(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        leaves(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        leaves(s.plan)
      case other if other.children.isEmpty => Seq(other)
      case other =>
        other.children.flatMap(leaves) ++
          other.subqueries.flatMap(leaves)
    }
    leaves(joined.queryExecution.executedPlan)
      .filter(_.nodeName.toLowerCase.contains("scan"))
      .foreach { s =>
        println(s"[dpp] ${s.nodeName} metrics: " +
          s.metrics.toSeq.sortBy(_._1).map { case (k, m) =>
            s"$k=${m.value}" }.mkString(", "))
      }
    spark.stop()
  }
}
