package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.CommitWriter
import graft.delta.sources.GraftDeltaFileIndex

/** Dynamic partition pruning on the native DSv2 path: Spark's own
  * ParquetScan implements no runtime filtering, so the graftdelta scan
  * wraps it ([[graft.delta.sources.RuntimeFilteredParquetScan]]) — a
  * star-schema join against a selectively-filtered dim must plant a
  * DynamicPruning subquery and re-list only the surviving partitions'
  * files at execution. */
class RuntimeFilteringSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_dpp_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  test("broadcast join against a filtered dim prunes fact partitions") {
    import spark.implicits._
    val p = tmp("fact")
    // fact: 20 partitions, one file each
    CommitWriter.createTable(spark,
      spark.range(20000).select(col("id"),
        (col("id") % 20).cast("int").as("part")).repartition(col("part")),
      p, partitionColumns = Seq("part"))
    val factFiles = DeltaTable.forPath(spark, p).allFiles.count()
    assert(factFiles >= 20L)

    // dim must be parquet-backed: a Filter over a LocalRelation
    // constant-folds away before PartitionPruning looks for the
    // selective predicate
    val dimPath = tmp("dim")
    Seq((3, "keep"), (7, "drop")).toDF("part_key", "tag")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).where(col("tag") === "keep")

    val fact = spark.read.format("graftdelta").option("path", p).load()
    val joined = fact.join(broadcast(dim), fact("part") === dim("part_key"))

    GraftDeltaFileIndex.clearListLog()
    assert(joined.count() == 1000L)
    // the DPP subquery landed in the plan...
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"no DynamicPruning in executed plan:\n${plan.take(2000)}")
    // ...and the runtime re-list (extra partition filter) pruned the
    // file set to one partition's worth. Planning-time lists return
    // all files; the DPP re-list is the call with files << total.
    val calls = GraftDeltaFileIndex.recentLists
    assert(calls.exists(c => c._3 >= 1L && c._3 < factFiles / 2),
      s"no pruned runtime re-list among $calls; filter() got: " +
        graft.delta.sources.RuntimeFilteredParquetScan.lastFilterCall.get())
    // correctness against the composed path
    assert(joined.select(sum("id")).head.getLong(0) ==
      spark.range(20000).where(col("id") % 20 === 3)
        .select(sum("id")).head.getLong(0))
  }

  test("unpartitioned tables keep the bare ParquetScan (no wrapper)") {
    val p = tmp("flat")
    CommitWriter.createTable(spark,
      spark.range(100).select(col("id")), p)
    val df = spark.read.format("graftdelta").option("path", p).load()
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => r.scan.getClass.getSimpleName
    }
    assert(scans == Seq("ParquetScan"), s"got $scans")
    assert(df.count() == 100L)
  }
}
