package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.commands.DmlCommands
import graft.delta.log.CommitWriter
import graft.delta.scan.DvTaskFilter

/** Large-DV scans (total deleted rows past the anti-join threshold)
  * must decode deletion vectors in the TASKS that read each file, from
  * shipped descriptors — never as an accumulated bitmap map in driver
  * heap. local[32] shares one JVM, so the executor-side cache counters
  * are directly observable. */
class DvExecutorDecodeSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_dvexec_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  test("heavy multi-file DV scan decodes in tasks and stays exact") {
    val p = tmp("heavy")
    // 8 files x 40k rows; delete ~60% => ~192k deleted rows, far past
    // the 100k anti-join cap -> the large-DV path must engage
    val n = 320000L
    val df = spark.range(n).select(
      col("id"), (col("id") % 997).as("bucket"))
    CommitWriter.createTable(spark, df.repartition(8), p,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    DmlCommands.delete(spark, p, col("bucket") < 600)
    val snap = DeltaTable.forPath(spark, p)
    val totalDeleted = snap.allFiles
      .agg(sum("deletionVector.cardinality")).head.getLong(0)
    assert(totalDeleted > 100000L,
      s"fixture must exceed the anti-join cap, got $totalDeleted")

    val before = DvTaskFilter.decodeCount.get()
    val expect = df.filter(col("bucket") >= 600)
    val t = snap.read
    assert(t.count() == expect.count())
    assert(t.agg(sum("id")).head.getLong(0) ==
      expect.agg(sum("id")).head.getLong(0))
    // the mask decoded DVs lazily in tasks (one per file per JVM via
    // the cache), not zero times (which would mean a driver-built map
    // was broadcast instead)
    val decoded = DvTaskFilter.decodeCount.get() - before
    assert(decoded >= 8, s"expected >=8 executor-side decodes, got $decoded")
    // a second read hits the per-JVM cache — no further decoding
    assert(snap.read.count() == expect.count())
    assert(DvTaskFilter.decodeCount.get() - before == decoded,
      "second scan re-decoded instead of hitting the executor cache")
  }

  test("large-DV mask is the native dv_keep expression — no Scala UDF " +
    "fencing whole-stage codegen on the path with the most rows") {
    val p = tmp("native")
    val n = 240000L
    val df = spark.range(n).select(
      col("id"), (col("id") % 509).as("bucket"))
    CommitWriter.createTable(spark, df.repartition(6), p,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    DmlCommands.delete(spark, p, col("bucket") < 300)
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.allFiles.agg(sum("deletionVector.cardinality"))
      .head.getLong(0) > 100000L, "fixture must force the large-DV path")
    val t = snap.read.where(col("bucket") >= 400)
    t.collect()
    val plan = t.queryExecution.executedPlan.toString
    // the mask evaluates as a generated method call inside the fused
    // stage — the Scala UDF it replaced appeared as a ScalaUDF node and
    // fenced codegen exactly where the most rows flow
    assert(!plan.contains("ScalaUDF") && !plan.toLowerCase.contains("udf("),
      "large-DV mask fell back to a Scala UDF:\n" + plan.take(3000))
    assert(plan.contains("dv_keep"),
      "native dv_keep expression missing from the plan:\n" + plan.take(3000))
    // `*(n)` prefixes mark whole-stage-codegen membership in the
    // executed plan: the Filter carrying dv_keep must sit INSIDE a
    // fused stage (the UDF shape ran it interpreted)
    val maskLine = plan.linesIterator
      .find(l => l.contains("Filter") && l.contains("dv_keep"))
      .getOrElse(fail("no Filter node carries dv_keep:\n" + plan.take(3000)))
    assert(maskLine.contains("*("),
      "dv_keep Filter is outside whole-stage codegen: " + maskLine.take(500))
    // and the mask is exact
    val expect = df.filter(col("bucket") >= 400)
    assert(t.count() == expect.count())
  }

  test("executor cache evicts under a tight byte budget, results exact") {
    val p = tmp("evict")
    val n = 240000L
    val df = spark.range(n).select(
      col("id"), (col("id") % 331).as("bucket"))
    CommitWriter.createTable(spark, df.repartition(6), p,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    DmlCommands.delete(spark, p, col("bucket") < 200)
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.allFiles.agg(sum("deletionVector.cardinality"))
      .head.getLong(0) > 100000L)
    DvTaskFilter.setBudgetForTest(1024L) // forces eviction churn
    try {
      val expect = df.filter(col("bucket") >= 200)
      assert(snap.read.count() == expect.count())
      assert(snap.read.agg(sum("id")).head.getLong(0) ==
        expect.agg(sum("id")).head.getLong(0))
    } finally DvTaskFilter.setBudgetForTest(256L * 1024 * 1024)
  }
}
