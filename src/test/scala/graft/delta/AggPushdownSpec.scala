package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.CommitWriter

/** DSv2 aggregate pushdown: whole-table COUNT(*) / MIN / MAX over
  * `format("graftdelta")` answer from log stats as a LocalTableScan —
  * zero data files opened — while anything stats cannot answer exactly
  * falls through to the normal scan untouched. */
class AggPushdownSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_agg_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")

  private def read(p: String): DataFrame =
    spark.read.format("graftdelta").load(p)

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("count(*)/min/max compile to a LocalTableScan over log stats") {
    val p = tmp("basic")
    CommitWriter.createTable(spark, orders.repartition(3), p)
    CommitWriter.append(spark, orders.limit(10), p)

    val df = read(p).agg(count(lit(1)).as("n"),
      min(col("o_custkey")).as("mn"), max(col("o_custkey")).as("mx"))
    val plan = planOf(df)
    assert(plan.contains("LocalTableScan"),
      s"aggregate not answered from stats:\n$plan")
    assert(!plan.contains("BatchScan") && !plan.contains("FileScan"),
      s"data files opened for a stats-answerable aggregate:\n$plan")
    val r = df.head()
    assert(r.getLong(0) == orders.count() + 10)
    val (mn, mx) = (orders.agg(min("o_custkey")).head.get(0),
      orders.agg(max("o_custkey")).head.get(0))
    assert(r.get(1) == mn && r.get(2) == mx)
  }

  test("filters, group-bys, and non-stat aggregates run the real scan") {
    val p = tmp("fallthrough")
    CommitWriter.createTable(spark, orders.repartition(2), p)
    // filtered count: must scan (and be right)
    val filtered = read(p).where(col("o_custkey") > 100)
      .agg(count(lit(1)))
    assert(planOf(filtered).contains("Scan"), "expected a real scan")
    assert(filtered.head.getLong(0) ==
      orders.where(col("o_custkey") > 100).count())
    // grouped: real scan
    val grouped = read(p).groupBy("o_orderstatus").agg(count(lit(1)))
    assert(grouped.count() ==
      orders.select("o_orderstatus").distinct().count())
    // SUM is not stats-answerable: real scan, exact result
    val summed = read(p).agg(sum(col("o_custkey")))
    assert(planOf(summed).contains("Scan"))
    assert(summed.head.get(0) == orders.agg(sum("o_custkey")).head.get(0))
    // min over a STRING column is not offered (truncated stats are
    // bounds, not values): real scan
    val strMin = read(p).agg(min(col("o_orderstatus")))
    assert(planOf(strMin).contains("Scan"))
    assert(strMin.head.getString(0) ==
      orders.agg(min("o_orderstatus")).head.getString(0))
  }

  test("DV tables and CoW deletes stay exact") {
    val p = tmp("dml")
    CommitWriter.createTable(spark, orders.repartition(2), p)
    graft.commands.DmlCommands.delete(spark, p, col("o_orderkey") % 10 === 3)
    val expected = orders.where(col("o_orderkey") % 10 =!= 3).count()
    // CoW rewrite: stats stay complete, pushdown still answers
    val df = read(p).agg(count(lit(1)))
    assert(df.head.getLong(0) == expected)

    val pDv = tmp("dv")
    CommitWriter.createTable(spark, orders.repartition(2), pDv,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    graft.commands.DmlCommands.delete(spark, pDv,
      col("o_orderkey") % 10 === 3)
    // DV table routes through the composed scan (no agg pushdown);
    // counts subtract masked rows correctly either way
    assert(read(pDv).agg(count(lit(1))).head.getLong(0) == expected)
    // min/max on the DV table must NOT be claimed from stats (a masked
    // row could have held the extreme) — result must match the data
    assert(read(pDv).agg(min(col("o_orderkey"))).head.get(0) ==
      orders.where(col("o_orderkey") % 10 =!= 3)
        .agg(min("o_orderkey")).head.get(0))
  }

  test("empty table: count answers 0, min/max fall through to null") {
    val p = tmp("empty")
    CommitWriter.createTable(spark, orders.limit(0), p)
    assert(read(p).agg(count(lit(1))).head.getLong(0) == 0L)
    assert(read(p).agg(min(col("o_custkey"))).head.isNullAt(0))
  }
}
