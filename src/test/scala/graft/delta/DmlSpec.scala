package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.commands.DmlCommands
import graft.delta.log.CommitWriter

class DmlSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_dml_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")

  test("DELETE WHERE removes matching rows, touches only affected files") {
    val p = tmp("delete")
    val n = orders.count()
    // two files split by key median
    val med = orders.stat.approxQuantile("o_orderkey", Array(0.5), 0.0)(0)
    CommitWriter.createTable(spark,
      orders.filter(col("o_orderkey") <= med).repartition(1), p)
    CommitWriter.append(spark,
      orders.filter(col("o_orderkey") > med).repartition(1), p)

    val metrics = DmlCommands.delete(spark, p, col("o_orderkey") < 5)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(metrics("files_rewritten").toInt == 1) // only the low file

    val after = DeltaTable.forPath(spark, p)
    assert(after.read.count() == n - 5)
    assert(after.read.where(col("o_orderkey") < 5).count() == 0)
    // pre-delete version intact
    assert(DeltaTable.forPath(spark, p, Some(1)).read.count() == n)
  }

  test("DELETE with no matches is a no-op (no new commit)") {
    val p = tmp("delete_noop")
    CommitWriter.createTable(spark, orders.limit(50), p)
    val v = DeltaTable.forPath(spark, p).version
    val metrics = DmlCommands.delete(spark, p, col("o_orderkey") < -1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(metrics("files_rewritten") == "0")
    assert(DeltaTable.forPath(spark, p).version == v)
  }

  test("UPDATE SET applies only to matching rows") {
    val p = tmp("update")
    CommitWriter.createTable(spark, orders.repartition(2), p)
    DmlCommands.update(spark, p,
      condition = col("o_orderstatus") === "P",
      set = Map(
        "o_totalprice" -> (col("o_totalprice") + 1),
        "o_orderpriority" -> lit("BUMPED")))
    val after = DeltaTable.forPath(spark, p).read
    val want = orders
      .withColumn("o_totalprice",
        when(col("o_orderstatus") === "P", col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderpriority",
        when(col("o_orderstatus") === "P", lit("BUMPED"))
          .otherwise(col("o_orderpriority")))
    assert(after.orderBy("o_orderkey").collect().toSeq ==
      want.orderBy("o_orderkey").collect().toSeq)
  }

  test("DELETE on a partitioned table keeps partition layout") {
    val p = tmp("delete_part")
    CommitWriter.createTable(spark, orders, p,
      partitionColumns = Seq("o_orderstatus"))
    DmlCommands.delete(spark, p, col("o_custkey") % 7 === 0)
    val after = DeltaTable.forPath(spark, p)
    assert(after.read.count() ==
      orders.filter(!(col("o_custkey") % 7 === 0)).count())
    assert(after.readWhere(col("o_orderstatus") === "F").count() ==
      orders.filter(col("o_orderstatus") === "F" &&
        !(col("o_custkey") % 7 === 0)).count())
  }
}
