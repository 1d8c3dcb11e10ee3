package graft.delta

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.commands.ConvertCommand

class ConvertSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_conv_$name").toString

  test("convert an unpartitioned parquet dir in place") {
    val p = tmp("plain")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    orders.repartition(3).write.mode("overwrite").parquet(p)
    val n = ConvertCommand.convert(spark, p)
    assert(n == 3)
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.version == 0)
    assert(snap.read.count() == orders.count())
    // stats landed: a range probe prunes (files written by repartition
    // overlap, so just assert the read is correct and stats exist)
    assert(snap.allFiles.where(col("stats").isNotNull).count() == 3)
    assert(snap.readWhere(col("o_orderkey") === 1L).count() ==
      orders.where(col("o_orderkey") === 1L).count())
  }

  test("convert a hive-partitioned parquet dir") {
    val p = tmp("part")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(p)
    val n = ConvertCommand.convert(spark, p,
      partitionColumns = Seq("o_orderstatus"),
      partitionSchema = Some(orders.select("o_orderstatus").schema))
    assert(n >= 3)
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.partitionColumns == Seq("o_orderstatus"))
    assert(snap.read.count() == orders.count())
    // partition pruning works on the converted table
    val f = snap.readWhere(col("o_orderstatus") === "F")
    assert(f.count() == orders.where(col("o_orderstatus") === "F").count())
    // the converted table is a first-class delta table: append works
    graft.delta.log.CommitWriter.append(spark, orders.limit(5), p)
    assert(DeltaTable.forPath(spark, p).read.count() == orders.count() + 5)
  }

  test("CONVERT TO DELTA runs through the SQL surface") {
    val p = tmp("sql")
    val region = spark.read.parquet(s"$sf/region.parquet")
    region.write.mode("overwrite").partitionBy("r_regionkey").parquet(p)
    val out = graft.GraftSession(spark)
      .sql(s"CONVERT TO DELTA '$p' PARTITIONED BY (r_regionkey)")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("files_converted").toInt == 5)
    assert(DeltaTable.forPath(spark, p).read.count() == region.count())
  }

  test("converting an existing Delta table is refused") {
    val p = tmp("refuse")
    val region = spark.read.parquet(s"$sf/region.parquet")
    graft.delta.log.CommitWriter.createTable(spark, region, p)
    intercept[IllegalArgumentException] {
      ConvertCommand.convert(spark, p)
    }
  }
}
