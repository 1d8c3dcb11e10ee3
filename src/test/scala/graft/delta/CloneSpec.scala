package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.commands.{CloneCommand, DmlCommands}
import graft.delta.log.CommitWriter

class CloneSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_clone_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")

  test("shallow clone reads identically without copying data") {
    val src = tmp("src")
    val dst = tmp("dst")
    CommitWriter.createTable(spark, orders.repartition(2), src,
      partitionColumns = Seq.empty)
    val m = CloneCommand.shallowClone(spark, src, dst)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("files_referenced").toInt >= 2)
    val got = DeltaTable.forPath(spark, dst)
    assert(got.version == 0)
    assert(got.read.count() == orders.count())
    // no parquet under the clone dir (log only)
    val files = new java.io.File(dst).listFiles().map(_.getName).toSet
    assert(files == Set("_delta_log"))
  }

  test("DML on the clone never touches the source") {
    val src = tmp("src2")
    val dst = tmp("dst2")
    CommitWriter.createTable(spark, orders.limit(200).repartition(2), src)
    CloneCommand.shallowClone(spark, src, dst)
    DmlCommands.delete(spark, dst, col("o_orderkey") % 2 === 0)
    val srcCount = DeltaTable.forPath(spark, src).read.count()
    val dstCount = DeltaTable.forPath(spark, dst).read.count()
    assert(srcCount == 200)
    assert(dstCount < 200)
    // clone's rewrite landed in the clone dir; source files intact
    assert(DeltaTable.forPath(spark, src).read.count() == 200)
  }

  test("clone of a partitioned table prunes partitions") {
    val src = tmp("src3")
    val dst = tmp("dst3")
    CommitWriter.createTable(spark, orders, src,
      partitionColumns = Seq("o_orderstatus"))
    CloneCommand.shallowClone(spark, src, dst)
    val snap = DeltaTable.forPath(spark, dst)
    assert(snap.readWhere(col("o_orderstatus") === "F").count() ==
      orders.filter(col("o_orderstatus") === "F").count())
    val pruned = graft.delta.scan.DeltaScan.prunedFiles(snap,
      Seq(col("o_orderstatus") === "F")).count()
    assert(pruned < snap.allFiles.count())
  }

  test("VERSION AS OF clones the historical snapshot, not the tip") {
    val src = tmp("ver_src")
    val dst = tmp("ver_dst")
    val base = orders.select("o_orderkey", "o_totalprice")
    CommitWriter.createTable(spark,
      base.where(col("o_orderkey") % 2 === 0).repartition(1), src)   // v0
    CommitWriter.append(spark,
      base.where(col("o_orderkey") % 2 === 1).repartition(1), src)   // v1
    new graft.GraftSession(spark).sql(
      s"CREATE TABLE '$dst' SHALLOW CLONE '$src' VERSION AS OF 0")
    val clone = DeltaTable.forPath(spark, dst)
    assert(clone.read.count() ==
      base.where(col("o_orderkey") % 2 === 0).count())
    // the source tip is unaffected and still serves both commits
    assert(DeltaTable.forPath(spark, src).read.count() == base.count())
    // malformed trailing tokens are rejected, not ignored
    intercept[IllegalArgumentException] {
      new graft.GraftSession(spark).sql(
        s"CREATE TABLE '${tmp("bad")}' SHALLOW CLONE '$src' VERSION OF 0")
    }
  }

  test("CREATE TABLE ... SHALLOW CLONE through SQL") {
    val src = tmp("sql_src")
    val dst = tmp("sql_dst")
    val region = spark.read.parquet(s"$sf/region.parquet")
    graft.delta.log.CommitWriter.createTable(spark, region, src)
    val m = new graft.GraftSession(spark)
      .sql(s"CREATE TABLE '$dst' SHALLOW CLONE '$src'")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("source_version") == "0")
    assert(DeltaTable.forPath(spark, dst).read.count() == region.count())
    // plain CREATE TABLE is NOT ours — it must delegate to Spark,
    // including DDL that merely CONTAINS the word shallow (a column
    // name is not a clone clause)
    assert(graft.sqlext.GraftParser
      .parse("CREATE TABLE t (a INT) USING parquet").isEmpty)
    assert(graft.sqlext.GraftParser
      .parse("CREATE TABLE t (shallow INT, deep INT) USING parquet")
      .isEmpty)
    // malformed SHALLOW CLONE names the expected grammar
    val err = intercept[IllegalArgumentException] {
      graft.sqlext.GraftParser.parse(
        s"CREATE TABLE '$dst' SHALLOW CLONE")
    }
    assert(err.getMessage.contains("SHALLOW CLONE"))
  }
}
