package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.CommitWriter

class GenerateSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_gen_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val orders = spark.read
    .parquet(s"$sf/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_totalprice")

  private def manifestLines(p: String): Map[String, Seq[String]] = {
    val root = new java.io.File(p, "_symlink_format_manifest")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) Seq(f)
      else Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
    walk(root).filter(_.getName == "manifest").map { mf =>
      val rel = root.toPath.relativize(mf.toPath.getParent).toString
      rel -> scala.io.Source.fromFile(mf, "UTF-8").getLines().toSeq
    }.toMap
  }

  test("per-partition manifests list exactly the live files; " +
    "regeneration drops vanished partitions") {
    val p = tmp("part")
    val base = orders.withColumn("bucket",
      (col("o_orderkey") % 3).cast("int"))
    CommitWriter.createTable(spark, base, p,
      partitionColumns = Seq("bucket"))
    val session = new graft.GraftSession(spark)
    val m = session.sql(
      s"GENERATE symlink_format_manifest FOR TABLE '$p'").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("manifests_written").toInt == 3)
    val byPart = manifestLines(p)
    assert(byPart.keySet == Set("bucket=0", "bucket=1", "bucket=2"))
    // every listed URI exists, is absolute, and matches the log's set
    val live = DeltaTable.forPath(spark, p).allFiles
      .select("path").collect().map(_.getString(0)).toSet
    val listed = byPart.values.flatten.toSeq
    assert(listed.size == live.size)
    assert(listed.forall(_.startsWith("file:")))
    assert(listed.map(u => u.substring(u.indexOf(p) + p.length + 1)).toSet
      == live)

    // drop one partition; the regenerated tree must not keep it
    graft.commands.ReplaceWhereCommand.replaceWhere(spark,
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        base.schema),
      p, col("bucket") === 1)
    session.sql(s"GENERATE symlink_format_manifest FOR TABLE '$p'")
    assert(manifestLines(p).keySet == Set("bucket=0", "bucket=2"))
  }

  test("deletion-vector tables refuse (symlink readers would " +
    "resurrect masked rows)") {
    val p = tmp("dv")
    CommitWriter.createTable(spark, orders.limit(50).repartition(1), p,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    graft.commands.DmlCommands.delete(spark, p, col("o_orderkey") % 5 === 0)
    val e = intercept[IllegalArgumentException] {
      new graft.GraftSession(spark).sql(
        s"GENERATE symlink_format_manifest FOR TABLE '$p'")
    }
    assert(e.getMessage.contains("deletion vectors"))
  }

  test("shallow clone (absolute file paths) refuses with the source hint") {
    val src = tmp("clone_src")
    val dst = tmp("clone_dst")
    CommitWriter.createTable(spark, orders.limit(20).repartition(1), src)
    graft.commands.CloneCommand.shallowClone(spark, src, dst)
    val e = intercept[IllegalArgumentException] {
      new graft.GraftSession(spark).sql(
        s"GENERATE symlink_format_manifest FOR TABLE '$dst'")
    }
    assert(e.getMessage.contains("absolute path"))
    assert(e.getMessage.contains("source table"))
  }

  test("unpartitioned tables get one root manifest") {
    val p = tmp("flat")
    CommitWriter.createTable(spark, orders.limit(30).repartition(2), p)
    new graft.GraftSession(spark).sql(
      s"GENERATE symlink_format_manifest FOR TABLE '$p'")
    val byPart = manifestLines(p)
    assert(byPart.keySet == Set(""))
    assert(byPart("").size == 2)
  }
}
