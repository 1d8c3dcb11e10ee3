package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.CommitWriter

class FsckSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_fsck_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val orders = spark.read
    .parquet(s"$sf/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_totalprice")

  private def dataFiles(p: String): Seq[java.io.File] =
    new java.io.File(p).listFiles()
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_")).toSeq

  test("FSCK lists a lost data file under DRY RUN, repairs it, and the " +
    "table reads again") {
    val p = tmp("repair")
    val n = orders.count()
    CommitWriter.createTable(spark,
      orders.where(col("o_orderkey") % 2 === 0).repartition(1), p)
    CommitWriter.append(spark,
      orders.where(col("o_orderkey") % 2 === 1).repartition(1), p)
    // lose the odd-keys file out of band
    val snap0 = DeltaTable.forPath(spark, p)
    val oddRel = snap0.allFiles.select("path").collect().map(_.getString(0))
      .find { rel =>
        spark.read.parquet(s"$p/$rel")
          .where(col("o_orderkey") % 2 === 1).count() > 0
      }.get
    assert(new java.io.File(p, oddRel).delete())

    // the scan now fails on the lost span
    intercept[Exception] {
      DeltaTable.forPath(spark, p).read.count()
    }
    val session = new graft.GraftSession(spark)
    val listed = session.sql(s"FSCK REPAIR TABLE '$p' DRY RUN").collect()
    assert(listed.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq((oddRel, "data file missing")))
    // DRY RUN committed nothing
    assert(DeltaTable.forPath(spark, p).version == snap0.version)

    val m = session.sql(s"FSCK REPAIR TABLE '$p'").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("entries_removed").toInt == 1)
    val after = DeltaTable.forPath(spark, p)
    assert(after.version == snap0.version + 1)
    assert(after.read.count() ==
      orders.where(col("o_orderkey") % 2 === 0).count())
    // a healthy table repairs to a no-op
    val m2 = session.sql(s"FSCK REPAIR TABLE '$p'").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m2("entries_removed").toInt == 0)
    assert(DeltaTable.forPath(spark, p).version == after.version)
  }

  test("a file whose deletion vector is lost is removed whole (masked " +
    "rows must not resurrect)") {
    val p = tmp("dv")
    CommitWriter.createTable(spark, orders.limit(100).repartition(1), p,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    graft.commands.DmlCommands.delete(spark, p,
      col("o_orderkey") % 10 === 3)
    val snap = DeltaTable.forPath(spark, p)
    val survivors = snap.read.count()
    assert(survivors < 100)
    // lose the DV file out of band
    val dvFile = new java.io.File(p).listFiles()
      .find(f => f.getName.startsWith("deletion_vector_")).get
    assert(dvFile.delete())
    val session = new graft.GraftSession(spark)
    val listed = session.sql(s"FSCK REPAIR TABLE '$p' DRY RUN").collect()
    assert(listed.map(_.getString(1)).toSeq == Seq("deletion vector missing"))
    session.sql(s"FSCK REPAIR TABLE '$p'")
    // the masked file is gone entirely: no rows served, none resurrected
    assert(DeltaTable.forPath(spark, p).read.count() == 0)
  }
}
