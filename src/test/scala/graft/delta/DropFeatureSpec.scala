package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.CommitWriter

class DropFeatureSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_dropf_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val orders = spark.read
    .parquet(s"$sf/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_totalprice")

  private def session = new graft.GraftSession(spark)

  test("a traceless writer feature drops; a traced one refuses") {
    val p = tmp("writer")
    CommitWriter.createTable(spark, orders.limit(20).repartition(1), p,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    assert(DeltaTable.forPath(spark, p).protocol
      .writerFeatures.get.contains("changeDataFeed"))
    // still enabled -> refuse
    val e = intercept[IllegalStateException] {
      session.sql(s"ALTER TABLE '$p' DROP FEATURE changeDataFeed")
    }
    assert(e.getMessage.contains("still true"))
    // disable, then drop
    session.sql(s"ALTER TABLE '$p' SET TBLPROPERTIES " +
      "('delta.enableChangeDataFeed' = 'false')")
    session.sql(s"ALTER TABLE '$p' DROP FEATURE changeDataFeed")
    val after = DeltaTable.forPath(spark, p)
    assert(!after.protocol.writerFeatures.get.contains("changeDataFeed"))
    // the table still reads and writes
    CommitWriter.append(spark, orders.limit(5).repartition(1), p)
    assert(DeltaTable.forPath(spark, p).read.count() == 25)
  }

  test("a reader feature needs TRUNCATE HISTORY and a traceless tip") {
    val p = tmp("reader")
    CommitWriter.createTable(spark, orders.limit(100).repartition(1), p,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    graft.commands.DmlCommands.delete(spark, p,
      col("o_orderkey") % 10 === 3)                       // v1: DV mask
    session.sql(s"ALTER TABLE '$p' SET TBLPROPERTIES " +
      "('delta.enableDeletionVectors' = 'false')")        // v2
    // live DV traces -> refuse regardless of TRUNCATE HISTORY
    val e1 = intercept[IllegalStateException] {
      session.sql(
        s"ALTER TABLE '$p' DROP FEATURE deletionVectors TRUNCATE HISTORY")
    }
    assert(e1.getMessage.contains("deletion vectors"))
    // rewrite the masked file, clearing the trace (minFiles=1: the
    // single masked file alone must qualify for compaction)
    graft.commands.OptimizeCommand.optimize(spark, p, minFiles = 1) // v3
    val survivors = DeltaTable.forPath(spark, p).read.count()
    // without TRUNCATE HISTORY the reader downgrade refuses
    val e2 = intercept[IllegalArgumentException] {
      session.sql(s"ALTER TABLE '$p' DROP FEATURE deletionVectors")
    }
    assert(e2.getMessage.contains("TRUNCATE HISTORY"))
    session.sql(
      s"ALTER TABLE '$p' DROP FEATURE deletionVectors TRUNCATE HISTORY")
    val after = DeltaTable.forPath(spark, p)
    assert(!after.protocol.readerFeatures.get.contains("deletionVectors"))
    assert(!after.protocol.writerFeatures.get.contains("deletionVectors"))
    assert(after.read.count() == survivors)
    // pre-checkpoint history is gone: time travel below the drop fails
    intercept[Exception] {
      DeltaTable.forPath(spark, p, Some(0L)).read.count()
    }
  }

  test("unknown and rewrite-requiring features refuse by name") {
    val p = tmp("unknown")
    CommitWriter.createTable(spark, orders.limit(10).repartition(1), p,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val e = intercept[Exception] {
      session.sql(s"ALTER TABLE '$p' DROP FEATURE notARealFeature")
    }
    assert(e.getMessage.contains("not declared"))
  }
}
