package graft.delta

import java.nio.file.Files
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.CommitWriter

class AnalyzeSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_analyze_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val orders = spark.read
    .parquet(s"$sf/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_totalprice")

  private val mapper = new ObjectMapper()

  private def statsOf(p: String): Seq[com.fasterxml.jackson.databind.JsonNode] =
    DeltaTable.forPath(spark, p).allFiles.select("stats").collect()
      .map(r => mapper.readTree(r.getString(0))).toSeq

  private def metricsOf(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("ANALYZE recollects stats for numRecords-only files, is " +
    "idempotent, and covers schema-evolved nulls") {
    val p = tmp("basic")
    val g = graft.GraftSession(spark)
    CommitWriter.createTable(spark, orders.repartition(2), p,
      configuration = Map(CommitWriter.DataSkippingNumIndexedColsKey -> "0"))
    // evolved append BEFORE stats existed: the old files lack `bonus`
    CommitWriter.append(spark,
      orders.limit(100).withColumn("bonus", col("o_orderkey") * 2)
        .repartition(1), p, mergeSchema = true)
    assert(statsOf(p).forall(n => n.get("minValues") == null ||
      n.get("minValues").size() == 0), "fixture must start stats-less")

    g.sql(s"ALTER TABLE '$p' SET TBLPROPERTIES " +
      s"('${CommitWriter.DataSkippingNumIndexedColsKey}' = '32')")
    val m1 = metricsOf(g.sql(s"ANALYZE TABLE '$p' COMPUTE DELTA STATISTICS"))
    assert(m1("files_analyzed").toInt == 3)
    // every live file now carries min/max for o_orderkey, and the
    // pre-evolution files record bonus as all-null (nullCount ==
    // numRecords, min/max absent) — exactly what a reader observes
    val stats = statsOf(p)
    assert(stats.forall(_.get("minValues").has("o_orderkey")))
    val preEvolution = stats.filter(n =>
      !n.get("minValues").has("bonus"))
    assert(preEvolution.nonEmpty)
    preEvolution.foreach(n => assert(
      n.get("nullCount").get("bonus").asLong == n.get("numRecords").asLong))
    // the skipping engine prunes on the recollected stats
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.readWhere(col("o_orderkey") < -1).count() == 0)
    assert(snap.read.count() == orders.count() + 100)
    // idempotent: everything is covered now
    val m2 = metricsOf(g.sql(s"ANALYZE TABLE '$p' COMPUTE STATISTICS"))
    assert(m2("files_analyzed").toInt == 0)
    assert(m2("files_already_covered").toInt == 3)
  }

  test("ANALYZE on a column-mapped table keys stats by physical name") {
    val p = tmp("mapped")
    val g = graft.GraftSession(spark)
    CommitWriter.createTableMapped(spark, orders.repartition(1), p)
    g.sql(s"ALTER TABLE '$p' SET TBLPROPERTIES " +
      s"('${CommitWriter.DataSkippingNumIndexedColsKey}' = '0')")
    CommitWriter.append(spark, orders.repartition(1), p)
    g.sql(s"ALTER TABLE '$p' SET TBLPROPERTIES " +
      s"('${CommitWriter.DataSkippingNumIndexedColsKey}' = '32')")
    val m = metricsOf(g.sql(s"ANALYZE TABLE '$p' COMPUTE DELTA STATISTICS"))
    // only the numRecords-only append needs recollecting; the founding
    // file was fully indexed at write time
    assert(m("files_analyzed").toInt == 1)
    assert(statsOf(p).forall(_.get("minValues").has("col-1")))
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.readWhere(col("o_orderkey") < -1).count() == 0)
    assert(snap.read.count() == orders.count() * 2)
  }

  test("ANALYZE preserves deletion vectors on re-added files and " +
    "records PHYSICAL row counts") {
    val p = tmp("dv")
    val g = graft.GraftSession(spark)
    CommitWriter.createTable(spark, orders.repartition(1), p,
      configuration = Map(
        CommitWriter.DataSkippingNumIndexedColsKey -> "0",
        "delta.enableDeletionVectors" -> "true"))
    g.sql(s"DELETE FROM '$p' WHERE o_orderkey % 2 = 0")
    val expected = orders.where(col("o_orderkey") % 2 =!= 0).count()
    assert(DeltaTable.forPath(spark, p).read.count() == expected)

    g.sql(s"ALTER TABLE '$p' SET TBLPROPERTIES " +
      s"('${CommitWriter.DataSkippingNumIndexedColsKey}' = '32')")
    val m = metricsOf(g.sql(s"ANALYZE TABLE '$p' COMPUTE DELTA STATISTICS"))
    assert(m("files_analyzed").toInt == 1)
    val snap = DeltaTable.forPath(spark, p)
    // the DV survived the re-add: masked rows stay deleted...
    assert(snap.read.count() == expected)
    // ...while numRecords counts the file's PHYSICAL rows (stats are
    // per-file; DV cardinality is subtracted separately by readers)
    assert(statsOf(p).map(_.get("numRecords").asLong).sum == orders.count())
    assert(snap.statsRowCount.contains(expected))
  }
}
