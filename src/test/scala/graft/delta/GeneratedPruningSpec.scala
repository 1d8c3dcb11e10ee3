package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.CommitWriter
import graft.delta.scan.DeltaScan

/** Partition pruning through generated columns: a predicate on the
  * SOURCE of a monotone generation expression (ts, where the layout
  * key is event_date = CAST(ts AS DATE)) must prune partitions. Stats
  * are disabled on these fixtures (dataSkippingNumIndexedCols=0) so
  * any pruning observed can ONLY come from the derived partition
  * predicate, never from per-file ts min/max. */
class GeneratedPruningSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_genp_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  /** 10 daily partitions x 10 rows, partitioned on a generated column;
    * the generation expression is tagged post-create (the values were
    * written consistently by construction). */
  private def dailyTable(name: String, genSql: String,
      genCol: String = "event_date"): String = {
    val p = tmp(name)
    val df = spark.range(100).select(col("id"),
      expr("timestampadd(DAY, CAST(id / 10 AS INT), " +
        "TIMESTAMP'2026-01-01 00:30:00')").as("ts"))
      .withColumn(genCol, expr(genSql))
    CommitWriter.createTable(spark, df, p,
      partitionColumns = Seq(genCol),
      configuration = Map("delta.dataSkippingNumIndexedCols" -> "0"))
    val snap0 = DeltaTable.forPath(spark, p)
    val fields = snap0.schema.fields.map { f =>
      if (f.name == genCol)
        f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .putString("delta.generationExpression", genSql).build())
      else f
    }
    CommitWriter.commitMetadata(spark, p, snap0.metadata.copy(
      schemaString = org.apache.spark.sql.types.StructType(fields).json))
    p
  }

  test("ts range prunes CAST(ts AS DATE) generated partitions") {
    val p = dailyTable("castdate", "CAST(ts AS DATE)")
    val snap = DeltaTable.forPath(spark, p)
    val total = snap.allFiles.count()
    assert(total >= 10L)
    val cut = java.sql.Timestamp.valueOf("2026-01-08 00:00:00")
    val kept = DeltaScan.prunedFiles(snap,
      Seq(col("ts") >= lit(cut))).count()
    assert(kept < total / 2,
      s"derived event_date bound should prune: kept $kept of $total")
    assert(kept >= 1L)
    // results identical to the unpruned semantics
    assert(snap.readWhere(col("ts") >= lit(cut)).count() == 30L)
    // equality on ts pins a single day's partition
    val eq = java.sql.Timestamp.valueOf("2026-01-03 00:30:00")
    val keptEq = DeltaScan.prunedFiles(snap,
      Seq(col("ts") === lit(eq))).count()
    assert(keptEq <= total / 5, s"equality kept $keptEq of $total")
    // all 10 rows of that day share the fixture's identical ts
    assert(snap.readWhere(col("ts") === lit(eq)).count() == 10L)
    // a STRICT bound exactly at a day boundary keeps that day (the
    // derived bound is inclusive — f is monotone, not strictly)
    val boundary = java.sql.Timestamp.valueOf("2026-01-03 00:00:00")
    assert(snap.readWhere(col("ts") > lit(boundary)).count() == 80L)
  }

  test("date_trunc generated partitions prune too") {
    val p = dailyTable("trunc", "date_trunc('DAY', ts)", genCol = "day_ts")
    val snap = DeltaTable.forPath(spark, p)
    val total = snap.allFiles.count()
    val cut = java.sql.Timestamp.valueOf("2026-01-09 12:00:00")
    val kept = DeltaScan.prunedFiles(snap,
      Seq(col("ts") >= lit(cut))).count()
    assert(kept < total / 2, s"kept $kept of $total")
    assert(snap.readWhere(col("ts") >= lit(cut)).count() == 10L)
  }

  test("non-monotone month() never derives (no wrong pruning)") {
    val p = dailyTable("month", "month(ts)", genCol = "event_month")
    val snap = DeltaTable.forPath(spark, p)
    val total = snap.allFiles.count()
    // month(ts) wraps yearly: no derivation, every file stays
    val kept = DeltaScan.prunedFiles(snap,
      Seq(col("ts") >= lit(
        java.sql.Timestamp.valueOf("2026-01-08 00:00:00")))).count()
    assert(kept == total)
  }

  test("string-typed source never derives (collation is not monotone)") {
    // CAST(string AS DATE) is monotone in the DATE domain but not in
    // string collation: '2026-2-1' sorts AFTER '2026-10-01' yet casts
    // to an EARLIER date — deriving would prune a file whose row
    // matches the string comparison. The source-type gate must refuse.
    val p = tmp("strsrc")
    import spark.implicits._
    val df = Seq(("2026-2-1", 1), ("2026-11-15", 2), ("2026-01-05", 3))
      .toDF("src", "v")
      .withColumn("event_date", expr("CAST(src AS DATE)"))
      .repartition(3, col("src"))
    CommitWriter.createTable(spark, df, p,
      partitionColumns = Seq("event_date"),
      configuration = Map("delta.dataSkippingNumIndexedCols" -> "0"))
    val snap0 = DeltaTable.forPath(spark, p)
    val fields = snap0.schema.fields.map { f =>
      if (f.name == "event_date")
        f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .putString("delta.generationExpression", "CAST(src AS DATE)")
          .build())
      else f
    }
    CommitWriter.commitMetadata(spark, p, snap0.metadata.copy(
      schemaString = org.apache.spark.sql.types.StructType(fields).json))
    val snap = DeltaTable.forPath(spark, p)
    // lexicographically, BOTH '2026-2-1' and '2026-11-15' match
    val got = snap.readWhere(col("src") >= "2026-10-01")
      .select("v").collect().map(_.getInt(0)).toSet
    assert(got == Set(1, 2),
      s"string-source derivation pruned a matching row: got $got")
  }

  test("bounds inside OR do not transfer") {
    val p = dailyTable("or", "CAST(ts AS DATE)")
    val snap = DeltaTable.forPath(spark, p)
    val total = snap.allFiles.count()
    val cut = java.sql.Timestamp.valueOf("2026-01-08 00:00:00")
    val kept = DeltaScan.prunedFiles(snap,
      Seq(col("ts") >= lit(cut) || col("id") < 5)).count()
    assert(kept == total, "an OR branch bound must not prune")
    assert(snap.readWhere(
      col("ts") >= lit(cut) || col("id") < 5).count() == 35L)
  }
}
