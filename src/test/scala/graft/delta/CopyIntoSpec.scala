package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.CommitWriter

class CopyIntoSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val orders = spark.read
    .parquet(s"$sf/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_totalprice")

  test("COPY INTO ingests new files exactly once across re-runs") {
    val d = Files.createTempDirectory("graft_copyinto").toFile
    d.deleteOnExit()
    val p = new java.io.File(d, "tbl").getAbsolutePath
    val srcDir = new java.io.File(d, "src").getAbsolutePath
    CommitWriter.createTable(spark,
      orders.where(col("o_orderkey") % 3 === 0).repartition(1), p)
    val baseCount = orders.where(col("o_orderkey") % 3 === 0).count()
    // two source files
    orders.where(col("o_orderkey") % 3 === 1).repartition(1)
      .write.mode("overwrite").parquet(srcDir)
    orders.where(col("o_orderkey") % 3 === 2).repartition(1)
      .write.mode("append").parquet(srcDir)
    val session = new graft.GraftSession(spark)

    val m1 = session.sql(s"COPY INTO '$p' FROM '$srcDir'").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m1("files_loaded").toInt == 2)
    assert(DeltaTable.forPath(spark, p).read.count() == orders.count())

    // idempotent re-run: nothing ingested, nothing duplicated
    val m2 = session.sql(
      s"COPY INTO '$p' FROM '$srcDir' FILEFORMAT = PARQUET").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m2("files_loaded").toInt == 0)
    assert(DeltaTable.forPath(spark, p).read.count() == orders.count())

    // a NEW file in the same dir is picked up alone
    orders.limit(5).withColumn("o_orderkey", col("o_orderkey") + 9000000L)
      .repartition(1).write.mode("append").parquet(srcDir)
    val m3 = session.sql(s"COPY INTO '$p' FROM '$srcDir'").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m3("files_loaded").toInt == 1)
    assert(m3("rows_loaded").toInt == 5)
    assert(DeltaTable.forPath(spark, p).read.count() == orders.count() + 5)

    // FORCE re-ingests everything (explicitly duplicating)
    val m4 = session.sql(s"COPY INTO '$p' FROM '$srcDir' FORCE").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m4("files_loaded").toInt == 3)
    assert(DeltaTable.forPath(spark, p).read.count() ==
      orders.count() + 5 + (orders.count() - baseCount) + 5)
  }

  test("COPY INTO rejects schema drift and unknown formats") {
    val d = Files.createTempDirectory("graft_copyinto_bad").toFile
    d.deleteOnExit()
    val p = new java.io.File(d, "tbl").getAbsolutePath
    val srcDir = new java.io.File(d, "src").getAbsolutePath
    CommitWriter.createTable(spark, orders.limit(10).repartition(1), p)
    orders.limit(5).withColumn("extra", lit(1))
      .repartition(1).write.mode("overwrite").parquet(srcDir)
    val session = new graft.GraftSession(spark)
    val e = intercept[IllegalArgumentException] {
      session.sql(s"COPY INTO '$p' FROM '$srcDir'")
    }
    assert(e.getMessage.contains("extra"))
    intercept[IllegalArgumentException] {
      session.sql(s"COPY INTO '$p' FROM '$srcDir' FILEFORMAT = CSV")
    }
  }
}
