package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.CommitWriter
import org.apache.spark.sql.types.StructType

class SourceSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val table: String = {
    val d = Files.createTempDirectory("graft_src").toFile
    d.deleteOnExit()
    val p = new java.io.File(d, "tbl").getAbsolutePath
    val region = spark.read.parquet(s"$sf/region.parquet")
    CommitWriter.createTable(spark, region.filter(col("r_regionkey") < 3), p)
    CommitWriter.append(spark, region.filter(col("r_regionkey") >= 3), p)
    p
  }

  test("format('graftdelta') reads the table") {
    val df = spark.read.format("graftdelta").option("path", table).load()
    assert(df.count() == spark.read.parquet(s"$sf/region.parquet").count())
    assert(df.schema.fieldNames.toSeq == Seq("r_regionkey", "r_name"))
  }

  test("filters + projection flow through the source") {
    val df = spark.read.format("graftdelta").option("path", table).load()
      .where(col("r_regionkey") >= 3)
      .select("r_name")
    assert(df.collect().length == 2)
  }

  test("versionAsOf option time-travels") {
    val df = spark.read.format("graftdelta")
      .option("path", table).option("versionAsOf", "0").load()
    assert(df.count() == 3)
  }

  test("timestampAsOf option time-travels via commit mtimes") {
    table // force fixture build
    val now = System.currentTimeMillis()
    val df = spark.read.format("graftdelta")
      .option("path", table).option("timestampAsOf", now.toString).load()
    assert(df.count() == 5) // at "now" the table is fully appended
    intercept[IllegalArgumentException] {
      spark.read.format("graftdelta").option("path", table)
        .option("versionAsOf", "0").option("timestampAsOf", now.toString)
        .load()
    }
  }

  test("SQL over the source via temp view") {
    spark.read.format("graftdelta").option("path", table).load()
      .createOrReplaceTempView("src_region")
    assert(spark.sql(
      "SELECT count(*) FROM src_region WHERE r_regionkey < 2")
      .head().getLong(0) == 2)
  }

  test("DV table reads through the format (composed V1Scan fallback)") {
    val p = graft.queries.DeltaQueries.dvTable(spark, sf)
    val viaFormat = spark.read.format("graftdelta").option("path", p).load()
    val direct = DeltaTable.forPath(spark, p).read
    assert(viaFormat.count() == direct.count())
    // pushed filters still surface on the v1-bridged scan node
    val filtered = viaFormat.where(col("c_custkey") <= 100)
    filtered.collect()
    assert(filtered.queryExecution.executedPlan.toString.contains("PushedFilters"))
  }

  test("schema-evolved table reads through the native DSv2 path") {
    val p = graft.queries.DeltaQueries.evolvedTable(spark, sf)
    val df = spark.read.format("graftdelta").option("path", p).load()
    val direct = DeltaTable.forPath(spark, p).read
    assert(df.count() == direct.count())
    // old files lack o_orderstatus; the native parquet read imputes null
    assert(df.where(col("o_orderstatus").isNull).count() ==
      direct.where(col("o_orderstatus").isNull).count())
  }

  test("type-widened table reads through the native DSv2 path") {
    val p = graft.queries.DeltaQueries.widenedTable(spark, sf)
    val df = spark.read.format("graftdelta").option("path", p).load()
    val direct = DeltaTable.forPath(spark, p).read
    assert(df.schema == StructType(direct.schema.fields.toIndexedSeq))
    assert(df.agg(sum("o_orderkey")).head().getLong(0) ==
      direct.agg(sum("o_orderkey")).head().getLong(0))
  }
}
