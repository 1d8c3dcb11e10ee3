package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.CommitWriter

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

  test("SQL over the source via temp view") {
    spark.read.format("graftdelta").option("path", table).load()
      .createOrReplaceTempView("src_region")
    assert(spark.sql(
      "SELECT count(*) FROM src_region WHERE r_regionkey < 2")
      .head().getLong(0) == 2)
  }
}
