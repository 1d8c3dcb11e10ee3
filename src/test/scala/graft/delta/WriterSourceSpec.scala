package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class WriterSourceSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_ws_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val region = spark.read.parquet(s"$sf/region.parquet")

  test("df.write.format(graftdelta) creates, appends, overwrites") {
    val p = tmp("w")
    region.filter(col("r_regionkey") < 3).write
      .format("graftdelta").save(p)
    assert(DeltaTable.forPath(spark, p).read.count() == 3)

    region.filter(col("r_regionkey") >= 3).write
      .format("graftdelta").mode("append").save(p)
    assert(DeltaTable.forPath(spark, p).read.count() == region.count())

    region.limit(2).write.format("graftdelta").mode("overwrite").save(p)
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.read.count() == 2)
    // old versions stay time-travelable (logical overwrite)
    assert(DeltaTable.forPath(spark, p, Some(1)).read.count() == region.count())
  }

  test("errorifexists / ignore semantics") {
    val p = tmp("e")
    region.write.format("graftdelta").save(p)
    intercept[IllegalStateException] {
      region.write.format("graftdelta").mode("errorifexists").save(p)
    }
    region.limit(1).write.format("graftdelta").mode("ignore").save(p)
    assert(DeltaTable.forPath(spark, p).read.count() == region.count())
  }

  test("partitioned create through the writer option") {
    val p = tmp("p")
    spark.read.parquet(s"$sf/orders.parquet")
      .write.format("graftdelta").option("partitionBy", "o_orderstatus")
      .save(p)
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.partitionColumns == Seq("o_orderstatus"))
    assert(snap.readWhere(col("o_orderstatus") === "F").count() ==
      spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderstatus") === "F").count())
  }
}
