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

  test("mergeSchema append evolves the schema in the same commit") {
    val p = tmp("ms")
    region.select(col("r_regionkey"), col("r_name")).write
      .format("graftdelta").save(p)
    val widened = region
      .select(col("r_regionkey"), col("r_name"),
        (col("r_regionkey") * 10).as("score"))
    // without the opt-in: rejected up front
    val err = intercept[IllegalArgumentException] {
      widened.write.format("graftdelta").mode("append").save(p)
    }
    assert(err.getMessage.contains("mergeSchema"))
    widened.write.format("graftdelta").mode("append")
      .option("mergeSchema", "true").save(p)
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.version == 1, "evolution must ride the data commit")
    assert(snap.schema.fieldNames.toSeq ==
      Seq("r_regionkey", "r_name", "score"))
    val out = snap.read
    assert(out.count() == region.count() * 2)
    // pre-evolution files impute null for the new column
    assert(out.where(col("score").isNull).count() == region.count())
    assert(out.where(col("score") === col("r_regionkey") * 10).count() ==
      region.count())
  }

  test("mergeSchema merges nested struct fields and keeps type safety") {
    val p = tmp("msn")
    val base = region.select(col("r_regionkey"),
      struct(col("r_name").as("name")).as("info"))
    base.write.format("graftdelta").save(p)
    val evolved = region.select(col("r_regionkey"),
      struct(col("r_name").as("name"),
        length(col("r_name")).as("clen")).as("info"))
    evolved.write.format("graftdelta").mode("append")
      .option("mergeSchema", "true").save(p)
    val snap = DeltaTable.forPath(spark, p)
    val info = snap.schema("info").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(info.fieldNames.toSeq == Seq("name", "clen"))
    assert(snap.read.where(col("info.clen").isNull).count() ==
      region.count())
    // a type CONFLICT on a shared column still rejects even with the flag
    val conflicted = region.select(col("r_regionkey").cast("string"),
      struct(col("r_name").as("name")).as("info"))
    val err = intercept[IllegalArgumentException] {
      conflicted.write.format("graftdelta").mode("append")
        .option("mergeSchema", "true").save(p)
    }
    assert(err.getMessage.contains("incompatible column type"))
    // a writer still sending the PRE-evolution nested shape stays
    // valid WITHOUT the flag: nested subset writes read back with the
    // missing nested field imputed null (same contract as missing
    // top-level columns)
    base.write.format("graftdelta").mode("append").save(p)
    val after = DeltaTable.forPath(spark, p).read
    assert(after.count() == region.count() * 3)
    assert(after.where(col("info.clen").isNull).count() ==
      region.count() * 2)
  }

  test("mergeSchema append on a COLUMN-MAPPED table allocates physical " +
    "names/field ids in the same commit") {
    val p = tmp("mscm")
    val base = region.select(col("r_regionkey"), col("r_name"))
    graft.delta.log.CommitWriter.createTableMapped(
      spark, base.repartition(1), p)
    val widened = base.withColumn("score", col("r_regionkey") * 10)
    // without the opt-in: still rejected up front
    intercept[IllegalArgumentException] {
      graft.delta.log.CommitWriter.append(spark, widened, p)
    }
    graft.delta.log.CommitWriter.append(spark, widened.repartition(1), p,
      mergeSchema = true)
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.version == 1, "evolution must ride the data commit")
    assert(snap.schema.fieldNames.toSeq ==
      Seq("r_regionkey", "r_name", "score"))
    // the new field got the NEXT id off the high-water mark and the
    // mark advanced — the same allocation ALTER TABLE ADD COLUMN does
    val scoreF = snap.schema("score")
    assert(scoreF.metadata.getLong("delta.columnMapping.id") == 3L)
    assert(scoreF.metadata.getString(
      "delta.columnMapping.physicalName") == "col-3")
    assert(snap.metadata.configuration(
      "delta.columnMapping.maxColumnId") == "3")
    // the evolved file landed under the PHYSICAL name
    val newest = snap.allFiles.select("path").collect().map(_.getString(0))
      .filter(rel => spark.read.parquet(s"$p/$rel").columns.contains("col-3"))
    assert(newest.nonEmpty, "expected the evolved add to carry col-3")
    // reads: old files impute null, values come back under logical names
    val out = snap.read
    assert(out.count() == region.count() * 2)
    assert(out.where(col("score").isNull).count() == region.count())
    assert(out.where(col("score") === col("r_regionkey") * 10).count() ==
      region.count())
    // a later ADD COLUMN keeps allocating past the mark (no collision)
    graft.GraftSession(spark).sql(
      s"ALTER TABLE '$p' ADD COLUMN extra INT")
    val after = DeltaTable.forPath(spark, p)
    assert(after.schema("extra").metadata
      .getString("delta.columnMapping.physicalName") == "col-4")
  }

  test("mergeSchema overwrite replaces data but keeps old columns") {
    val p = tmp("mso")
    region.select(col("r_regionkey"), col("r_name")).write
      .format("graftdelta").save(p)
    region.select(col("r_regionkey"), lit("x").as("tag")).write
      .format("graftdelta").mode("overwrite")
      .option("mergeSchema", "true").save(p)
    val snap = DeltaTable.forPath(spark, p)
    // delta-spark mergeSchema-on-overwrite UNIONS schemas (overwriteSchema
    // is the separate replace-wholesale knob): r_name stays, all null now
    assert(snap.schema.fieldNames.toSeq ==
      Seq("r_regionkey", "r_name", "tag"))
    assert(snap.read.where(col("r_name").isNotNull).count() == 0)
    assert(snap.read.where(col("tag") === "x").count() == region.count())
  }
}
