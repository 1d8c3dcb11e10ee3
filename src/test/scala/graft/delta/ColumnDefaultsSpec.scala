package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.{ColumnDefaults, CommitWriter}

/** Column DEFAULT values (the `allowColumnDefaults` writer feature):
  * `ALTER TABLE ... ALTER COLUMN c SET DEFAULT <expr>` materializes the
  * default at WRITE time into batches that omit the column; history
  * and providing writers are untouched. */
class ColumnDefaultsSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_cd_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val region = spark.read.parquet(s"$sf/region.parquet")
  private lazy val g = new graft.GraftSession(spark)

  test("SET DEFAULT fills omitting writes; history and providers keep values") {
    val p = tmp("basic")
    // non-foldable `when` without `otherwise` keeps the column NULLABLE
    // (a NOT NULL column may only be omitted while its default exists)
    CommitWriter.createTable(spark, region
      .select(col("r_regionkey"), col("r_name"),
        when(col("r_regionkey") >= -1, lit(1)).cast("int").as("score")), p)
    g.sql(s"ALTER TABLE '$p' ALTER COLUMN score SET DEFAULT 42")
    val snap0 = DeltaTable.forPath(spark, p)
    assert(snap0.protocol.writerFeatures.getOrElse(Nil)
      .contains(ColumnDefaults.Feature))
    // an append OMITTING the column gets the default written
    CommitWriter.append(spark,
      region.limit(2).select(
        (col("r_regionkey") + 100).as("r_regionkey"), col("r_name")), p)
    // an append PROVIDING the column keeps its own values
    CommitWriter.append(spark,
      region.limit(1).select((col("r_regionkey") + 200).as("r_regionkey"),
        col("r_name"), lit(7).cast("int").as("score")), p)
    val out = DeltaTable.forPath(spark, p).read
    assert(out.where(col("r_regionkey") >= 100 && col("r_regionkey") < 200
      && col("score") === 42).count() == 2)
    assert(out.where(col("r_regionkey") >= 200).head
      .getAs[Int]("score") == 7)
    // pre-default rows are untouched (defaults never rewrite history)
    assert(out.where(col("r_regionkey") < 100 && col("score") === 1)
      .count() == region.count())

    // DROP DEFAULT: omitting writes go back to null imputation
    g.sql(s"ALTER TABLE '$p' ALTER COLUMN score DROP DEFAULT")
    CommitWriter.append(spark,
      region.limit(1).select((col("r_regionkey") + 300).as("r_regionkey"),
        col("r_name")), p)
    assert(DeltaTable.forPath(spark, p).read
      .where(col("r_regionkey") >= 300).head.isNullAt(2))
  }

  test("defaults flow through the streaming sink's append path") {
    val p = tmp("sink")
    CommitWriter.createTable(spark, region
      .select(col("r_regionkey"), lit("x").as("tag")).limit(0), p)
    g.sql(s"ALTER TABLE '$p' ALTER COLUMN tag SET DEFAULT 'filled'")
    // appendIfAbsent (the sink's write) omits the column
    CommitWriter.appendIfAbsent(spark,
      region.limit(3).select(col("r_regionkey")), p,
      appId = "cd-sink", txnVersion = 0L)
    val out = DeltaTable.forPath(spark, p).read
    assert(out.count() == 3 &&
      out.where(col("tag") === "filled").count() == 3)
  }

  test("validation: bad expressions, generated columns, unknown columns") {
    val p = tmp("val")
    CommitWriter.createTable(spark, region
      .select(col("r_regionkey"), lit(1).cast("int").as("score")), p)
    // an unanalyzable default fails AT ALTER TIME, not at some later
    // append
    intercept[Exception] {
      g.sql(s"ALTER TABLE '$p' ALTER COLUMN score SET DEFAULT no_such_fn(1)")
    }
    // defaults may not reference columns — the probe frame has none,
    // so even a name that HAPPENS to exist somewhere (range's id, a
    // future batch column) fails here instead of binding at write time
    intercept[Exception] {
      g.sql(s"ALTER TABLE '$p' ALTER COLUMN score SET DEFAULT id")
    }
    intercept[IllegalArgumentException] {
      g.sql(s"ALTER TABLE '$p' ALTER COLUMN nope SET DEFAULT 1")
    }
    intercept[IllegalArgumentException] {
      g.sql(s"ALTER TABLE '$p' ALTER COLUMN score DROP DEFAULT")
    }
    // resolution is case-insensitive, like every read/write path
    g.sql(s"ALTER TABLE '$p' ALTER COLUMN SCORE SET DEFAULT 3")
    CommitWriter.append(spark,
      region.limit(1).select((col("r_regionkey") + 500).as("r_regionkey")),
      p)
    assert(DeltaTable.forPath(spark, p).read
      .where(col("r_regionkey") >= 500).head.getAs[Int]("score") == 3)
  }

  test("a mergeSchema-evolved column can take a default afterwards") {
    val p = tmp("interplay")
    CommitWriter.createTable(spark,
      region.select(col("r_regionkey")), p)
    // evolution first: the column arrives nullable via mergeSchema...
    CommitWriter.append(spark,
      region.limit(2).select((col("r_regionkey") + 10).as("r_regionkey"),
        lit("real").as("src")), p, mergeSchema = true)
    // ...then the default binds to it like any existing column
    g.sql(s"ALTER TABLE '$p' ALTER COLUMN src SET DEFAULT 'backfill'")
    CommitWriter.append(spark,
      region.limit(1).select((col("r_regionkey") + 20).as("r_regionkey")),
      p)
    val out = DeltaTable.forPath(spark, p).read
    // three populations: pre-evolution null, explicit, defaulted
    assert(out.where(col("r_regionkey") < 10 && col("src").isNull)
      .count() == region.count())
    assert(out.where(col("src") === "real").count() == 2)
    assert(out.where(col("src") === "backfill").count() == 1)
  }

  test("RESTORE TO TIMESTAMP AS OF resolves like the read path") {
    val p = tmp("restore_ts")
    CommitWriter.createTable(spark, region.limit(2), p) // v0
    Thread.sleep(1100)
    val cut = System.currentTimeMillis()
    Thread.sleep(1100)
    CommitWriter.append(spark, region.limit(1), p) // v1
    assert(DeltaTable.forPath(spark, p).read.count() == 3)
    // epoch-millis literal form; restores to the version live at `cut`
    g.sql(s"RESTORE '$p' TO TIMESTAMP AS OF $cut")
    assert(DeltaTable.forPath(spark, p).read.count() == 2)
    // a timestamp before the table existed names the problem
    val err = intercept[IllegalArgumentException] {
      g.sql(s"RESTORE '$p' TO TIMESTAMP AS OF 1000")
    }
    assert(err.getMessage.contains("No table version"))
  }
}
