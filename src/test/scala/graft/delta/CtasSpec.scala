package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Path-addressed SQL CTAS / RTAS edge cases (the happy paths live in
  * ExtensionsSpec; these pin the review findings: partition-column
  * canonicalization, founding-commit constraint enforcement, property
  * guards, ICT enablement recording, CDF refusal). */
class CtasSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_ctas_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }
  private def g = new graft.GraftSession(spark)

  test("PARTITIONED BY canonicalizes case; unknown columns refuse") {
    val p = tmp("case")
    // BUCKET vs bucket: Spark's write resolves case-insensitively, so
    // without canonicalization this commits partitionColumns the
    // case-sensitive read path can never resolve
    g.sql(s"CREATE TABLE '$p' PARTITIONED BY (BUCKET) AS " +
      s"SELECT n_nationkey, CAST(n_regionkey AS INT) AS bucket " +
      s"FROM parquet.`$sf/nation.parquet`")
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.partitionColumns == Seq("bucket"))
    assert(snap.read.count() == 25)
    val e = intercept[Exception] {
      g.sql(s"CREATE TABLE '${tmp("badcol")}' PARTITIONED BY (nope) AS " +
        s"SELECT n_nationkey FROM parquet.`$sf/nation.parquet`")
    }
    assert(e.getMessage.contains("not found in schema"))
  }

  test("founding rows are constraint-checked and the feature declared") {
    val p = tmp("constraint")
    val e = intercept[Exception] {
      g.sql(s"CREATE TABLE '$p' " +
        "TBLPROPERTIES ('delta.constraints.pos' = 'x > 0') AS " +
        "SELECT CAST(-1 AS BIGINT) AS x")
    }
    assert(e.getMessage.toLowerCase.contains("constraint") ||
      e.getMessage.contains("pos"))
    // a violating founding write must not leave a readable table
    assert(!new java.io.File(p, "_delta_log").exists())
    // valid rows commit, with the writer obligation declared
    val p2 = tmp("constraint_ok")
    g.sql(s"CREATE TABLE '$p2' " +
      "TBLPROPERTIES ('delta.constraints.pos' = 'x > 0') AS " +
      "SELECT CAST(1 AS BIGINT) AS x")
    val snap = DeltaTable.forPath(spark, p2)
    assert(snap.protocol.minWriterVersion >= 3)
    // and the constraint binds later writers
    intercept[Exception] {
      graft.delta.log.CommitWriter.append(spark,
        spark.sql("SELECT CAST(-5 AS BIGINT) AS x"), p2)
    }
  }

  test("column-mapping properties are refused at CTAS") {
    val e = intercept[Exception] {
      g.sql(s"CREATE TABLE '${tmp("cm")}' " +
        "TBLPROPERTIES ('delta.columnMapping.mode' = 'name') AS " +
        "SELECT 1 AS a")
    }
    assert(e.getMessage.contains("columnMapping"))
  }

  test("RTAS enabling ICT mid-life records the enablement properties") {
    val p = tmp("ict")
    g.sql(s"CREATE TABLE '$p' AS SELECT CAST(1 AS BIGINT) AS a")
    g.sql(s"CREATE OR REPLACE TABLE '$p' " +
      "TBLPROPERTIES ('delta.enableInCommitTimestamps' = 'true') AS " +
      "SELECT CAST(2 AS BIGINT) AS a")
    val snap = DeltaTable.forPath(spark, p)
    val cfg = snap.metadata.configuration
    assert(cfg.get("delta.inCommitTimestampEnablementVersion")
      .contains(snap.version.toString))
    assert(cfg.contains("delta.inCommitTimestampEnablementTimestamp"))
    assert(snap.protocol.writerFeatures.getOrElse(Nil)
      .contains("inCommitTimestamp"))
    // the declared timestamp IS this commit's ICT (commit() contract)
    val history = graft.commands.HistoryCommand.history(spark, p)
    assert(history.count() == snap.version + 1)
  }

  test("RTAS on a change-data-feed table refuses with the real reason") {
    val p = tmp("cdf")
    g.sql(s"CREATE TABLE '$p' " +
      "TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true') AS " +
      "SELECT CAST(1 AS BIGINT) AS a")
    val e = intercept[Exception] {
      g.sql(s"CREATE OR REPLACE TABLE '$p' AS SELECT CAST(2 AS BIGINT) AS b")
    }
    assert(e.getMessage.contains("wholesale schema replace"))
  }
}
