package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftSession, TestSpark}
import graft.delta.log.{Actions, CommitWriter, LogSegment}

/** CHECK-constraint lifecycle: ADD CONSTRAINT (validation scan +
  * protocol requirement + metadata commit), inline enforcement on
  * append / UPDATE / MERGE, NULL-passes semantics, DROP CONSTRAINT.
  * Mirrors the Delta constraints contract (writer feature
  * `checkConstraints`): a compliant writer never commits a row whose
  * constraint evaluates to FALSE.
  */
class ConstraintsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val region = spark.read.parquet(s"$sf/region.parquet")
  private lazy val g = new GraftSession(spark)

  private def tmpTable(name: String): String = {
    val d = Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private def rootMessages(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).toSeq

  test("ADD CONSTRAINT validates existing rows, commits, requires writer v3") {
    val path = tmpTable("cons_add")
    CommitWriter.createTable(spark, region, path)
    assert(DeltaTable.forPath(spark, path).protocol.minWriterVersion == 2)
    g.sql(s"ALTER TABLE '$path' ADD CONSTRAINT positive " +
      "CHECK (r_regionkey >= 0)")
    val snap = DeltaTable.forPath(spark, path)
    assert(snap.metadata.configuration
      .get("delta.constraints.positive").contains("r_regionkey >= 0"))
    // checkConstraints is a legacy writer-v3 feature: the protocol must
    // record the obligation so OTHER engines enforce it too
    assert(snap.protocol.minWriterVersion == 3)
    // compliant append passes, violating append aborts uncommitted
    CommitWriter.append(spark, region.limit(1), path)
    val vBefore = DeltaTable.forPath(spark, path).version
    val e = intercept[Exception] {
      CommitWriter.append(spark,
        region.limit(1).withColumn("r_regionkey", lit(-1).cast("int")), path)
    }
    assert(rootMessages(e).exists(_.contains("CHECK constraint positive")))
    assert(DeltaTable.forPath(spark, path).version == vBefore)
  }

  test("ADD CONSTRAINT refuses when existing rows already violate") {
    val path = tmpTable("cons_invalid")
    CommitWriter.createTable(spark, region, path)
    val e = intercept[IllegalArgumentException] {
      g.sql(s"ALTER TABLE '$path' ADD CONSTRAINT impossible " +
        "CHECK (r_regionkey > 100)")
    }
    assert(e.getMessage.contains("existing rows violate"))
    assert(!DeltaTable.forPath(spark, path).metadata.configuration
      .contains("delta.constraints.impossible"))
  }

  test("DROP CONSTRAINT lifts enforcement") {
    val path = tmpTable("cons_drop")
    CommitWriter.createTable(spark, region, path)
    g.sql(s"ALTER TABLE '$path' ADD CONSTRAINT positive " +
      "CHECK (r_regionkey >= 0)")
    g.sql(s"ALTER TABLE '$path' DROP CONSTRAINT positive")
    assert(!DeltaTable.forPath(spark, path).metadata.configuration
      .contains("delta.constraints.positive"))
    CommitWriter.append(spark,
      region.limit(1).withColumn("r_regionkey", lit(-1).cast("int")), path)
    assert(DeltaTable.forPath(spark, path).read
      .filter(col("r_regionkey") < 0).count() == 1)
  }

  test("NULL constraint evaluations pass (SQL CHECK semantics)") {
    val path = tmpTable("cons_null")
    import spark.implicits._
    val df = Seq((1, Option(10)), (2, Option(20)))
      .toDF("id", "score")
    CommitWriter.createTable(spark, df, path)
    g.sql(s"ALTER TABLE '$path' ADD CONSTRAINT big CHECK (score > 5)")
    // NULL score: constraint evaluates to NULL -> row is accepted
    CommitWriter.append(spark,
      Seq((3, None: Option[Int])).toDF("id", "score"), path)
    assert(DeltaTable.forPath(spark, path).read.count() == 3)
    // FALSE still rejects
    val e = intercept[Exception] {
      CommitWriter.append(spark,
        Seq((4, Option(1))).toDF("id", "score"), path)
    }
    assert(rootMessages(e).exists(_.contains("CHECK constraint big")))
  }

  test("UPDATE and MERGE cannot manufacture violating rows") {
    val path = tmpTable("cons_dml")
    CommitWriter.createTable(spark, region, path)
    g.sql(s"ALTER TABLE '$path' ADD CONSTRAINT positive " +
      "CHECK (r_regionkey >= 0)")
    val e1 = intercept[Exception] {
      graft.commands.DmlCommands.update(spark, path,
        col("r_regionkey") === 2,
        Map("r_regionkey" -> lit(-7).cast("int")))
    }
    assert(rootMessages(e1).exists(_.contains("CHECK constraint positive")))
    val badSrc = region.limit(1)
      .withColumn("r_regionkey", lit(-9).cast("int"))
    val e2 = intercept[Exception] {
      graft.commands.MergeCommand.upsert(spark, path, badSrc,
        Seq("r_regionkey"))
    }
    assert(rootMessages(e2).exists(_.contains("CHECK constraint positive")))
    // the table is intact after both failed rewrites
    assert(DeltaTable.forPath(spark, path).read.count() == region.count())
    // a compliant MERGE still lands
    graft.commands.MergeCommand.upsert(spark, path,
      region.limit(1).withColumn("r_name", lit("updated")),
      Seq("r_regionkey"))
    assert(DeltaTable.forPath(spark, path).read
      .filter(col("r_name") === "updated").count() == 1)
  }

  test("table-features protocols gain the checkConstraints feature on ADD") {
    val path = tmpTable("cons_features")
    CommitWriter.createTable(spark, region, path)
    val v = LogSegment.forTable(spark,
      new org.apache.hadoop.fs.Path(path)).version + 1
    CommitWriter.commit(spark, path, v,
      Seq(CommitWriter.protocolJson(Actions.Protocol(1, 7, None,
        Some(Seq("appendOnly"))))), operation = "UPGRADE PROTOCOL")
    // appendOnly FEATURE without the config set does not block DML
    g.sql(s"ALTER TABLE '$path' ADD CONSTRAINT positive " +
      "CHECK (r_regionkey >= 0)")
    val proto = DeltaTable.forPath(spark, path).protocol
    assert(proto.minWriterVersion == 7)
    assert(proto.writerFeatures.getOrElse(Nil).contains("checkConstraints"))
    // enforcement is live under the feature protocol too
    val e = intercept[Exception] {
      CommitWriter.append(spark,
        region.limit(1).withColumn("r_regionkey", lit(-1).cast("int")), path)
    }
    assert(rootMessages(e).exists(_.contains("CHECK constraint positive")))
  }

  test("UPDATE recomputes generated columns from the new base values") {
    val path = tmpTable("cons_gen_update")
    import spark.implicits._
    val df = Seq((1, 10), (2, 20)).toDF("id", "amount")
      .withColumn("double_amount", col("amount") * 2)
    CommitWriter.createTable(spark, df, path)
    // declare double_amount generated AFTER create (the writer wrote
    // consistent values already)
    val snap0 = DeltaTable.forPath(spark, path)
    val fields = snap0.metadata.dataSchema.fields.map { f =>
      if (f.name == "double_amount")
        f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .putString("delta.generationExpression", "amount * 2").build())
      else f
    }
    CommitWriter.commit(spark, path, snap0.version + 1,
      Seq(CommitWriter.metadataJson(snap0.metadata.copy(
        schemaString = org.apache.spark.sql.types.StructType(fields).json))),
      operation = "SET METADATA")
    // update the BASE column: the generated value must follow
    graft.commands.DmlCommands.update(spark, path,
      col("id") === 1, Map("amount" -> lit(100)))
    val row = DeltaTable.forPath(spark, path).read
      .filter(col("id") === 1).select("amount", "double_amount")
      .collect().head
    assert(row.getInt(0) == 100 && row.getInt(1) == 200)
  }

  test("string-literal constraints survive the parser round-trip") {
    val path = tmpTable("cons_str")
    CommitWriter.createTable(spark, region, path)
    g.sql(s"ALTER TABLE '$path' ADD CONSTRAINT named " +
      "CHECK (r_name != 'FORBIDDEN' AND length(r_name) > 0)")
    val e = intercept[Exception] {
      CommitWriter.append(spark,
        region.limit(1).withColumn("r_name", lit("FORBIDDEN")), path)
    }
    assert(rootMessages(e).exists(_.contains("CHECK constraint named")))
    CommitWriter.append(spark, region.limit(1), path) // compliant passes
  }
}
