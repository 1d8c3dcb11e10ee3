package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.{Actions, CommitWriter, IdentityColumns}

/** Identity-column allocation (writer feature `identityColumns`,
  * GENERATED ALWAYS): engine-allocated values on append via the
  * one-pass sparse scheme, high-water mark advanced from add-file
  * stats in the same commit, explicit values refused. The spec demands
  * uniqueness, >= start, and congruence to start modulo step — NOT
  * consecutiveness — which is what makes shuffle-free allocation
  * possible.
  */
class IdentitySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpTable(name: String): String = {
    val d = Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  /** Empty table (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH
    * `start` INCREMENT BY `step`), payload STRING). */
  private def identityTable(name: String, start: Long, step: Long): String = {
    val path = tmpTable(name)
    val schema = Seq.empty[(Long, String)].toDF("id", "payload")
    CommitWriter.createTable(spark, schema, path)
    val snap = DeltaTable.forPath(spark, path)
    val fields = snap.metadata.dataSchema.fields.map { f =>
      if (f.name == "id")
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putLong("delta.identity.start", start)
          .putLong("delta.identity.step", step).build())
      else f
    }
    CommitWriter.commit(spark, path, snap.version + 1,
      Seq(CommitWriter.metadataJson(snap.metadata.copy(
        schemaString = StructType(fields).json))),
      operation = "SET METADATA")
    path
  }

  test("values allocated on append: unique, >= start, congruent to step") {
    val path = identityTable("id_alloc", 100L, 10L)
    CommitWriter.append(spark,
      Seq("a", "b", "c", "d").toDF("payload").repartition(3), path)
    val ids1 = DeltaTable.forPath(spark, path).read
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ids1.length == 4 && ids1.distinct.length == 4)
    assert(ids1.forall(v => v >= 100L && (v - 100L) % 10L == 0L), ids1)
    // the high-water mark rode the same commit and equals max assigned
    val hwm1 = IdentityColumns.of(
      DeltaTable.forPath(spark, path).metadata).head.highWaterMark
    assert(hwm1.contains(ids1.max))
    // a second append allocates strictly above the mark, still unique
    CommitWriter.append(spark, Seq("e", "f").toDF("payload"), path)
    val ids2 = DeltaTable.forPath(spark, path).read
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ids2.length == 6 && ids2.distinct.length == 6)
    assert(ids2.filterNot(ids1.contains).forall(_ > ids1.max))
    assert(IdentityColumns.of(DeltaTable.forPath(spark, path).metadata)
      .head.highWaterMark.contains(ids2.max))
  }

  test("descending step: values <= start, watermark tracks the minimum") {
    val path = identityTable("id_desc", 0L, -5L)
    CommitWriter.append(spark, Seq("a", "b", "c").toDF("payload"), path)
    val ids1 = DeltaTable.forPath(spark, path).read
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ids1.length == 3 && ids1.distinct.length == 3)
    assert(ids1.forall(v => v <= 0L && (0L - v) % 5L == 0L), ids1)
    assert(IdentityColumns.of(DeltaTable.forPath(spark, path).metadata)
      .head.highWaterMark.contains(ids1.min))
    CommitWriter.append(spark, Seq("d").toDF("payload"), path)
    val ids2 = DeltaTable.forPath(spark, path).read
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ids2.length == 4 && ids2.distinct.length == 4)
    assert(ids2.filterNot(ids1.contains).forall(_ < ids1.min))
  }

  test("explicit identity values are refused (GENERATED ALWAYS)") {
    val path = identityTable("id_explicit", 1L, 1L)
    val e = intercept[IllegalArgumentException] {
      CommitWriter.append(spark,
        Seq((5L, "x")).toDF("id", "payload"), path)
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))
  }

  test("UPDATE preserves identity values and refuses to set them") {
    val path = identityTable("id_update", 1L, 1L)
    CommitWriter.append(spark, Seq("a", "b").toDF("payload"), path)
    val before = DeltaTable.forPath(spark, path).read
      .filter(col("payload") === "a").select("id")
      .collect().head.getLong(0)
    graft.commands.DmlCommands.update(spark, path,
      col("payload") === "a", Map("payload" -> lit("A")))
    val after = DeltaTable.forPath(spark, path).read
      .filter(col("payload") === "A").select("id")
      .collect().head.getLong(0)
    assert(after == before, "rewrite must not re-allocate identity values")
    val e = intercept[IllegalArgumentException] {
      graft.commands.DmlCommands.update(spark, path,
        col("payload") === "A", Map("id" -> lit(999L)))
    }
    assert(e.getMessage.contains("identity"))
  }

  test("MERGE into identity tables is refused") {
    val path = identityTable("id_merge", 1L, 1L)
    CommitWriter.append(spark, Seq("a").toDF("payload"), path)
    val e = intercept[IllegalArgumentException] {
      graft.commands.MergeCommand.upsert(spark, path,
        Seq((1L, "x")).toDF("id", "payload"), Seq("id"))
    }
    assert(e.getMessage.contains("identity"))
  }

  test("nested identity metadata is refused as corrupt") {
    val path = tmpTable("id_nested")
    val df = Seq((1L, ("x", 2L))).toDF("k", "nest")
    CommitWriter.createTable(spark, df, path)
    val snap = DeltaTable.forPath(spark, path)
    val fields = snap.metadata.dataSchema.fields.map { f =>
      if (f.name == "nest") {
        val st = f.dataType.asInstanceOf[StructType]
        f.copy(dataType = StructType(st.fields.map(inner =>
          if (inner.name == "_2")
            inner.copy(metadata = new MetadataBuilder()
              .withMetadata(inner.metadata)
              .putLong("delta.identity.start", 1L).build())
          else inner)))
      } else f
    }
    CommitWriter.commit(spark, path, snap.version + 1,
      Seq(CommitWriter.metadataJson(snap.metadata.copy(
        schemaString = StructType(fields).json))),
      operation = "SET METADATA")
    val e = intercept[IllegalArgumentException] {
      CommitWriter.append(spark, df, path)
    }
    assert(e.getMessage.contains("NESTED"))
  }

  test("identity composes with the exactly-once txn append path") {
    val path = identityTable("id_txn", 0L, 1L)
    CommitWriter.appendIfAbsent(spark, Seq("a", "b").toDF("payload"),
      path, "app", 1L)
    // replay of the same txn version is a no-op: no double allocation
    CommitWriter.appendIfAbsent(spark, Seq("a", "b").toDF("payload"),
      path, "app", 1L)
    val ids = DeltaTable.forPath(spark, path).read
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ids.length == 2 && ids.distinct.length == 2)
  }
}
