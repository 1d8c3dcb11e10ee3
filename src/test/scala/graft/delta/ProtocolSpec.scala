package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log._
import graft.delta.log.Actions.Protocol

/** Fail-closed protocol feature gates (ProtocolSupport): a table
  * declaring features this engine doesn't implement must refuse the
  * operation with a clear message, never proceed and silently corrupt
  * results — and supported/absent features must NOT trip the gate. */
class ProtocolSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpTable(name: String): String = {
    val d = Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val region = spark.read.parquet(s"$sf/region.parquet")

  private def upgradeProtocol(path: String, proto: Protocol): Unit = {
    val v = LogSegment.forTable(spark,
      new org.apache.hadoop.fs.Path(path)).version + 1
    CommitWriter.commit(spark, path, v,
      Seq(CommitWriter.protocolJson(proto)), operation = "UPGRADE PROTOCOL")
  }

  private def setMetadata(path: String,
      mutate: Actions.Metadata => Actions.Metadata): Unit = {
    val snap = DeltaTable.forPath(spark, path)
    CommitWriter.commit(spark, path, snap.version + 1,
      Seq(CommitWriter.metadataJson(mutate(snap.metadata))),
      operation = "SET METADATA")
  }

  test("reads refuse unknown reader features") {
    val path = tmpTable("proto_read")
    CommitWriter.createTable(spark, region, path)
    upgradeProtocol(path, Protocol(3, 7,
      Some(Seq("deletionVectors", "futureColumnarFormat")),
      Some(Seq("deletionVectors", "futureColumnarFormat"))))
    val e = intercept[IllegalArgumentException] {
      DeltaTable.forPath(spark, path)
    }
    assert(e.getMessage.contains("futureColumnarFormat"))
    assert(!e.getMessage.contains("deletionVectors"),
      "supported feature wrongly reported as unknown")
  }

  test("reads accept fully-supported reader features") {
    val path = tmpTable("proto_read_ok")
    CommitWriter.createTable(spark, region, path)
    upgradeProtocol(path, Protocol(3, 7,
      Some(Seq("deletionVectors", "columnMapping", "timestampNtz")),
      Some(Seq("deletionVectors", "columnMapping", "timestampNtz"))))
    assert(DeltaTable.forPath(spark, path).read.count() == region.count())
  }

  test("writes refuse unknown writer features (icebergCompatV2)") {
    val path = tmpTable("proto_write")
    CommitWriter.createTable(spark, region, path)
    // reader side stays legacy-readable; only the WRITER features are
    // beyond this engine
    upgradeProtocol(path, Protocol(1, 7, None,
      Some(Seq("appendOnly", "icebergCompatV2"))))
    assert(DeltaTable.forPath(spark, path).read.count() == region.count(),
      "reads must still work when only writer features are unknown")
    val e = intercept[IllegalArgumentException] {
      CommitWriter.append(spark, region.limit(1), path)
    }
    assert(e.getMessage.contains("icebergCompatV2"))
    // the whole write surface shares the gate
    intercept[IllegalArgumentException] {
      graft.commands.DmlCommands.delete(spark, path, col("r_regionkey") === 0)
    }
    intercept[IllegalArgumentException] {
      graft.commands.OptimizeCommand.optimize(spark, path)
    }
    intercept[IllegalArgumentException] {
      CommitWriter.checkpoint(spark, path)
    }
  }

  test("CHECK constraints are enforced at write time") {
    val path = tmpTable("proto_constraints")
    CommitWriter.createTable(spark, region, path)
    setMetadata(path, m => m.copy(configuration =
      m.configuration + ("delta.constraints.positive" -> "r_regionkey >= 0")))
    // compliant rows commit
    val before = DeltaTable.forPath(spark, path).read.count()
    CommitWriter.append(spark, region.limit(1), path)
    assert(DeltaTable.forPath(spark, path).read.count() == before + 1)
    // a violating row aborts the write job, named, before any commit
    val vBefore = DeltaTable.forPath(spark, path).version
    val bad = region.limit(1)
      .withColumn("r_regionkey", lit(-5).cast("int"))
    val e = intercept[Exception] {
      CommitWriter.append(spark, bad, path)
    }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(messages(e).exists(m =>
      m.contains("CHECK constraint positive")), messages(e).mkString("|"))
    assert(DeltaTable.forPath(spark, path).version == vBefore,
      "failed write must not have committed")
  }

  test("generated columns: computed when absent, validated when provided") {
    val path = tmpTable("proto_generated")
    CommitWriter.createTable(spark, region, path)
    setMetadata(path, m => {
      val fields = m.dataSchema.fields.map { f =>
        if (f.name == "r_name")
          f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putString("delta.generationExpression",
              "concat('region-', r_regionkey)").build())
        else f
      }
      m.copy(schemaString = StructType(fields).json)
    })
    // absent -> computed inline
    CommitWriter.append(spark,
      region.limit(1).select((col("r_regionkey") + 50).as("r_regionkey")),
      path)
    val got = DeltaTable.forPath(spark, path).read
      .filter(col("r_regionkey") >= 50).select("r_name")
      .collect().map(_.getString(0))
    assert(got.length == 1 && got.head.startsWith("region-5"))
    // provided-and-consistent -> passes
    CommitWriter.append(spark,
      region.limit(1).select((col("r_regionkey") + 60).as("r_regionkey"),
        concat(lit("region-"), col("r_regionkey") + 60).as("r_name")), path)
    // provided-but-wrong -> the write aborts before committing
    val vBefore = DeltaTable.forPath(spark, path).version
    val e = intercept[Exception] {
      CommitWriter.append(spark,
        region.limit(1).select((col("r_regionkey") + 70).as("r_regionkey"),
          lit("lies").as("r_name")), path)
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("generated column r_name")),
      msgs.mkString("|"))
    assert(DeltaTable.forPath(spark, path).version == vBefore)
  }

  test("writes refuse identity columns") {
    val path = tmpTable("proto_identity")
    CommitWriter.createTable(spark, region, path)
    setMetadata(path, m => {
      val fields = m.dataSchema.fields.map { f =>
        if (f.name == "r_regionkey")
          f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putLong("delta.identity.start", 1L).build())
        else f
      }
      m.copy(schemaString = StructType(fields).json)
    })
    val e = intercept[IllegalArgumentException] {
      CommitWriter.append(spark, region.limit(1), path)
    }
    assert(e.getMessage.contains("r_regionkey"))
  }

  test("metadata-only commits share the writer gate") {
    // ALTER/SET TBLPROPERTIES route through commitMetadata — committing
    // metadata to a table whose writer features this engine doesn't
    // maintain is still a non-compliant commit
    val path = tmpTable("proto_meta_commit")
    CommitWriter.createTable(spark, region, path)
    upgradeProtocol(path, Protocol(1, 7, None,
      Some(Seq("appendOnly", "icebergCompatV2"))))
    val e = intercept[IllegalArgumentException] {
      new graft.GraftSession(spark).sql(
        s"ALTER TABLE '$path' SET TBLPROPERTIES ('team' = 'ml')")
    }
    assert(e.getMessage.contains("icebergCompatV2"))
  }

  test("invariants on NESTED fields are enforced") {
    val path = tmpTable("proto_nested_inv")
    val df = region.select(col("r_regionkey"),
      struct(col("r_name").as("name")).as("info"))
    CommitWriter.createTable(spark, df, path)
    setMetadata(path, m => {
      val fields = m.dataSchema.fields.map {
        case f if f.name == "info" =>
          val st = f.dataType.asInstanceOf[StructType]
          f.copy(dataType = StructType(st.fields.map(inner =>
            inner.copy(metadata = new MetadataBuilder()
              .withMetadata(inner.metadata)
              .putString("delta.invariants",
                """{"expression":{"expression":"info.name IS NOT NULL"}}""")
              .build()))))
        case f => f
      }
      m.copy(schemaString = StructType(fields).json)
    })
    // rows honoring the nested invariant commit
    CommitWriter.append(spark, df.limit(1), path)
    // a null in the invariant-guarded nested field aborts the write
    val bad = df.limit(1).withColumn("info",
      struct(lit(null).cast("string").as("name")))
    val e = intercept[Exception] {
      CommitWriter.append(spark, bad, path)
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("invariant(info.name)")),
      msgs.mkString("|"))
  }

  test("CDF-enabled DML writes cdc actions; cdc-less rewrites refused") {
    // DELETE/UPDATE/MERGE produce authoritative write-time cdc files
    // under _change_data, so they pass the CDF gate; entry points that
    // rewrite rows WITHOUT cdc actions (overwrite) must still refuse —
    // a compliant CDF reader would serve wrong change data otherwise.
    val path = tmpTable("proto_cdf")
    CommitWriter.createTable(spark, region, path,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    // allowed: inserts derive from add actions, no cdc needed
    CommitWriter.append(spark, region.filter(col("r_regionkey") === 0), path)
    graft.commands.DmlCommands.delete(spark, path, col("r_regionkey") === 0)
    val seg = LogSegment.forTable(spark,
      new org.apache.hadoop.fs.Path(path))
    val commit = spark.read.text(
      s"$path/_delta_log/%020d.json".format(seg.version))
    val cdcLines = commit.collect().map(_.getString(0))
      .filter(_.contains("\"cdc\""))
    assert(cdcLines.nonEmpty, "DELETE commit carries no cdc actions")
    assert(cdcLines.forall(_.contains("\"dataChange\":false")))
    // the cdc files label every deleted row 'delete'
    val cdcPaths = cdcLines.map { l =>
      val n = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(l).get("cdc")
      s"$path/${n.get("path").asText}"
    }
    val changes = spark.read.parquet(cdcPaths: _*)
    assert(changes.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("delete"))
    assert(changes.filter(col("r_regionkey") === 0).count() == 2,
      "both physical copies of r_regionkey=0 must appear in the feed")
    // overwrite still refused: no entry-point cdc support
    val e = intercept[IllegalArgumentException] {
      CommitWriter.overwrite(spark, region, path)
    }
    assert(e.getMessage.contains("enableChangeDataFeed"))
  }

  test("time travel to a version before an unsupported upgrade still reads") {
    val path = tmpTable("proto_timetravel")
    CommitWriter.createTable(spark, region, path) // v0: plain
    upgradeProtocol(path, Protocol(3, 7, // v1: beyond this engine
      Some(Seq("futureColumnarFormat")), Some(Seq("futureColumnarFormat"))))
    intercept[IllegalArgumentException] { DeltaTable.forPath(spark, path) }
    // the gate binds to the protocol AS OF the resolved version, so
    // history from before the upgrade stays readable
    val v0 = DeltaTable.forPath(spark, path, versionAsOf = Some(0L))
    assert(v0.read.count() == region.count())
  }

  test("legacy writer versions without feature use pass the gate") {
    val path = tmpTable("proto_legacy")
    CommitWriter.createTable(spark, region, path)
    // minWriterVersion 4 IMPLIES generated-column support, but this
    // table defines none — a blind version gate would wrongly refuse
    upgradeProtocol(path, Protocol(1, 4))
    CommitWriter.append(spark, region.limit(1), path)
    assert(DeltaTable.forPath(spark, path).read.count() == region.count() + 1)
  }
}
