package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.CommitWriter

/** Write-side type widening (`ALTER TABLE ... ALTER COLUMN c TYPE t`):
  * metadata-only — old files keep their narrow physical type and the
  * scan up-casts on read; the typeWidening feature + per-field
  * typeChanges record the history. */
class TypeWideningSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_tw_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")

  test("int -> long widens metadata-only; old and new files both read") {
    val p = tmp("i2l")
    // o_custkey arrives as int from the fixture
    CommitWriter.createTable(spark,
      orders.limit(100).select(col("o_orderkey"),
        col("o_custkey").cast(IntegerType)), p)
    val filesBefore = DeltaTable.forPath(spark, p).allFiles
      .select("path").collect().map(_.getString(0)).toSet

    val g = new graft.GraftSession(spark)
    g.sql(s"ALTER TABLE '$p' ALTER COLUMN o_custkey TYPE BIGINT")

    val snap = DeltaTable.forPath(spark, p)
    assert(snap.schema("o_custkey").dataType == LongType)
    // metadata-only: not a single data file moved
    assert(snap.allFiles.select("path").collect()
      .map(_.getString(0)).toSet == filesBefore)
    // feature + change record
    assert(snap.protocol.writerFeatures.getOrElse(Nil)
      .contains("typeWidening"))
    assert(snap.protocol.readerFeatures.getOrElse(Nil)
      .contains("typeWidening"))
    val changes = snap.schema("o_custkey").metadata
      .getMetadataArray("delta.typeChanges")
    assert(changes.length == 1 &&
      changes(0).getString("fromType") == "integer" &&
      changes(0).getString("toType") == "long" &&
      changes(0).getLong("tableVersion") == snap.version)

    // a post-widening append may carry values beyond int range
    val big = spark.range(1).select(
      lit(9000000L).cast(snap.schema("o_orderkey").dataType)
        .as("o_orderkey"),
      lit(Int.MaxValue.toLong + 7L).as("o_custkey"))
    CommitWriter.append(spark, big, p)
    val out = DeltaTable.forPath(spark, p).read
    assert(out.count() == 101)
    assert(out.where(col("o_custkey") === Int.MaxValue.toLong + 7L)
      .count() == 1)
    // pre-widening rows still read exactly through the narrow files
    assert(out.where(col("o_orderkey") =!= 9000000L)
      .agg(sum(col("o_custkey"))).head.getLong(0) ==
      orders.limit(100).agg(sum(col("o_custkey").cast(LongType)))
        .head.getLong(0))
  }

  test("float -> double and a second widening appends to typeChanges") {
    val p = tmp("f2d")
    CommitWriter.createTable(spark,
      orders.limit(50).select(col("o_orderkey"),
        col("o_custkey").cast(ShortType).as("k"),
        col("o_totalprice").cast(FloatType).as("price")), p)
    val g = new graft.GraftSession(spark)
    g.sql(s"ALTER TABLE '$p' ALTER COLUMN price TYPE DOUBLE")
    g.sql(s"ALTER TABLE '$p' ALTER COLUMN k TYPE INT")
    g.sql(s"ALTER TABLE '$p' ALTER COLUMN k TYPE BIGINT")
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.schema("price").dataType == DoubleType)
    assert(snap.schema("k").dataType == LongType)
    val kChanges = snap.schema("k").metadata
      .getMetadataArray("delta.typeChanges")
    assert(kChanges.map(c =>
      (c.getString("fromType"), c.getString("toType"))).toSeq ==
      Seq(("short", "integer"), ("integer", "long")))
    // float values read back as their exact double image
    val f = orders.limit(50)
      .agg(sum(col("o_totalprice").cast(FloatType).cast(DoubleType)))
      .head.getDouble(0)
    assert(snap.read.agg(sum(col("price"))).head.getDouble(0) == f)
  }

  test("widened float stats compare through the exact float image") {
    val p = tmp("f2d_skip")
    // 0.1f's shortest JSON rendering is "0.1"; parsed as DOUBLE that is
    // 0.1000000000000000055 — BELOW the float's true double image
    // 0.1000000014901161, so naive post-widening skipping would prune
    // the file for an equality on the value actually stored in it
    CommitWriter.createTable(spark, spark.range(1)
      .select(lit(1L).as("id"), lit(0.1f).as("price")), p)
    val g = new graft.GraftSession(spark)
    g.sql(s"ALTER TABLE '$p' ALTER COLUMN price TYPE DOUBLE")
    val snap = DeltaTable.forPath(spark, p)
    val image = 0.1f.toDouble
    assert(graft.delta.scan.DeltaScan
      .prunedFiles(snap, Seq(col("price") === image)).count() == 1,
      "pre-widening file wrongly pruned for its own row's value")
    assert(snap.readWhere(col("price") === image).count() == 1)
    // post-widening files carry true double stats and stay exact
    CommitWriter.append(spark, spark.range(1)
      .select(lit(2L).as("id"), lit(0.3).as("price")), p)
    val snap2 = DeltaTable.forPath(spark, p)
    assert(snap2.readWhere(col("price") === 0.3).count() == 1)
    // and a predicate matching neither file's range still prunes both
    assert(graft.delta.scan.DeltaScan
      .prunedFiles(snap2, Seq(col("price") > 1.0)).count() == 0)
  }

  test("RESTORE re-added pre-widening file keeps its float-image bounds") {
    val p = tmp("f2d_restore")
    // v0: file A (0.1f) -- v1: file B (0.2f) -- v2: widen -- v3: remove
    // B -- v4: RESTORE to v2 re-adds B (float-rendered stats) at a
    // POST-widening commit version. Provenance-by-commit-version would
    // parse B's stats as double ("0.2" -> 0.2) and prune it for an
    // equality on the value B actually stores ((double)0.2f =
    // 0.20000000298...); the envelope keeps it.
    CommitWriter.createTable(spark, spark.range(1)
      .select(lit(1L).as("id"), lit(0.1f).as("price")), p)
    CommitWriter.append(spark, spark.range(1)
      .select(lit(2L).as("id"), lit(0.2f).as("price")), p)
    val g = new graft.GraftSession(spark)
    g.sql(s"ALTER TABLE '$p' ALTER COLUMN price TYPE DOUBLE")
    val bPath = DeltaTable.forPath(spark, p).allFiles
      .where(col("commit_version") === 1L)
      .select("path").collect().map(_.getString(0)).toSeq
    assert(bPath.size == 1)
    CommitWriter.commitRemoves(spark, p, bPath)
    g.sql(s"RESTORE '$p' TO VERSION AS OF 2")
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.version == 4L)
    val image = 0.2f.toDouble
    assert(graft.delta.scan.DeltaScan
      .prunedFiles(snap, Seq(col("price") === image)).count() == 1,
      "RESTORE-re-added pre-widening file wrongly pruned")
    assert(snap.readWhere(col("price") === image).count() == 1)
  }

  test("SHALLOW CLONE keeps post-widening double stats exact") {
    val src = tmp("f2d_clone_src")
    val dst = tmp("f2d_clone_dst")
    // src: v0 float file -- v1 widen -- v2 double file whose stats
    // ("0.3") only parse exactly as DOUBLE. The clone re-homes every
    // file at commit version 0 while copying the typeChanges metadata;
    // provenance-by-commit-version would parse the double file's stats
    // through FLOAT ((double)0.3f = 0.30000001192...) and prune it for
    // price = 0.3. The envelope keeps it, and the pre-widening file
    // still matches its float image.
    CommitWriter.createTable(spark, spark.range(1)
      .select(lit(1L).as("id"), lit(0.1f).as("price")), src)
    val g = new graft.GraftSession(spark)
    g.sql(s"ALTER TABLE '$src' ALTER COLUMN price TYPE DOUBLE")
    CommitWriter.append(spark, spark.range(1)
      .select(lit(2L).as("id"), lit(0.3).as("price")), src)
    g.sql(s"CREATE TABLE '$dst' SHALLOW CLONE '$src'")
    val snap = DeltaTable.forPath(spark, dst)
    assert(graft.delta.scan.DeltaScan
      .prunedFiles(snap, Seq(col("price") === 0.3)).count() == 1,
      "cloned post-widening file wrongly pruned")
    assert(snap.readWhere(col("price") === 0.3).count() == 1)
    assert(snap.readWhere(col("price") === 0.1f.toDouble).count() == 1)
    // a predicate outside every file's envelope still prunes
    assert(graft.delta.scan.DeltaScan
      .prunedFiles(snap, Seq(col("price") > 1.0)).count() == 0)
  }

  test("stable-spec typeChanges without tableVersion scans fine") {
    val p = tmp("f2d_stable")
    CommitWriter.createTable(spark, spark.range(1)
      .select(lit(1L).as("id"), lit(0.1f).as("price")), p)
    val g = new graft.GraftSession(spark)
    g.sql(s"ALTER TABLE '$p' ALTER COLUMN price TYPE DOUBLE")
    // rewrite the field's typeChanges to the STABLE spec shape —
    // fromType/toType only, no preview tableVersion — as a foreign
    // writer would record it
    val snap0 = DeltaTable.forPath(spark, p)
    val stable = StructType(snap0.schema.fields.map { f =>
      if (f.name != "price") f
      else f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putMetadataArray("delta.typeChanges", Array(
          new MetadataBuilder().putString("fromType", "float")
            .putString("toType", "double").build())).build())
    })
    CommitWriter.commitMetadata(spark, p,
      snap0.metadata.copy(schemaString = stable.json))
    val snap = DeltaTable.forPath(spark, p)
    // a filtered scan must neither throw nor wrongly prune
    val image = 0.1f.toDouble
    assert(graft.delta.scan.DeltaScan
      .prunedFiles(snap, Seq(col("price") === image)).count() == 1)
    assert(snap.readWhere(col("price") === image).count() == 1)
    assert(graft.delta.scan.DeltaScan
      .prunedFiles(snap, Seq(col("price") > 1.0)).count() == 0)
  }

  test("metadata derived from a stale snapshot refuses to commit") {
    // a metaData action replaces the schema wholesale: committing one
    // built from a stale snapshot would silently revert whatever
    // interleaved — the version pin must throw instead
    val p = tmp("stale_meta")
    CommitWriter.createTable(spark,
      orders.limit(5).select("o_orderkey", "o_totalprice"), p)
    val snap0 = DeltaTable.forPath(spark, p)
    CommitWriter.append(spark,
      orders.limit(1).select("o_orderkey", "o_totalprice"), p) // v1
    val e = intercept[CommitWriter.ConcurrentCommitException] {
      CommitWriter.commitMetadataAt(spark, p, _ => snap0.metadata,
        expectedCurrentVersion = Some(snap0.version))
    }
    assert(e.getMessage.contains("advanced"))
    // with the CURRENT version pinned it commits fine
    val v = CommitWriter.commitMetadataAt(spark, p, _ => snap0.metadata,
      expectedCurrentVersion = Some(1L))
    assert(v == 2L)
  }

  test("narrowing and cross-family changes are refused") {
    val p = tmp("refuse")
    CommitWriter.createTable(spark,
      orders.limit(10).select("o_orderkey", "o_totalprice"), p)
    val g = new graft.GraftSession(spark)
    val e1 = intercept[IllegalArgumentException] {
      g.sql(s"ALTER TABLE '$p' ALTER COLUMN o_totalprice TYPE FLOAT")
    }
    assert(e1.getMessage.contains("widening only"))
    intercept[IllegalArgumentException] {
      g.sql(s"ALTER TABLE '$p' ALTER COLUMN o_orderkey TYPE STRING")
    }
    intercept[IllegalArgumentException] {
      g.sql(s"ALTER TABLE '$p' ALTER COLUMN nope TYPE BIGINT")
    }
  }
}
