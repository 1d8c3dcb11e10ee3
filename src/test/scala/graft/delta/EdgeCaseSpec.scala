package graft.delta

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.{CommitWriter, LogSegment}

class EdgeCaseSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_edge_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val region = spark.read.parquet(s"$sf/region.parquet")

  test("empty table: create from empty df, read, append later") {
    val p = tmp("empty")
    CommitWriter.createTable(spark, region.limit(0), p)
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.version == 0)
    assert(snap.read.count() == 0)
    assert(snap.read.schema.fieldNames.toSeq == region.schema.fieldNames.toSeq)
    // filtered read of an empty table also works
    assert(snap.readWhere(col("r_regionkey") > 1).count() == 0)
    CommitWriter.append(spark, region, p)
    assert(DeltaTable.forPath(spark, p).read.count() == region.count())
  }

  test("null partition values round-trip as __HIVE_DEFAULT_PARTITION__") {
    val p = tmp("nullpart")
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(1L, "a", "g1"))
    rows.add(Row(2L, "b", null))
    rows.add(Row(3L, "c", "g1"))
    val df = spark.createDataFrame(rows, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("grp", StringType))))
    CommitWriter.createTable(spark, df, p, partitionColumns = Seq("grp"))
    val snap = DeltaTable.forPath(spark, p)
    val got = snap.read.orderBy("id").collect()
    assert(got.length == 3)
    assert(got(1).isNullAt(2), s"expected null grp, got ${got(1)}")
    // pruning on null partition value
    assert(snap.readWhere(col("grp").isNull).count() == 1)
    assert(snap.readWhere(col("grp") === "g1").count() == 2)
    val pruned = graft.delta.scan.DeltaScan.prunedFiles(snap,
      Seq(col("grp").isNull)).count()
    assert(pruned == 1)
  }

  test("special characters in partition values survive the round trip") {
    val p = tmp("specialpart")
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(1L, "x y/z=1"))
    rows.add(Row(2L, "plain"))
    val df = spark.createDataFrame(rows, StructType(Seq(
      StructField("id", LongType), StructField("k", StringType))))
    CommitWriter.createTable(spark, df, p, partitionColumns = Seq("k"))
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.read.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("x y/z=1", "plain"))
    assert(snap.readWhere(col("k") === "x y/z=1").count() == 1)
  }

  test("unicode and quote-laden strings keep exact stats + data") {
    val p = tmp("unicode")
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(1L, "héllo \"wörld\" → ∞"))
    rows.add(Row(2L, "tab\tand\nnewline"))
    rows.add(Row(3L, null))
    val df = spark.createDataFrame(rows, StructType(Seq(
      StructField("id", LongType), StructField("s", StringType))))
    CommitWriter.createTable(spark, df.repartition(1), p)
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.read.orderBy("id").collect().map(r =>
      Option(r.getString(1))).toSeq ==
      Seq(Some("héllo \"wörld\" → ∞"), Some("tab\tand\nnewline"), None))
    // stats JSON parsed back: nullCount counted the null
    val statsJson = snap.allFiles.select("stats").collect().head.getString(0)
    assert(statsJson.contains("\"numRecords\":3"))
    // skipping on the string column still behaves (conservative keep)
    assert(snap.readWhere(col("s") === "absent").count() == 0)
    assert(snap.readWhere(col("s").isNull).count() == 1)
  }

  test("concurrent append retries to the next version") {
    val p = tmp("retry")
    CommitWriter.createTable(spark, region.limit(2), p)
    // simulate a racing writer that stole version 1
    CommitWriter.commit(spark, p, 1L, Seq.empty, "WRITE")
    val v = CommitWriter.append(spark, region.limit(1), p)
    assert(v == 2, s"append should have retried to v2, got v$v")
    assert(DeltaTable.forPath(spark, p).read.count() == 3)
  }

  test("concurrent appendIfAbsent retries, re-checking idempotence") {
    val p = tmp("txnretry")
    CommitWriter.createTable(spark, region.limit(2), p)
    // a racing writer steals version 1 with an unrelated commit: the
    // idempotent append must retry to v2, not fail the stream batch
    CommitWriter.commit(spark, p, 1L, Seq.empty, "WRITE")
    val v = CommitWriter.appendIfAbsent(spark, region.limit(1), p,
      appId = "sink-1", txnVersion = 3L)
    assert(v.contains(2L), s"expected retry to v2, got $v")
    assert(DeltaTable.forPath(spark, p).read.count() == 3)

    // a racing writer steals the version WITH the same (appId, txn) —
    // i.e. a replayed speculative task: the retry must become a no-op
    val txn = CommitWriter.txnJson(
      graft.delta.log.Actions.SetTransaction("sink-1", 9L, None))
    CommitWriter.commit(spark, p, 3L, Seq(txn), "WRITE")
    val replay = CommitWriter.appendIfAbsent(spark, region.limit(2), p,
      appId = "sink-1", txnVersion = 9L)
    // the pre-check sees the racer's txn (it committed before us here);
    // either way no duplicate rows may land
    assert(replay.isEmpty)
    assert(DeltaTable.forPath(spark, p).read.count() == 3)
  }

  test("column-mapped table: create, append, zero-rewrite rename") {
    val p = tmp("mapped")
    CommitWriter.createTableMapped(spark, region, p)
    val snap0 = DeltaTable.forPath(spark, p)
    assert(snap0.schema.fieldNames.toSeq == Seq("r_regionkey", "r_name"))
    assert(snap0.read.orderBy("r_regionkey").collect().toSeq ==
      region.orderBy("r_regionkey").collect().toSeq)
    // physical files carry col-N names, never logical ones
    val physSchema = spark.read.parquet(
      snap0.allFiles.select("path").collect()
        .map(r => s"$p/${r.getString(0)}"): _*).schema
    assert(physSchema.fieldNames.toSeq == Seq("col-1", "col-2"))

    // appends rename through the mapping automatically
    CommitWriter.append(spark, region.limit(2), p)
    assert(DeltaTable.forPath(spark, p).read.count() == region.count() + 2)

    // THE point of mapping: rename = one metadata commit, no data rewrite
    val snap1 = DeltaTable.forPath(spark, p)
    val renamed = StructType(snap1.schema.fields.map(f =>
      if (f.name == "r_name") f.copy(name = "region_name") else f))
    CommitWriter.commitMetadata(spark, p,
      snap1.metadata.copy(schemaString = renamed.json))
    val snap2 = DeltaTable.forPath(spark, p)
    assert(snap2.schema.fieldNames.contains("region_name"))
    assert(snap2.read.select("region_name").distinct().count() ==
      region.select("r_name").distinct().count())
    // same files — nothing was rewritten
    assert(snap2.allFiles.count() == snap1.allFiles.count())

    // DML on mapped tables works via the physical-name write funnel
    // (refusal lifted in round 9); the RENAMED logical name reads back
    graft.commands.DmlCommands.delete(spark, p, col("r_regionkey") === 0)
    val snap3 = DeltaTable.forPath(spark, p)
    assert(snap3.read.where(col("r_regionkey") === 0).count() == 0)
    assert(snap3.read.select("region_name").distinct().count() ==
      region.where(col("r_regionkey") =!= 0)
        .select("r_name").distinct().count())
  }

  test("ALTER TABLE RENAME COLUMN: SQL on mapped tables, refused on plain") {
    val p = tmp("rename_sql")
    CommitWriter.createTableMapped(spark, region, p)
    val g = graft.GraftSession(spark)
    val out = g.sql(s"ALTER TABLE '$p' RENAME COLUMN r_name TO region_name")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("renamed") == "r_name -> region_name")
    assert(DeltaTable.forPath(spark, p).schema.fieldNames
      .contains("region_name"))
    // a plain (unmapped) table must refuse: its parquet carries logical
    // names, so a metadata rename would orphan the column's data
    val plain = tmp("rename_plain")
    CommitWriter.createTable(spark, region, plain)
    intercept[IllegalArgumentException] {
      g.sql(s"ALTER TABLE '$plain' RENAME COLUMN r_name TO nope")
    }
  }

  test("ALTER TABLE ADD/DROP COLUMN: evolution DDL end to end") {
    val g = graft.GraftSession(spark)
    // ADD on a plain table: old rows impute null, appends carry it
    val p = tmp("addcol")
    CommitWriter.createTable(spark, region, p)
    g.sql(s"ALTER TABLE '$p' ADD COLUMN score double")
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.schema.fieldNames.contains("score"))
    assert(snap.read.where(col("score").isNull).count() == region.count())
    CommitWriter.append(spark,
      region.limit(1).withColumn("score", lit(1.5)), p)
    assert(DeltaTable.forPath(spark, p).read
      .where(col("score") === 1.5).count() == 1)

    // DROP on a mapped table: metadata-only, data invisible afterwards
    val m = tmp("dropcol")
    CommitWriter.createTableMapped(spark, region, m)
    g.sql(s"ALTER TABLE '$m' DROP COLUMN r_name")
    val dropped = DeltaTable.forPath(spark, m)
    assert(dropped.schema.fieldNames.toSeq == Seq("r_regionkey"))
    assert(dropped.read.count() == region.count())
    // DROP on a plain table is refused (would need a rewrite)
    intercept[IllegalArgumentException] {
      g.sql(s"ALTER TABLE '$p' DROP COLUMN r_name")
    }

    // DROP then ADD must NOT reuse the dropped column's physical name:
    // old parquet still holds r_name's strings under col-2, and reusing
    // the id would resurrect them under the new column
    g.sql(s"ALTER TABLE '$m' ADD COLUMN score double")
    val readded = DeltaTable.forPath(spark, m)
    val scoreField = readded.schema("score")
    assert(scoreField.metadata.getString(
      "delta.columnMapping.physicalName") == "col-3")
    // and the new column reads as null, not as resurrected strings
    assert(readded.read.where(col("score").isNotNull).count() == 0)
  }

  test("long-string stats truncate min, omit max; skipping stays correct") {
    import org.apache.spark.sql.functions.{get_json_object, length => slen}
    val p = tmp("longstats")
    val longA = "a" * 100 + "SUFFIX_A"
    val longZ = "z" * 100 + "SUFFIX_Z"
    val docs = spark.createDataFrame(Seq(
      (1L, longA), (2L, longZ), (3L, "short"))).toDF("id", "body")
    CommitWriter.createTable(spark, docs.repartition(1), p)
    val snap = DeltaTable.forPath(spark, p)
    val stats = snap.allFiles.select(
      get_json_object(col("stats"), "$.minValues.body").as("mn"),
      get_json_object(col("stats"), "$.maxValues.body").as("mx")).head()
    assert(stats.getAs[String]("mn") == "a" * 32) // truncated prefix
    assert(stats.getAs[String]("mx") == null) // oversized max omitted
    // skipping stays CONSERVATIVE: the full long value is still found
    // (absent max keeps the file), and the file prunes nothing wrongly
    assert(snap.readWhere(col("body") === longZ).count() == 1)
    assert(snap.readWhere(col("body") === longA).count() == 1)
    assert(snap.readWhere(col("body") === "short").count() == 1)
    // short-string stats stay exact elsewhere: a below-min probe prunes
    assert(snap.readWhere(col("body") < "a").count() == 0)
  }

  test("a crashed writer's stale commit temp is inert and swept") {
    val p = tmp("staletmp")
    CommitWriter.createTable(spark, region.limit(3), p)
    // simulate a writer that died between its temp write and the link
    val logDir = new java.io.File(p, "_delta_log")
    val stale = new java.io.File(logDir,
      ".00000000000000000001.json.deadbeef.tmp")
    java.nio.file.Files.writeString(stale.toPath, "{\"garbage\": true}\n")
    stale.setLastModified(System.currentTimeMillis() - 2 * 3600 * 1000)
    // reads ignore it entirely (not a commit-pattern name)
    assert(DeltaTable.forPath(spark, p).read.count() == 3)
    CommitWriter.append(spark, region.limit(1), p)
    assert(DeltaTable.forPath(spark, p).version == 1)
    // checkpoint maintenance sweeps it
    CommitWriter.checkpoint(spark, p)
    assert(!stale.exists())
    assert(DeltaTable.forPath(spark, p).read.count() == 4)
  }

  test("8 threads of concurrent appends all land exactly once") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val p = tmp("stress")
    CommitWriter.createTable(spark,
      region.limit(1).withColumn("w", lit(-1)), p)
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // 8 writers race 2 appends each through the same commit sequence
      val futures = (0 until 8).map { w =>
        Future {
          (0 until 2).map { i =>
            CommitWriter.append(spark,
              region.limit(1).withColumn("w", lit(w * 10 + i)), p,
              maxRetries = 64)
          }
        }
      }
      val versions = Await.result(Future.sequence(futures), 120.seconds)
        .flatten
      // every append landed at a unique version, none was lost
      assert(versions.distinct.length == 16, s"versions: $versions")
      val snap = DeltaTable.forPath(spark, p)
      assert(snap.version == 16)
      assert(snap.read.count() == 17) // 1 initial + 16 appended rows
    } finally pool.shutdown()
  }

  test("vacuum on a partitioned table protects live subdir files") {
    val p = tmp("vacpart")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    orders.write.format("graftdelta")
      .option("partitionBy", "o_orderstatus").save(p)
    val before = DeltaTable.forPath(spark, p)
    // overwrite makes every original file unreferenced garbage
    orders.limit(50).write.format("graftdelta").mode("overwrite").save(p)
    val liveCount = DeltaTable.forPath(spark, p).read.count()
    val metrics = graft.GraftSession(spark)
      .sql(s"VACUUM '$p' RETAIN 0 HOURS").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(metrics("files_deleted").toInt == before.allFiles.count())
    assert(DeltaTable.forPath(spark, p).read.count() == liveCount)
    // time travel to pre-overwrite is now gone (files vacuumed) — the
    // log still resolves but the data files are deleted
    val fs = LogSegment.fs(spark, new Path(p))
    assert(fs.exists(new Path(p, "_delta_log")))
  }

  test("appendIfAbsent is exactly-once per (appId, txnVersion)") {
    val p = tmp("txn")
    CommitWriter.createTable(spark, region.limit(1), p)
    val v1 = CommitWriter.appendIfAbsent(spark, region.limit(2), p,
      appId = "writer-1", txnVersion = 7L)
    assert(v1.contains(1L))
    // same txn replayed -> no-op
    assert(CommitWriter.appendIfAbsent(spark, region.limit(2), p,
      "writer-1", 7L).isEmpty)
    // older txn also refused
    assert(CommitWriter.appendIfAbsent(spark, region.limit(2), p,
      "writer-1", 5L).isEmpty)
    // newer txn and other writers proceed
    assert(CommitWriter.appendIfAbsent(spark, region.limit(1), p,
      "writer-1", 8L).contains(2L))
    assert(CommitWriter.appendIfAbsent(spark, region.limit(1), p,
      "writer-2", 1L).contains(3L))
    assert(CommitWriter.latestTxnVersion(spark, p, "writer-1").contains(8L))
    assert(DeltaTable.forPath(spark, p).read.count() == 1 + 2 + 1 + 1)
  }

  test("txn version follows log order, not max (restarted-writer case)") {
    val p = tmp("txn_logorder")
    CommitWriter.createTable(spark, region.limit(1), p)
    assert(CommitWriter.appendIfAbsent(spark, region.limit(1), p,
      "writer-1", 8L).contains(1L))
    // an external/restarted writer records a LOWER txn version in a later
    // commit (fresh sink checkpoint); per the protocol the latest action
    // in log order wins
    CommitWriter.commit(spark, p, 2L,
      Seq(CommitWriter.txnJson(graft.delta.log.Actions.SetTransaction(
        "writer-1", 3L, Some(System.currentTimeMillis())))),
      operation = "TXN")
    assert(CommitWriter.latestTxnVersion(spark, p, "writer-1").contains(3L))
    // the checkpoint freezes the log-order winner, not max(txn.version)
    CommitWriter.checkpoint(spark, p)
    assert(CommitWriter.latestTxnVersion(spark, p, "writer-1").contains(3L))
    // so the writer's next batches (4..8) are NOT silently dropped
    assert(CommitWriter.appendIfAbsent(spark, region.limit(1), p,
      "writer-1", 4L).isDefined)
  }

  test("auto-checkpoints land mid-race without losing or blocking commits") {
    import java.util.concurrent.{Callable, CyclicBarrier, Executors}
    val p = tmp("autocp_race")
    CommitWriter.createTable(spark, region.limit(1), p,
      configuration =
        Map(CommitWriter.CheckpointIntervalPropKey -> "3"))
    // 8 racing writers x 2 appends = 16 commits; several cross the
    // 3-commit cadence, so auto-checkpoints fire from whichever writer
    // happens to land those versions, concurrently with the others
    val pool = Executors.newFixedThreadPool(8)
    val barrier = new CyclicBarrier(8)
    try {
      val fs = (1 to 8).map { _ =>
        pool.submit(new Callable[Unit] {
          def call(): Unit = {
            barrier.await()
            CommitWriter.append(spark, region.limit(1), p, maxRetries = 64)
            CommitWriter.append(spark, region.limit(1), p, maxRetries = 64)
          }
        })
      }
      fs.foreach(_.get())
    } finally pool.shutdown()
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.version == 16, s"lost/doubled commits: v${snap.version}")
    assert(snap.read.count() == 17)
    // at least one cadence checkpoint exists and replay goes through
    // it. The checkpoint VERSION need not be a multiple of 3: the
    // triggered checkpoint targets the current tip, which other racing
    // writers may have advanced past the triggering commit.
    val cp = snap.segment.checkpointVersion
    assert(cp.exists(_ >= 3), s"no auto-checkpoint found (got $cp)")
    // retention (30 d) keeps every commit JSON: time travel intact
    assert(DeltaTable.forPath(spark, p, Some(5L)).read.count() == 6)
  }
}
