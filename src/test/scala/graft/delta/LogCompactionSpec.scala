package graft.delta

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.{CommitWriter, LogCompaction, LogSegment, Replay}

/** Minor log compactions (<x>.<y>.compacted.json): written every
  * `graft.logCompaction.interval` commits, substituted into the replay
  * tail on read, redundant to (and never replacing) the raw commits. */
class LogCompactionSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_logcompact_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val nation = spark.read.parquet(s"$sf/nation.parquet")
    .select("n_nationkey", "n_regionkey", "n_name")

  private def logFiles(p: String): Set[String] =
    Option(new java.io.File(p, "_delta_log").listFiles())
      .getOrElse(Array.empty).filter(_.isFile).map(_.getName).toSet

  /** interval=3, checkpoints effectively off. */
  private def conf = Map(
    LogCompaction.IntervalPropKey -> "3",
    CommitWriter.CheckpointIntervalPropKey -> "1000")

  test("auto-compaction writes span files the read path substitutes") {
    val p = tmp("auto")
    CommitWriter.createTable(spark,
      nation.where(col("n_regionkey") === 0), p, configuration = conf)
    for (r <- 1 to 4)
      CommitWriter.append(spark,
        nation.where(col("n_regionkey") === r), p)
    graft.commands.DmlCommands.delete(spark, p,
      col("n_nationkey") % 7 === 0) // v5
    CommitWriter.append(spark,
      nation.limit(1).withColumn("n_nationkey",
        col("n_nationkey") + 300), p) // v6 closes the [4,6] span
    val names = logFiles(p)
    assert(names.contains(LogSegment.compactedFileName(1, 3)))
    assert(names.contains(LogSegment.compactedFileName(4, 6)))
    // raw commits stay authoritative and present
    assert((0L to 6L).forall(v => names.contains(
      LogSegment.commitFileName(v))))

    // the resolved segment reads the creation commit + two compactions
    val seg = LogSegment.forTable(spark, new Path(p))
    assert(seg.commitFiles.map(_.getPath.getName) ==
      Seq(LogSegment.commitFileName(0),
        LogSegment.compactedFileName(1, 3),
        LogSegment.compactedFileName(4, 6)))

    // state through compactions == state through raw commits
    val viaCompacted = DeltaTable.forPath(spark, p).read
      .orderBy("n_nationkey").collect().toSeq
    spark.conf.set(LogCompaction.UseCompactedConfKey, "false")
    try {
      val rawSeg = LogSegment.forTable(spark, new Path(p))
      assert(rawSeg.commitFiles.map(_.getPath.getName) ==
        (0L to 6L).map(LogSegment.commitFileName))
      val viaRaw = DeltaTable.forPath(spark, p).read
        .orderBy("n_nationkey").collect().toSeq
      assert(viaCompacted == viaRaw)
      assert(viaRaw.nonEmpty)
    } finally spark.conf.unset(LogCompaction.UseCompactedConfKey)

    // the distributed replay plan agrees with the driver-side one
    val distributed = Replay.liveFilesDistributedForTest(spark, seg)
      .select("path").collect().map(_.getString(0)).toSet
    val driverSide = Replay.liveFiles(spark, seg)
      .select("path").collect().map(_.getString(0)).toSet
    assert(distributed == driverSide)
  }

  test("reconciliation keeps metadata, txns, and remove tombstones") {
    val p = tmp("recon")
    CommitWriter.createTable(spark, nation, p, configuration = Map(
      LogCompaction.IntervalPropKey -> "4",
      CommitWriter.CheckpointIntervalPropKey -> "1000"))
    graft.commands.DmlCommands.delete(spark, p,
      col("n_nationkey") >= 20) // v1: remove + add
    assert(CommitWriter.appendIfAbsent(spark,
      nation.where(col("n_nationkey") === 0)
        .withColumn("n_nationkey", col("n_nationkey") + 100),
      p, appId = "compact-writer", txnVersion = 7).isDefined) // v2
    val meta = DeltaTable.forPath(spark, p).metadata
    CommitWriter.commitMetadata(spark, p, meta.copy(
      configuration = meta.configuration + ("graft.test.mark" -> "yes"))) // v3
    CommitWriter.append(spark,
      nation.limit(1).withColumn("n_nationkey",
        col("n_nationkey") + 101), p) // v4 closes the [1,4] span

    assert(logFiles(p).contains(LogSegment.compactedFileName(1, 4)))
    val seg = LogSegment.forTable(spark, new Path(p))
    assert(seg.commitFiles.map(_.getPath.getName) ==
      Seq(LogSegment.commitFileName(0),
        LogSegment.compactedFileName(1, 4)))

    // latest metadata (the v3 property) resolves through the compaction
    val (m, _) = Replay.metadataAndProtocol(spark, seg)
    assert(m.configuration.get("graft.test.mark").contains("yes"))
    // the SetTransaction survives (idempotent writers stay exactly-once)
    assert(CommitWriter.latestTxnVersion(spark, p, "compact-writer")
      .contains(7L))
    // the delete's tombstones survive reconciliation
    assert(Replay.tombstones(spark, seg).count() > 0)
    // and the data is right (the appendIfAbsent row plus the v4 row)
    assert(DeltaTable.forPath(spark, p).read.count() ==
      nation.where(col("n_nationkey") < 20).count() + 2)
  }

  test("a compaction straddling the checkpoint is ignored") {
    val p = tmp("straddle")
    CommitWriter.createTable(spark,
      nation.where(col("n_regionkey") === 0), p, configuration = Map(
        CommitWriter.CheckpointIntervalPropKey -> "1000"))
    for (r <- 1 to 4)
      CommitWriter.append(spark,
        nation.where(col("n_regionkey") === r), p)
    CommitWriter.checkpoint(spark, p) // at v4
    CommitWriter.append(spark,
      nation.limit(1).withColumn("n_nationkey",
        col("n_nationkey") + 200), p) // v5
    // a span reaching below the checkpoint must never be substituted
    assert(LogCompaction.compactLog(spark, p, 3, 5))
    val seg = LogSegment.forTable(spark, new Path(p))
    assert(seg.checkpointVersion.contains(4L))
    assert(seg.commitFiles.map(_.getPath.getName) ==
      Seq(LogSegment.commitFileName(5)))
    assert(DeltaTable.forPath(spark, p).read.count() ==
      nation.count() + 1)
  }

  test("explicit compactLog is idempotent and refuses missing commits") {
    val p = tmp("explicit")
    CommitWriter.createTable(spark, nation, p)
    CommitWriter.append(spark, nation.limit(1), p)
    assert(LogCompaction.compactLog(spark, p, 0, 1))
    assert(!LogCompaction.compactLog(spark, p, 0, 1)) // already there
    intercept[IllegalStateException] {
      LogCompaction.compactLog(spark, p, 5, 7)
    }
  }

  test("the retention sweep deletes compactions with their span") {
    val p = tmp("sweep")
    CommitWriter.createTable(spark, nation, p, configuration = conf)
    for (i <- 1 to 3)
      CommitWriter.append(spark, nation.limit(i), p)
    assert(logFiles(p).contains(LogSegment.compactedFileName(1, 3)))
    CommitWriter.append(spark, nation.limit(4), p)
    CommitWriter.checkpoint(spark, p) // at v4, above the span end
    // age everything, then sweep with zero retention: the prefix below
    // the checkpoint horizon goes — including the compaction whose
    // whole span sits inside it (end 3 < horizon 4)
    val logDir = new java.io.File(p, "_delta_log")
    logDir.listFiles().foreach(f =>
      f.setLastModified(System.currentTimeMillis() - 3600 * 1000))
    CommitWriter.cleanupExpiredLogs(spark, p,
      retentionMsOverride = Some(0L))
    val after = logFiles(p)
    assert(!after.contains(LogSegment.compactedFileName(1, 3)))
    assert(!after.contains(LogSegment.commitFileName(0)))
    assert(after.contains(LogSegment.commitFileName(4)))
    assert(DeltaTable.forPath(spark, p).read.count() ==
      nation.count() + 1 + 2 + 3 + 4)
  }
}
