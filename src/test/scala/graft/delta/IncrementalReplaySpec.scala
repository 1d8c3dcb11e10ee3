package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.{CommitWriter, Replay}

/** Incremental snapshot refresh (`Snapshot::try_new_from` semantics):
  * re-resolving a hot table replays only the new commit tail on top of
  * the cached reconciled state — and the incremental result is
  * action-for-action identical to a cold full replay. */
class IncrementalReplaySpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_incr_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val region = spark.read.parquet(s"$sf/region.parquet")

  test("refresh after append/delete replays only the tail (and matches full)") {
    val p = tmp("a")
    CommitWriter.createTable(spark, region.filter(col("r_regionkey") < 3), p)
    DeltaTable.forPath(spark, p).read.count() // populate the cache

    // mutate: append, then remove one file, then re-add content
    CommitWriter.append(spark, region.filter(col("r_regionkey") >= 3), p)
    val f = DeltaTable.forPath(spark, p) // this lookup is the incremental one
    Replay.ReplayCounters.reset()
    val snap = DeltaTable.forPath(spark, p)
    val liveIncremental = snap.allFiles
      .select("path", "size", "commit_version").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(Replay.ReplayCounters.full.get() == 0,
      "refresh fell back to a full replay")
    assert(Replay.ReplayCounters.incremental.get() +
      Replay.ReplayCounters.hit.get() >= 1)

    // cold replay must agree exactly (fresh cache via a distinct path
    // trick is not possible — instead force a full replay by resetting
    // the cached state through a remove+readd cycle and compare counts)
    assert(snap.read.count() == region.count())
    val first = snap.allFiles.select("path").orderBy("path")
      .limit(1).collect()(0).getString(0)
    CommitWriter.commitRemoves(spark, p, Seq(first))
    Replay.ReplayCounters.reset()
    val afterDelete = DeltaTable.forPath(spark, p)
    val liveAfter = afterDelete.allFiles.select("path").collect()
      .map(_.getString(0)).sorted
    assert(Replay.ReplayCounters.incremental.get() >= 1 &&
      Replay.ReplayCounters.full.get() == 0,
      "delete refresh was not incremental")
    assert(!liveAfter.contains(first))
    assert(liveIncremental.map(_._1).toSet -- liveAfter.toSet == Set(first))
  }

  test("repeated same-version reads are cache hits (no replay at all)") {
    val p = tmp("h")
    CommitWriter.createTable(spark, region, p)
    DeltaTable.forPath(spark, p).read.count()
    Replay.ReplayCounters.reset()
    DeltaTable.forPath(spark, p).allFiles.count()
    DeltaTable.forPath(spark, p).allFiles.count()
    assert(Replay.ReplayCounters.hit.get() >= 2)
    assert(Replay.ReplayCounters.full.get() == 0)
    assert(Replay.ReplayCounters.incremental.get() == 0)
  }

  test("spark.lakehouse.delta.enable_caching=false bypasses the cache") {
    val p = tmp("nc")
    CommitWriter.createTable(spark, region, p)
    val want = DeltaTable.forPath(spark, p).read.count()
    spark.conf.set("spark.lakehouse.delta.enable_caching", "false")
    try {
      Replay.ReplayCounters.reset()
      assert(DeltaTable.forPath(spark, p).read.count() == want)
      DeltaTable.forPath(spark, p).allFiles.count()
      // every read re-replays; nothing is served from or stored to the
      // cache (the reference's lakehouse.delta.enable_caching=false)
      assert(Replay.ReplayCounters.hit.get() == 0)
      assert(Replay.ReplayCounters.incremental.get() == 0)
      assert(Replay.ReplayCounters.full.get() >= 2)
    } finally spark.conf.unset("spark.lakehouse.delta.enable_caching")
    // cache resumes (and repopulates) once re-enabled
    DeltaTable.forPath(spark, p).allFiles.count()
    Replay.ReplayCounters.reset()
    DeltaTable.forPath(spark, p).allFiles.count()
    assert(Replay.ReplayCounters.hit.get() >= 1)
  }

  test("incremental result equals a cold full replay after many mutations") {
    val p = tmp("eq")
    CommitWriter.createTable(spark, region.limit(2), p)
    val warm = () => DeltaTable.forPath(spark, p).allFiles
      .select("path", "size", "commit_version").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    warm() // cache v0
    CommitWriter.append(spark, region.limit(3), p)
    warm() // incremental to v1
    val victim = DeltaTable.forPath(spark, p).allFiles
      .select("path").orderBy("path").limit(1).collect()(0).getString(0)
    CommitWriter.commitRemoves(spark, p, Seq(victim))
    val incremental = warm() // incremental to v2

    // cold state: drop the cache by caching a DIFFERENT table (LRU is
    // per-table, so just compare against the distributed replay instead)
    val cold = Replay.liveFilesDistributedForTest(spark,
      DeltaTable.forPath(spark, p).segment)
      .select("path", "size", "commit_version").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(incremental.toSeq == cold.toSeq)
  }

  test("time-travel read does not clobber the hot latest cache") {
    val p = tmp("tt")
    CommitWriter.createTable(spark, region.limit(2), p)
    CommitWriter.append(spark, region.limit(4), p)
    DeltaTable.forPath(spark, p).allFiles.count() // cache latest (v1)
    DeltaTable.forPath(spark, p, Some(0)).allFiles.count() // time travel
    Replay.ReplayCounters.reset()
    DeltaTable.forPath(spark, p).allFiles.count() // latest again
    assert(Replay.ReplayCounters.hit.get() >= 1,
      "time travel evicted the latest state")
  }
}
