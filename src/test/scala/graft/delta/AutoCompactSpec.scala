package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.CommitWriter

/** Post-commit auto-compaction (`delta.autoOptimize.autoCompact`):
  * small files accumulate until a partition qualifies, then the commit
  * path compacts via the normal OPTIMIZE machinery — dataChange=false,
  * content intact, no recursion, opt-in only. */
class AutoCompactSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_ac_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private def withMinFiles[A](n: Int)(body: => A): A = {
    spark.conf.set("spark.lakehouse.autoCompact.minNumFiles", n.toString)
    try body
    finally spark.conf.unset("spark.lakehouse.autoCompact.minNumFiles")
  }

  test("small-file appends compact once the threshold is met") {
    val p = tmp("basic")
    withMinFiles(4) {
      CommitWriter.createTable(spark,
        spark.range(10).coalesce(1).toDF("id"), p,
        configuration = Map("delta.autoOptimize.autoCompact" -> "true"))
      // v1..v2: below threshold — no compaction fires
      CommitWriter.append(spark, spark.range(10, 20).coalesce(1).toDF("id"), p)
      CommitWriter.append(spark, spark.range(20, 30).coalesce(1).toDF("id"), p)
      assert(DeltaTable.forPath(spark, p).allFiles.count() == 3L)
      // v3 brings the 4th small file -> post-commit compaction
      CommitWriter.append(spark, spark.range(30, 40).coalesce(1).toDF("id"), p)
      val snap = DeltaTable.forPath(spark, p)
      assert(snap.allFiles.count() == 1L,
        "4 small files should have compacted to 1")
      // the compaction landed as its own OPTIMIZE commit after v3
      assert(snap.version == 4L)
      // content intact
      assert(snap.read.count() == 40L)
      assert(snap.read.agg(sum("id")).head.getLong(0) == (0L until 40L).sum)
      // compaction actions carry dataChange=false (CDC/incremental
      // readers must not see a rewrite as new data)
      val v4 = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p, "_delta_log",
          f"${4L}%020d.json")), "UTF-8")
      assert(v4.contains("\"OPTIMIZE\""))
      assert(!v4.contains("\"dataChange\":true"))
      // another small append does NOT immediately re-compact (1 big +
      // 1 small file is below the threshold) — no runaway recursion
      CommitWriter.append(spark, spark.range(40, 50).coalesce(1).toDF("id"), p)
      assert(DeltaTable.forPath(spark, p).allFiles.count() == 2L)
    }
  }

  test("optimizeWrite rebalances partitioned writes to few files") {
    // without optimizeWrite every task writes one file per partition
    // dir it holds rows for (tasks x partitions small files); with it
    // the rows shuffle to the partition keys first (AQE-sized blocks)
    def build(p: String, optimize: Boolean): Long = {
      val cfg =
        if (optimize) Map("delta.autoOptimize.optimizeWrite" -> "true")
        else Map.empty[String, String]
      val df = spark.range(12000)
        .select(col("id"), (col("id") % 3).cast("int").as("part"))
        .repartition(4) // round-robin: every task holds every key
      CommitWriter.createTable(spark, df, p,
        partitionColumns = Seq("part"), configuration = cfg)
      DeltaTable.forPath(spark, p).allFiles.count()
    }
    val pControl = tmp("ow_control")
    val pOn = tmp("ow_on")
    val control = build(pControl, optimize = false)
    val optimized = build(pOn, optimize = true)
    assert(control >= 10L, s"control should small-file-explode: $control")
    assert(optimized <= 4L,
      s"optimizeWrite should yield ~1 file per partition: $optimized")
    // content identical either way
    assert(DeltaTable.forPath(spark, pOn).read.agg(sum("id"))
      .head.getLong(0) ==
      DeltaTable.forPath(spark, pControl).read.agg(sum("id"))
        .head.getLong(0))
  }

  test("exactly-once sink appends (appendIfAbsent) compact too") {
    // the streaming DeltaSink lands batches via appendIfAbsent — the
    // primary auto-compact use case (one tiny file per micro-batch)
    val p = tmp("sink")
    withMinFiles(3) {
      CommitWriter.createTable(spark,
        spark.range(10).coalesce(1).toDF("id"), p,
        configuration = Map("delta.autoOptimize.autoCompact" -> "true"))
      CommitWriter.appendIfAbsent(spark,
        spark.range(10, 20).coalesce(1).toDF("id"), p,
        appId = "sink-q", txnVersion = 1L)
      CommitWriter.appendIfAbsent(spark,
        spark.range(20, 30).coalesce(1).toDF("id"), p,
        appId = "sink-q", txnVersion = 2L) // 3rd small file -> compact
      val snap = DeltaTable.forPath(spark, p)
      assert(snap.allFiles.count() == 1L)
      assert(snap.read.count() == 30L)
      // a replayed micro-batch stays a no-op after the compaction
      assert(CommitWriter.appendIfAbsent(spark,
        spark.range(20, 30).coalesce(1).toDF("id"), p,
        appId = "sink-q", txnVersion = 2L).isEmpty)
      assert(DeltaTable.forPath(spark, p).read.count() == 30L)
    }
  }

  test("tables without the property never auto-compact") {
    val p = tmp("optout")
    withMinFiles(2) {
      CommitWriter.createTable(spark, spark.range(10).coalesce(1).toDF("id"), p)
      (1 to 4).foreach(i =>
        CommitWriter.append(spark,
          spark.range(i * 10L, i * 10L + 10).coalesce(1).toDF("id"), p))
      assert(DeltaTable.forPath(spark, p).allFiles.count() == 5L)
      assert(DeltaTable.forPath(spark, p).version == 4L)
    }
  }

  test("property flipped on mid-life takes effect from that commit") {
    val p = tmp("midlife")
    withMinFiles(3) {
      CommitWriter.createTable(spark, spark.range(10).coalesce(1).toDF("id"), p)
      CommitWriter.append(spark, spark.range(10, 20).coalesce(1).toDF("id"), p)
      assert(DeltaTable.forPath(spark, p).allFiles.count() == 2L)
      val snap = DeltaTable.forPath(spark, p)
      CommitWriter.commitMetadata(spark, p, snap.metadata.copy(
        configuration = snap.metadata.configuration +
          ("delta.autoOptimize.autoCompact" -> "true")))
      // metadata-only commit adds no files -> nothing fires yet
      assert(DeltaTable.forPath(spark, p).allFiles.count() == 2L)
      // the next data commit crosses the threshold and compacts
      CommitWriter.append(spark, spark.range(20, 30).coalesce(1).toDF("id"), p)
      val after = DeltaTable.forPath(spark, p)
      assert(after.allFiles.count() == 1L)
      assert(after.read.count() == 30L)
    }
  }
}
