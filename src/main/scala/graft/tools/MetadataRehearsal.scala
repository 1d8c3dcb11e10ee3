package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.delta.DeltaTable
import graft.delta.log.{Actions, CommitWriter}

/** 100x-file-count METADATA rehearsal: a synthetic `_delta_log` with
  * ~100k add actions (no data files needed — snapshot resolution,
  * stats pruning, and checkpoint writing never open data parquet),
  * timing the O(metadata) paths SCALE.md claims scale:
  *
  *   - log-tail replay (10 commits x 10k adds) -> snapshot + allFiles
  *   - stats pruning (selective predicate over per-file min/max JSON)
  *   - partition pruning (one of 100 partitions)
  *   - classic multi-part checkpoint write (auto-sized parts)
  *   - post-checkpoint snapshot resolve + the same prunes
  *
  * Prints one [metarehearse] line per step; run with the default 8 GiB
  * driver heap to demonstrate no-OOM. Not part of the driver contract.
  */
object MetadataRehearsal {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_meta_rehearse")
    val p = new java.io.File(dir.toFile, "tbl").getAbsolutePath

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"[metarehearse] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      a
    }

    // v0: empty partitioned table (schema + protocol only), interval
    // high so the commit path never auto-checkpoints mid-rehearsal
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("part",
        org.apache.spark.sql.types.IntegerType)))
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    CommitWriter.createTable(spark, empty, p,
      partitionColumns = Seq("part"),
      configuration = Map("delta.checkpointInterval" -> "1000000"))

    // 10 commits x ~nFiles/10 adds (last commit takes the remainder),
    // 100 partitions, monotone disjoint key ranges per file so a
    // selective predicate prunes ~all files
    val perCommit = nFiles / 10
    timed(s"write log: 10 commits x ~$perCommit adds") {
      var fileNo = 0L
      for (c <- 0 until 10) {
        val inCommit =
          if (c == 9) nFiles - perCommit * 9 else perCommit
        val lines = (0 until inCommit).map { i =>
          val part = (fileNo % 100).toInt
          val lo = fileNo * 1000
          val hi = lo + 999
          val stats = s"""{"numRecords":1000,"minValues":{"k":$lo,"v":0.1},""" +
            s""""maxValues":{"k":$hi,"v":0.9},"nullCount":{"k":0,"v":0}}"""
          val a = Actions.AddFile(
            path = f"part=$part/f$fileNo%07d.parquet",
            partitionValues = Map("part" -> part.toString),
            size = 1048576L, modificationTime = 1700000000000L + fileNo,
            dataChange = true, stats = Some(stats))
          fileNo += 1
          CommitWriter.addJson(a)
        }
        CommitWriter.commit(spark, p, c + 1L, lines, operation = "WRITE")
      }
    }

    val snap1 = timed("snapshot resolve (log tail only)") {
      DeltaTable.forPath(spark, p)
    }
    val total = timed("allFiles count (full replay)") {
      snap1.allFiles.count()
    }
    require(total == nFiles.toLong, s"expected $nFiles adds, got $total")
    val pruned = timed("stats prune: k in one file's range") {
      graft.delta.scan.DeltaScan.prunedFiles(snap1,
        Seq(col("k") === 123456L)).count()
    }
    val prunedPart = timed("partition prune: 1 of 100 parts") {
      graft.delta.scan.DeltaScan.prunedFiles(snap1,
        Seq(col("part") === 37)).count()
    }
    println(s"[metarehearse] pruned-to: stats=$pruned partition=$prunedPart")

    timed("classic checkpoint write (auto parts)") {
      CommitWriter.checkpoint(spark, p, numParts = -1)
    }
    // a fresh resolve must now ride the checkpoint (a 100k-file log is
    // past the driver-replay byte bound, so replay runs distributed —
    // no state-cache shortcut to defeat)
    val snap2 = timed("snapshot resolve (from checkpoint)") {
      DeltaTable.forPath(spark, p)
    }
    require(snap2.segment.checkpointVersion.isDefined)
    timed("allFiles count (checkpoint replay)") {
      require(snap2.allFiles.count() == nFiles.toLong)
    }
    timed("stats prune over checkpoint state") {
      require(graft.delta.scan.DeltaScan.prunedFiles(snap2,
        Seq(col("k") === 123456L)).count() == pruned)
    }
    // partition-scoped replaceWhere at 100k files: the remove set is
    // decided from partitionValues alone — the whole op is one
    // qualification pass over the inventory plus one commit (the
    // incoming frame here is EMPTY: a pure "drop this partition's
    // slice" rebuild, no data written or read)
    timed("replaceWhere: empty-rebuild 1 of 100 parts") {
      graft.commands.ReplaceWhereCommand.replaceWhere(spark, empty, p,
        col("part") === 37)
    }
    timed("allFiles count after replaceWhere") {
      require(DeltaTable.forPath(spark, p).allFiles.count() ==
        nFiles.toLong - prunedPart)
    }
    // minor log compaction: a streaming-ingest-shaped tail (200 commits
    // x 20 adds, no checkpoint) resolved raw vs through 20 compacted
    // spans — the between-checkpoints metadata-latency knob. On local
    // FS the win is file-open overhead; on object stores each avoided
    // open is a full GET round trip.
    val p2 = new java.io.File(dir.toFile, "tbl2").getAbsolutePath
    CommitWriter.createTable(spark, empty, p2,
      partitionColumns = Seq("part"),
      configuration = Map("delta.checkpointInterval" -> "1000000"))
    timed("write 200-commit ingest tail (20 adds each)") {
      var fileNo = 0L
      for (c <- 1 to 200) {
        val lines = (0 until 20).map { _ =>
          val part = (fileNo % 100).toInt
          val lo = fileNo * 1000
          val stats = s"""{"numRecords":1000,"minValues":{"k":$lo,"v":0.1},""" +
            s""""maxValues":{"k":${lo + 999},"v":0.9},"nullCount":{"k":0,"v":0}}"""
          val a = Actions.AddFile(
            path = f"part=$part/g$fileNo%07d.parquet",
            partitionValues = Map("part" -> part.toString),
            size = 1048576L, modificationTime = 1700000000000L + fileNo,
            dataChange = true, stats = Some(stats))
          fileNo += 1
          CommitWriter.addJson(a)
        }
        CommitWriter.commit(spark, p2, c.toLong, lines, operation = "WRITE")
      }
    }
    spark.conf.set(graft.delta.log.LogCompaction.UseCompactedConfKey, "false")
    val rawFiles = timed("resolve + count, raw 200-commit tail") {
      DeltaTable.forPath(spark, p2).allFiles.count()
    }
    timed("compact the tail into 20 spans of 10") {
      for (s <- 0 until 20)
        graft.delta.log.LogCompaction.compactLog(spark, p2,
          s * 10 + 1L, s * 10 + 10L)
    }
    spark.conf.unset(graft.delta.log.LogCompaction.UseCompactedConfKey)
    timed("resolve + count through 20 compactions") {
      val snap = DeltaTable.forPath(spark, p2)
      require(snap.segment.commitFiles.size == 21, // v0 + 20 spans
        s"expected 21 log files, got ${snap.segment.commitFiles.size}")
      require(snap.allFiles.count() == rawFiles)
    }

    val rt = Runtime.getRuntime
    println(s"[metarehearse] driver heap used ~" +
      s"${(rt.totalMemory - rt.freeMemory) / (1024 * 1024)} MiB " +
      s"(max ${rt.maxMemory / (1024 * 1024)} MiB)")
    spark.stop()
  }
}
