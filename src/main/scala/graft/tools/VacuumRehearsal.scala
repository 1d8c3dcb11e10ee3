package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.delta.DeltaTable
import graft.delta.log.{Actions, CommitWriter}

/** 1M-file VACUUM / dir-listing rehearsal (dev probe, results cited in
  * SCALE.md — the MetadataRehearsal sibling for the paths that DO open
  * the filesystem).
  *
  * MetadataRehearsal proves snapshot/prune/checkpoint at 100k-1M adds
  * without any data files; VACUUM's pipeline is the opposite case —
  * its FULL mode must LIST the physical tree, anti-join the listing
  * against the live set, mtime-filter, and delete. This probe
  * materializes the physical layout (0-byte files are enough: the
  * pipeline stats and deletes, never reads):
  *
  *  - a synthetic table of `n` live files across 100 partitions (log
  *    written MetadataRehearsal-style, physical files created by a
  *    distributed job);
  *  - `n/10` DEBRIS files the log never saw (aborted-write shape),
  *    mtimes backdated past the 7-day default retention;
  *
  * then times, at that scale: the recursive directory listing
  * (`dir_listing`'s engine), VACUUM FULL dry-run (listing + live-set
  * anti-join + mtime filter, first-1000 contract), the REAL VACUUM
  * FULL (same plus the distributed delete — must reclaim exactly the
  * debris), and VACUUM LITE (log-tombstone candidates, zero listing).
  * Driver heap is printed last: every stage must stay O(metadata
  * stream), never O(files) collected.
  *
  * Run: sbt "runMain graft.tools.VacuumRehearsal [nLive]".
  */
object VacuumRehearsal {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(1000000)
    val nDebris = nFiles / 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_vac_rehearse")
    val p = new java.io.File(dir.toFile, "tbl").getAbsolutePath

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"[vacrehearse] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      a
    }

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("part",
        org.apache.spark.sql.types.IntegerType)))
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    CommitWriter.createTable(spark, empty, p,
      partitionColumns = Seq("part"),
      configuration = Map("delta.checkpointInterval" -> "1000000"))

    def relPath(i: Long): String = f"part=${i % 100}/f$i%07d.parquet"

    timed(s"write log: 10 commits x ~${nFiles / 10} adds") {
      var fileNo = 0L
      for (c <- 0 until 10) {
        val inCommit =
          if (c == 9) nFiles - (nFiles / 10) * 9 else nFiles / 10
        val lines = (0 until inCommit).map { _ =>
          val a = Actions.AddFile(
            path = relPath(fileNo),
            partitionValues = Map("part" -> (fileNo % 100).toString),
            size = 0L, modificationTime = 1700000000000L + fileNo,
            dataChange = true, stats = Some("""{"numRecords":0}"""))
          fileNo += 1
          CommitWriter.addJson(a)
        }
        CommitWriter.commit(spark, p, c + 1L, lines, operation = "WRITE")
      }
    }

    // physical layout, created by a distributed job (0-byte files): the
    // live set exactly as the log references it, plus debris the log
    // never saw, backdated past the 7-day default retention
    val staleMtime = System.currentTimeMillis() - 8L * 24 * 3600 * 1000
    timed(s"materialize $nFiles live + $nDebris debris files") {
      for (part <- 0 until 100)
        new java.io.File(p, s"part=$part").mkdirs()
      spark.range(nFiles.toLong + nDebris, 0, -1, 64).foreach { i0 =>
        // descending range so tasks touch distinct inode ranges; i is
        // 1-based here, normalize back
        val i = i0 - 1
        val f =
          if (i < nFiles) new java.io.File(p, relPath(i))
          else new java.io.File(p,
            s"part=${i % 100}/stale_$i.parquet.tmp")
        f.createNewFile()
        if (i >= nFiles) f.setLastModified(staleMtime)
        ()
      }
    }

    val listed = timed("dir_listing: recursive listing count") {
      graft.ops.DirListing.listRecursive(spark, p).count()
    }
    println(s"[vacrehearse] listed $listed entries " +
      s"(live=$nFiles debris=$nDebris + log files)")

    val dry = timed("VACUUM FULL dry-run (first-1000 contract)") {
      graft.commands.VacuumCommand.vacuum(spark, p,
        retentionHours = None, dryRun = true).collect()
    }
    require(dry.length == 1000, s"dry-run returned ${dry.length}")
    require(dry.forall(_.getString(0).contains("stale_")),
      "dry-run candidates include non-debris paths")

    val lite = timed("VACUUM LITE dry-run (log candidates, no listing)") {
      graft.commands.VacuumCommand.vacuum(spark, p,
        retentionHours = None, dryRun = true, mode = "LITE").collect()
    }
    require(lite.isEmpty, s"LITE found ${lite.length} (no tombstones exist)")

    val metrics = timed("VACUUM FULL real run (list+filter+delete)") {
      graft.commands.VacuumCommand.vacuum(spark, p,
        retentionHours = None, dryRun = false).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    }
    println(s"[vacrehearse] deleted ${metrics("files_deleted")} files")
    require(metrics("files_deleted").toLong == nDebris.toLong,
      s"expected $nDebris deletions, got ${metrics("files_deleted")}")
    // the live tree survived intact
    val after = timed("post-vacuum listing count") {
      graft.ops.DirListing.listRecursive(spark, p).count()
    }
    require(after == listed - nDebris, s"post-vacuum listing $after")

    val rt = Runtime.getRuntime
    println(s"[vacrehearse] driver heap used ~" +
      s"${(rt.totalMemory - rt.freeMemory) / (1024 * 1024)} MiB " +
      s"(max ${rt.maxMemory / (1024 * 1024)} MiB)")
    spark.stop()
  }
}
