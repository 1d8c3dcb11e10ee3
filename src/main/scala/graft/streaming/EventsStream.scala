package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the `events` table.
  *
  * The reference engine is strictly bounded (every custom exec node is
  * Boundedness::Bounded — SURVEY.md §1.1 "Streams"), so this module is
  * a beyond-parity extension: the same event pipeline shapes a training
  * -data ingest would run continuously, expressed with readStream →
  * watermark → windowed aggregation, plus mapGroupsWithState
  * sessionization. Local smoke drives it with the parquet fixture via
  * a memory sink (processAllAvailable).
  */
object EventsStream {

  /** Streamed events with `ts` normalized to epoch-ns longs (see
    * T.normalizeEventTs — handles both the TIMESTAMP(NANOS) and the
    * timestamp[us] fixture drops) and a proper event-time column. */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    graft.queries.T.normalizeEventTs(spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet") // file source needs a dir
      .parquet(sfDir))
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
  }

  /** The events fixture with ts normalized to epoch-ns longs — the form
    * every feed file is written in, so feed schemas are stable across
    * fixture drops. */
  private def fixtureEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.queries.T.normalizeEventTs(
      spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** Identity of the source events fixture: (size, content-sha256) —
    * catches even a regeneration that preserves byte count and
    * timestamps (cp -p / rsync -a of an equal-length drop). The
    * _FEED_READY marker records this signature at build time; the hash
    * memoizes per (path, size, mtime) in-process (see
    * [[graft.queries.DeltaQueries.contentSha]]). */
  private def sourceSig(sfDir: String): String = {
    val f = new java.io.File(s"$sfDir/events.parquet")
    s"${f.length()}:${graft.queries.DeltaQueries.contentSha(f)}"
  }

  /** A feed cache is valid only if it was built from the CURRENT source
    * fixture: the driver regenerates /root/testdata between rounds, and
    * a feed replaying stale rows would diverge from the oracle. */
  private def feedFresh(done: java.io.File, sfDir: String): Boolean =
    done.exists() && new String(
      java.nio.file.Files.readAllBytes(done.toPath), "UTF-8") ==
      sourceSig(sfDir)

  /** Publish the feed-ready marker carrying the source signature. */
  private def markReady(done: java.io.File, sfDir: String): Unit =
    java.nio.file.Files.write(done.toPath,
      sourceSig(sfDir).getBytes("UTF-8"))

  /** Tumbling 1-minute windows per event type (complete mode → equal to
    * the batch groupBy, which is what the oracle checks). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("event_time"), "60 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .select(
        (unix_timestamp(col("window.start")) / 60).cast("long")
          .as("minute_bucket"),
        col("event_type"), col("n"), col("total_value"))

  /** Watermarked append-mode variant (the production shape: late data
    * beyond 5 minutes is dropped, state is bounded). */
  def watermarkedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", "5 minutes")
      .groupBy(window(col("event_time"), "60 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  final val WatermarkDelaySec = 300L
  final val SentinelType = "__wm_sentinel"

  /** Append-mode watermarked windows, shaped like windowedCounts.
    * Sentinel rows (which only exist to advance the watermark) are NOT
    * filtered here: event_type is a grouping column, so Catalyst pushes
    * an event_type filter below the aggregation AND the
    * EventTimeWatermark node — the sentinel rows would be dropped at
    * the scan and the watermark would never advance (observed: the
    * sentinel batches read 0 rows). Callers filter the sink output. */
  def watermarkedWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("event_time", s"$WatermarkDelaySec seconds")
      .groupBy(window(col("event_time"), "60 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .select(
        (unix_timestamp(col("window.start")) / 60).cast("long")
          .as("minute_bucket"),
        col("event_type"), col("n"), col("total_value"))

  /** Build (once) a 3-file feed directory: the events fixture plus two
    * far-future sentinel rows in their own files, modification times
    * ascending so the file source (maxFilesPerTrigger=1) replays them
    * as ordered batches. After the second sentinel's batch the
    * watermark provably exceeds every real window's end, so append
    * mode has emitted exactly the batch aggregation of the real rows —
    * which is what the oracle checks. Returns the feed dir. */
  def watermarkFeedDir(spark: SparkSession, sfDir: String): String = {
    val feedDir = s"target/stream_wm_feed_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val done = new java.io.File(s"$feedDir/_FEED_READY")
    if (!feedFresh(done, sfDir)) {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(feedDir))
      val ev = fixtureEvents(spark, sfDir)
      val maxTs = ev.agg(max("ts")).head.getLong(0)
      val delayNs = WatermarkDelaySec * 1000000000L
      // margin: one window width + one extra minute past the delay
      val s1 = maxTs + delayNs + 180L * 1000000000L
      val s2 = s1 + delayNs + 180L * 1000000000L
      def writeOne(df: DataFrame, name: String, mtime: Long): Unit =
        writeFeedFile(feedDir, df, name, mtime)
      // mtimes strictly ascending but all safely in the PAST: a file
      // whose mtime is ahead of the stream's start scans EMPTY in its
      // batch (observed: future-stamped sentinel read 0 rows on a
      // freshly built feed), which silently un-advances the watermark
      val base = System.currentTimeMillis() - 60000
      def sentinel(ns: Long, id: Long): DataFrame =
        ev.sparkSession.createDataFrame(
          java.util.Arrays.asList(
            org.apache.spark.sql.Row(id, ns, 0L, SentinelType, null, null)),
          ev.schema)
      writeOne(ev, "00_events.parquet", base)
      writeOne(sentinel(s1, -1L), "01_sentinel.parquet", base + 10000)
      writeOne(sentinel(s2, -2L), "02_sentinel.parquet", base + 20000)
      markReady(done, sfDir)
    }
    feedDir
  }

  /** Write one single-file parquet into a feed dir with a pinned mtime
    * (the file source orders replay batches by modification time). */
  private def writeFeedFile(feedDir: String, df: DataFrame, name: String,
      mtime: Long): Unit = {
    val staging = s"$feedDir/.staging_$name"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(s"$feedDir/$name")
    java.nio.file.Files.move(part.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(staging))
    dst.setLastModified(mtime)
  }

  /** Build (once) a two-file feed split at the time midpoint: the
    * stream-stream join reads each file as its own micro-batch, so
    * matches whose click and purchase land in DIFFERENT batches must
    * come out of the join's keyed state — the cross-batch case a
    * single-batch feed would never exercise. */
  def joinFeedDir(spark: SparkSession, sfDir: String): String = {
    val feedDir = s"target/stream_join_feed_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val done = new java.io.File(s"$feedDir/_FEED_READY")
    if (!feedFresh(done, sfDir)) {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(feedDir))
      val ev = fixtureEvents(spark, sfDir)
      val mm = ev.agg(min("ts"), max("ts")).head
      val mid = mm.getLong(0) / 2 + mm.getLong(1) / 2
      val base = System.currentTimeMillis() - 60000
      writeFeedFile(feedDir, ev.where(col("ts") <= mid),
        "00_first_half.parquet", base)
      writeFeedFile(feedDir, ev.where(col("ts") > mid),
        "01_second_half.parquet", base + 10000)
      markReady(done, sfDir)
    }
    feedDir
  }

  /** Build (once) a duplicate-delivery feed: file 0 carries every event
    * TWICE (in-batch duplicates — the upstream retry shape), file 1
    * redelivers the whole fixture again (cross-batch duplicates — the
    * at-least-once replay shape). A correct streaming dedup over this
    * feed emits each event exactly once. Returns the feed dir. */
  def dedupFeedDir(spark: SparkSession, sfDir: String): String = {
    val feedDir = s"target/stream_dedup_feed_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val done = new java.io.File(s"$feedDir/_FEED_READY")
    if (!feedFresh(done, sfDir)) {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(feedDir))
      val ev = fixtureEvents(spark, sfDir)
      // mtimes ascending but in the past (see watermarkFeedDir: a
      // future-stamped file scans empty in its batch)
      val base = System.currentTimeMillis() - 60000
      writeFeedFile(feedDir, ev.unionAll(ev), "00_events_x2.parquet", base)
      writeFeedFile(feedDir, ev, "01_redelivery.parquet", base + 10000)
      markReady(done, sfDir)
    }
    feedDir
  }

  /** Streaming read of a watermark feed dir (ordered multi-file replay).
    * Feed files are always written post-normalization (ts = epoch-ns
    * long), so the stream schema is the NORMALIZED fixture schema. */
  /** @param filesPerTrigger batch granularity. 1 (default) gives the
    *   strict one-file-per-batch replay the cross-batch-state feeds
    *   (join, dedup) rely on; the watermark feed passes 2 so the events
    *   file and the first sentinel share a batch — the watermark update
    *   happens at batch END either way, so emission still needs (and
    *   gets) the second sentinel's batch, one batch cycle earlier. */
  def readFeed(spark: SparkSession, sfDir: String, feedDir: String,
      filesPerTrigger: Int = 1): DataFrame = {
    val schema = fixtureEvents(spark, sfDir).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger.toString)
      .option("pathGlobFilter", "*.parquet")
      .parquet(feedDir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
  }

  case class SessionState(nEvents: Long, lastTs: Long)
  case class UserSession(user_id: Long, n_events: Long, last_ts: Long)

  /** Custom state: per-user running session via mapGroupsWithState. */
  def userSessions(spark: SparkSession, events: DataFrame): Dataset[UserSession] = {
    import spark.implicits._
    events.select(col("user_id"), col("ts"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[(Long, Long)],
         state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, 0L))
          var n = prev.nEvents
          var last = prev.lastTs
          rows.foreach { case (_, ts) =>
            n += 1
            if (ts > last) last = ts
          }
          state.update(SessionState(n, last))
          UserSession(userId, n, last)
      }
  }

  /** Run a streaming DataFrame to completion against a memory sink and
    * return the materialized result (local smoke harness).
    *
    * State partitioning is right-sized at query start: a streaming
    * aggregation commits one state-store delta per shuffle partition per
    * batch, so partition count should track state volume (distinct keys),
    * not the batch shuffle default — 32 near-empty HDFS-backed stores per
    * batch cost ~5x more commit overhead than 8 on this fixture. At
    * production scale the same knob goes UP with key cardinality (state
    * partitions are fixed for the life of the checkpoint, so size them
    * for the target state, not the first batch). */
  def runToMemory(spark: SparkSession, build: SparkSession => DataFrame,
      name: String, mode: OutputMode, statePartitions: Int = 4): DataFrame = {
    // the stream runs in a CLONED session (shared SparkContext, isolated
    // SQLConf), so the state-partition override can never leak into
    // queries running concurrently on the caller's session; the builder
    // receives the clone so the plan binds to the scoped conf
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    // every query here emits its results inside DATA batches (complete/
    // update modes emit per batch; the append-mode feeds advance the
    // watermark with sentinel/ordered DATA files precisely so emission
    // happens in the following data batch) — the trailing no-data
    // micro-batch only re-commits state and offsets, so skip its
    // full batch cycle
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    // checkpoint on tmpfs when available: offsets/commits/state are
    // dozens of small fsync'd files per batch, and a disk-backed /tmp
    // bills that latency to every micro-batch (a real deployment puts
    // checkpoints on its durable store — this harness checkpoint is
    // ephemeral by design, deleted after the run)
    val shm = new java.io.File("/dev/shm")
    val ckBase = if (shm.isDirectory && shm.canWrite) shm
      else new java.io.File(System.getProperty("java.io.tmpdir"))
    val ck = java.nio.file.Files.createTempDirectory(
      ckBase.toPath, s"graft_ck_$name").toFile
    val q = build(ss).writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", ck.getAbsolutePath)
      .start()
    try q.processAllAvailable() finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(ck)
    }
    ss.table(name)
  }
}
