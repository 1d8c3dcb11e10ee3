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

  /** events.parquet carries TIMESTAMP(NANOS): streamed as raw longs and
    * converted to a proper event-time column. */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet") // file source needs a dir
      .parquet(sfDir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
  }

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
      name: String, mode: OutputMode, statePartitions: Int = 8): DataFrame = {
    // the stream runs in a CLONED session (shared SparkContext, isolated
    // SQLConf), so the state-partition override can never leak into
    // queries running concurrently on the caller's session; the builder
    // receives the clone so the plan binds to the scoped conf
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val q = build(ss).writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    ss.table(name)
  }
}
