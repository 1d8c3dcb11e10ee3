package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventsStream

/** Streaming pipeline declared through the driver contract: each query
  * actually runs a Structured Streaming job to completion (memory sink)
  * and returns the materialized result, so the oracle checks the
  * streaming aggregation against plain batch SQL.
  */
object StreamingQueries {

  val all: Seq[Q] = Seq(

    Q("q_stream_window",
      """SELECT epoch_ns(ts) // 60000000000 AS minute_bucket, event_type,
        | count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2
        |ORDER BY minute_bucket, event_type""".stripMargin) { (s, dir) =>
      EventsStream.runToMemory(s,
        ss => EventsStream.windowedCounts(EventsStream.readEvents(ss, dir)),
        s"stream_window_${dir.replaceAll("[^a-zA-Z0-9]", "_")}",
        OutputMode.Complete())
        .orderBy("minute_bucket", "event_type")
    },

    // last_ts compared at microsecond precision: DuckDB reads parquet
    // TIMESTAMP(NANOS) as microseconds
    Q("q_stream_sessions",
      """SELECT user_id, count(*) AS n_events,
        | max(epoch_us(ts)) AS last_ts_us
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      EventsStream.runToMemory(s,
        ss => EventsStream.userSessions(ss,
          EventsStream.readEvents(ss, dir)).toDF(),
        s"stream_sessions_${dir.replaceAll("[^a-zA-Z0-9]", "_")}",
        OutputMode.Update())
        // update mode emits one row per user per batch; keep the final
        // state per user (single batch here, but stay robust)
        .groupBy("user_id")
        .agg(max("n_events").as("n_events"),
          expr("max(last_ts) div 1000").as("last_ts_us"))
        .orderBy("user_id")
    },

    // Watermarked APPEND-mode windows — the production streaming shape
    // (bounded state, each window emitted once when the watermark passes
    // it), where q_stream_window is the complete-mode harness shape. A
    // 3-file ordered feed (events + two far-future sentinel rows) drives
    // the watermark past every real window, so the emitted set equals
    // the batch aggregation exactly; sentinels are filtered out of the
    // result and the oracle sees only real rows.
    Q("q_stream_watermark",
      """SELECT epoch_ns(ts) // 60000000000 AS minute_bucket, event_type,
        | count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2
        |ORDER BY minute_bucket, event_type""".stripMargin) { (s, dir) =>
      val feed = EventsStream.watermarkFeedDir(s, dir)
      EventsStream.runToMemory(s,
        // events + first sentinel share batch 0 (mtime order); the
        // second sentinel's batch then emits every real window — same
        // result in 2 batches instead of 3
        ss => EventsStream.watermarkedWindows(
          EventsStream.readFeed(ss, dir, feed, filesPerTrigger = 2)),
        s"stream_wm_${dir.replaceAll("[^a-zA-Z0-9]", "_")}",
        OutputMode.Append())
        // sentinel windows drop HERE, on the materialized sink result —
        // inside the streaming plan this filter would push below the
        // watermark node and defeat the sentinels (see watermarkedWindows)
        .where(col("event_type") =!= EventsStream.SentinelType)
        .orderBy("minute_bucket", "event_type")
    },

    // Streaming corpus dedup: the ingest firehose probes a bloom of the
    // RESIDENT corpus per micro-batch; only suspected duplicates take
    // the exact stream-static anti-join (supported shape: static on the
    // right). The bloom is built ONCE before the stream starts and
    // rides the plan as a literal — per batch the corpus contributes
    // the (reused) broadcast side of the sliver join, never a reshuffle.
    // Exactness is structural (no bloom false negatives), so the oracle
    // is the plain batch anti-join — identical to q_bloom_dedup's.
    Q("q_stream_bloom_dedup",
      s"""WITH corpus AS (
         |  SELECT ${TextQueries.hashSql("text")} AS h FROM documents
         |  WHERE doc_id % 10 <> 3
         |), batch AS (
         |  SELECT doc_id, ${TextQueries.hashSql("text")} AS h
         |  FROM documents WHERE doc_id % 10 = 3
         |)
         |SELECT b.doc_id, b.h AS content_hash
         |FROM batch b
         |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = b.h)
         |ORDER BY b.doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.graftshim.Shims
      val feed = graft.streaming.DocsStream.bloomFeedDir(s, dir)
      val bf = T.load(s, dir, "documents")
        .where(col("doc_id") % 10 =!= 3)
        .select(expr(TextQueries.hashExpr("text")).as("h"))
        .agg(Shims.bloomFilterAgg(col("h"), TextQueries.BloomDedupItems,
          TextQueries.BloomDedupBits).as("bf"))
        .head.getAs[Array[Byte]](0)
      // the static side is CACHED for the stream's lifetime: a
      // stream-static join re-evaluates the static plan every
      // micro-batch, and re-hashing the whole corpus per batch is
      // exactly the repeated work the bloom exists to avoid (cached
      // payload = one long per corpus doc)
      var corpusCached: org.apache.spark.sql.DataFrame = null
      try EventsStream.runToMemory(s,
        ss => {
          corpusCached = T.load(ss, dir, "documents")
            .where(col("doc_id") % 10 =!= 3)
            .select(expr(TextQueries.hashExpr("text")).as("h"))
            .cache()
          val stream = graft.streaming.DocsStream.readFeed(ss, feed)
          // empty corpus → null sketch: might_contain(null) is null and
          // would filter EVERY row on both branches — the whole batch
          // is new, so skip the prefilter (same guard as bloomDedup)
          val prefiltered =
            if (bf == null) stream
            else {
              val mc = Shims.bloomMightContain(lit(bf), col("h"))
              stream.where(!mc).unionByName(
                stream.where(mc).join(corpusCached, Seq("h"), "left_anti"))
            }
          prefiltered.select(col("doc_id"), col("h").as("content_hash"))
        },
        s"stream_bloom_${dir.replaceAll("[^a-zA-Z0-9]", "_")}",
        OutputMode.Append())
        .orderBy("doc_id")
      finally if (corpusCached != null) corpusCached.unpersist(false)
    },

    // Streaming ingest dedup — the at-least-once absorber every
    // production pipeline needs in front of a training corpus. The feed
    // delivers every event THREE times (twice inside batch 0, once more
    // in batch 1); dropDuplicatesWithinWatermark keys state on event_id
    // and the watermark bounds that state: an id is remembered only
    // until the watermark passes its event time, so state size tracks
    // the delay window, not the stream's lifetime — redeliveries beyond
    // the window die at the late-row filter instead. Oracle = the plain
    // fixture (each event exactly once).
    Q("q_stream_dedup",
      """SELECT event_id, user_id, event_type,
        | CAST(value AS DOUBLE) AS value
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val feed = EventsStream.dedupFeedDir(s, dir)
      EventsStream.runToMemory(s,
        ss => EventsStream.readFeed(ss, dir, feed)
          .withWatermark("event_time", s"${EventsStream.WatermarkDelaySec} seconds")
          .dropDuplicatesWithinWatermark("event_id")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value").cast("double").as("value")),
        s"stream_dedup_${dir.replaceAll("[^a-zA-Z0-9]", "_")}",
        OutputMode.Append())
        .orderBy("event_id")
    },

    // Stream-stream INTERVAL join — click→purchase attribution, the
    // canonical two-stream shape: both sides watermarked, the join
    // condition carries an event-time range, so the click-side state a
    // row can match against is bounded by (range + watermark delay),
    // never the stream's lifetime. The feed splits at the time midpoint
    // so cross-batch matches must come from the join's keyed state.
    // Inner-join results emit on match (watermark governs eviction),
    // so the memory sink holds exactly the relational join the oracle
    // recomputes.
    Q("q_stream_join",
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id,
        | c.user_id,
        | CAST(p.value AS DOUBLE) AS purchase_value
        |FROM events c JOIN events p
        | ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 12 HOUR
        |ORDER BY click_id, purchase_id""".stripMargin) { (s, dir) =>
      val feed = EventsStream.joinFeedDir(s, dir)
      EventsStream.runToMemory(s,
        ss => {
          def side(tpe: String, prefix: String) =
            EventsStream.readFeed(ss, dir, feed)
              .where(col("event_type") === tpe)
              .withWatermark("event_time",
                s"${EventsStream.WatermarkDelaySec} seconds")
              .select(col("event_id").as(s"${prefix}_event_id"),
                col("user_id").as(s"${prefix}_user_id"),
                col("event_time").as(s"${prefix}_time"),
                col("value").as(s"${prefix}_value"))
          side("click", "c").join(side("purchase", "p"),
            col("c_user_id") === col("p_user_id") &&
              col("p_time") >= col("c_time") &&
              col("p_time") <= col("c_time") + expr("INTERVAL 12 HOURS"))
            .select(col("c_event_id").as("click_id"),
              col("p_event_id").as("purchase_id"),
              col("c_user_id").as("user_id"),
              col("p_value").cast("double").as("purchase_value"))
        },
        s"stream_join_${dir.replaceAll("[^a-zA-Z0-9]", "_")}",
        OutputMode.Append())
        .orderBy("click_id", "purchase_id")
    },

    // Streaming SOURCE over a Delta table (readStream.format("graftdelta")):
    // maxVersionsPerTrigger=1 forces the incremental path — batch 0 is the
    // v0 snapshot, batch 1 replays exactly the files commit 1 added — so
    // the memory-sink union equals the batch read of the full table, which
    // is what the oracle checks.
    Q("q_stream_delta_source",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val path = DeltaQueries.versionedTable(s, dir) // v0 + v1 commits
      // cloned session: scoped shuffle partitions, isolated memory-sink
      // view (same rationale as EventsStream.runToMemory)
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val name = s"stream_delta_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val q = ss.readStream.format("graftdelta")
        .option("path", path)
        .option("maxVersionsPerTrigger", "1")
        .load()
        .select("o_orderkey", "o_totalprice")
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      ss.table(name).orderBy("o_orderkey")
    },

    // Streaming CHANGE FEED source: readChangeFeed over the same
    // 2-commit table, one version per trigger from version 0 — batch 0
    // emits v0's adds as inserts @0, batch 1 emits v1's adds @1, so
    // the sink union equals the row-level history the batch oracle
    // recomputes from the fixture recipe (v0: totalprice <= 250000).
    Q("q_stream_cdf",
      """SELECT o_orderkey, o_totalprice, 'insert' AS _change_type,
        | CAST(CASE WHEN o_totalprice <= 250000 THEN 0 ELSE 1 END
        |   AS BIGINT) AS _commit_version
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val path = DeltaQueries.versionedTable(s, dir) // v0 + v1 commits
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val name = s"stream_cdf_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val q = ss.readStream.format("graftdelta")
        .option("path", path)
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .option("maxVersionsPerTrigger", "1")
        .load()
        .select("o_orderkey", "o_totalprice", "_change_type",
          "_commit_version")
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      ss.table(name).orderBy("o_orderkey")
    })
}
