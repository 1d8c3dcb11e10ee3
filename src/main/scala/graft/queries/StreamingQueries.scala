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
    })
}
