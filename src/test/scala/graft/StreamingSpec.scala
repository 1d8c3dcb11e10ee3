package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventsStream

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("windowed streaming agg equals batch aggregation") {
    val got = EventsStream.runToMemory(spark,
      ss => EventsStream.windowedCounts(EventsStream.readEvents(ss, sf)),
      "spec_window", OutputMode.Complete())
    val batch = graft.queries.T.events(spark, sf)
      .withColumn("minute_bucket", expr("ts div 60000000000"))
      .groupBy("minute_bucket", "event_type")
      .agg(count(lit(1)).as("n"))
    assert(got.count() == batch.count())
    assert(got.agg(sum("n")).head().getLong(0) ==
      batch.agg(sum("n")).head().getLong(0))
  }

  test("watermarked append-mode query runs with bounded state") {
    val got = EventsStream.runToMemory(spark,
      ss => EventsStream.watermarkedCounts(EventsStream.readEvents(ss, sf)),
      "spec_watermark", OutputMode.Append())
    // append mode withholds windows not yet past the watermark; with a
    // single batch the final watermark covers all but the tail windows
    assert(got.count() >= 0) // must run without error; shape checked below
    assert(got.schema.fieldNames.contains("window"))
  }

  test("mapGroupsWithState sessionization counts all events per user") {
    val sessions = EventsStream.runToMemory(spark,
      ss => EventsStream.userSessions(ss,
        EventsStream.readEvents(ss, sf)).toDF(), "spec_sessions",
      OutputMode.Update())
    val total = sessions.groupBy("user_id")
      .agg(max("n_events").as("n")).agg(sum("n")).head().getLong(0)
    assert(total == graft.queries.T.events(spark, sf).count())
  }
}
