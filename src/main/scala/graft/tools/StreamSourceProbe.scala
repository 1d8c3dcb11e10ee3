package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Micro-profiler for q_stream_delta_source: per-micro-batch durations
  * from the streaming listener plus end-to-end wall time, so the fixed
  * overhead (engine init, planning, offset log) is separable from the
  * per-commit incremental work. */
object StreamSourceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    // fixture build off the clock, as in Bench warmup
    graft.queries.DeltaQueries.versionedTable(spark, sfDir)
    // streaming-engine warmup with a different query shape
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("q_stream_delta_source")(spark, sfDir).count()
    println(s"[probe] cold run: ${(System.nanoTime() - t0) / 1e9}s")
    for (i <- 1 to 3) {
      val t = System.nanoTime()
      graft.SparkEntry.queries("q_stream_delta_source")(spark, sfDir).count()
      println(s"[probe] warm run $i: ${(System.nanoTime() - t) / 1e9}s")
    }
    spark.stop()
  }
}
