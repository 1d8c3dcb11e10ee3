package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import graft.delta.log.CommitWriter

/** Structured-Streaming sink into a graft Delta table: foreachBatch +
  * SetTransaction idempotence gives exactly-once appends — a replayed
  * micro-batch (restart, speculative re-run) is a no-op because its
  * (queryId, batchId) txn is already in the log.
  */
object DeltaSink {

  /** Wire a streaming DataFrame into a Delta table. A missing table is
    * created EMPTY from the stream's schema on the first batch, and the
    * data then lands through the idempotent append — so a replayed
    * first batch (restart before the checkpoint write) stays
    * exactly-once, which bundling rows into the create commit (no txn
    * action) would break. */
  /** @param mergeSchema evolve the sink table when a restarted stream
    *   carries net-new columns (the batch-writer `mergeSchema=true`
    *   semantics: nullable append in the same commit as the batch's
    *   data; type conflicts still reject). Without it a producer-side
    *   schema addition stops the stream at the write gate — the
    *   fail-safe default. */
  def writeStream(df: DataFrame, tablePath: String, appId: String,
      checkpointDir: String, mergeSchema: Boolean = false): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val logPath = new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(tablePath), "_delta_log")
        if (!graft.delta.log.LogSegment.fs(spark, logPath).exists(logPath))
          try CommitWriter.createTable(spark, batch.limit(0), tablePath)
          catch { case _: CommitWriter.ConcurrentCommitException => () }
        CommitWriter.appendIfAbsent(spark, batch, tablePath,
          appId = appId, txnVersion = batchId, mergeSchema = mergeSchema)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
