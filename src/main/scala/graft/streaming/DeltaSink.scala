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

  /** Wire a streaming DataFrame into a Delta table. The table must
    * already exist (create it from the stream's schema beforehand). */
  def writeStream(df: DataFrame, tablePath: String, appId: String,
      checkpointDir: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        CommitWriter.appendIfAbsent(batch.sparkSession, batch, tablePath,
          appId = appId, txnVersion = batchId)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
