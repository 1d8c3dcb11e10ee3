package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-stream feed for the streaming ANN-ingest query: the
  * incremental batch slice (vec_id % 10 == 7 — the same slice the
  * batch incremental-IVF maintenance appends) replayed as TWO ordered
  * micro-batch files of (vec_id, embedding), the shape of a vector
  * firehose landing on a maintained index. Freshness contract as
  * [[EventsStream]]: the feed invalidates with the source drop. */
object VecsStream {

  val feedSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType), nullable = true),
    // a real firehose carries the vector's metadata with it (the PQ
    // ingest sink stores it); spec-built feeds without the column
    // read as null, which the IVF-only consumers ignore
    StructField("label", IntegerType, nullable = true)))

  private def sourceSig(sfDir: String): String = {
    val f = new java.io.File(s"$sfDir/embeddings.parquet")
    // "v2" = feed schema version (label added); bumps stale caches
    s"v2:${f.length()}:${graft.queries.DeltaQueries.contentSha(f)}"
  }

  /** The streamed batch slice (one definition, shared with the oracle
    * expectation). */
  def batchVecs(spark: SparkSession, sfDir: String): DataFrame =
    graft.queries.T.load(spark, sfDir, "embeddings")
      .where(col("vec_id") % 10 === 7)
      .select(col("vec_id"), col("embedding"), col("label"))

  def feedDir(spark: SparkSession, sfDir: String): String =
    this.synchronized {
      // freshness check + rebuild serialize on one lock (same pattern
      // as MultimodalQueries.mediaFixture): two concurrent queries
      // hitting a stale feed must not interleave deleteDirectory with
      // the other's writeFeedFile
      val feedDir =
        s"target/stream_vec_feed_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val done = new java.io.File(s"$feedDir/_FEED_READY")
      val fresh = done.exists() && new String(
        java.nio.file.Files.readAllBytes(done.toPath), "UTF-8") ==
        sourceSig(sfDir)
      if (!fresh) {
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(feedDir))
        val batch = batchVecs(spark, sfDir)
        val base = System.currentTimeMillis() - 60000
        DocsStream.writeFeedFile(feedDir,
          batch.where(col("vec_id") % 20 === 7), "00_first.parquet", base)
        DocsStream.writeFeedFile(feedDir,
          batch.where(col("vec_id") % 20 =!= 7), "01_second.parquet",
          base + 10000)
        java.nio.file.Files.write(done.toPath,
          sourceSig(sfDir).getBytes("UTF-8"))
      }
      feedDir
    }

  /** Spec hook: write one ordered micro-batch file into a custom feed
    * dir (synthetic-index maintenance cases build their own firehose). */
  def writeFeedFile(feedDir: String, df: DataFrame, name: String,
      mtime: Long): Unit =
    DocsStream.writeFeedFile(feedDir, df, name, mtime)

  def readFeed(spark: SparkSession, feedDir: String): DataFrame =
    spark.readStream
      .schema(feedSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(feedDir)
}
