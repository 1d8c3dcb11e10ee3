package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document-stream feed for the streaming corpus-dedup query: the
  * arriving batch (doc_id % 10 == 3) replayed as TWO ordered
  * micro-batch files of (doc_id, content hash), so the bloom prefilter
  * + exact verify runs per micro-batch the way an ingest firehose
  * would. Same freshness contract as [[EventsStream]]: the feed
  * invalidates when the driver regenerates the source fixture. */
object DocsStream {

  val feedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("h", LongType, nullable = false)))

  private def sourceSig(sfDir: String): String = {
    val f = new java.io.File(s"$sfDir/documents.parquet")
    s"${f.length()}:${graft.queries.DeltaQueries.contentSha(f)}"
  }

  private[streaming] def writeFeedFile(feedDir: String, df: DataFrame,
      name: String, mtime: Long): Unit = {
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

  /** The streamed batch slice with its content hashes (one definition,
    * shared by the feed builder and the oracle expectations). */
  def batchDocs(spark: SparkSession, sfDir: String): DataFrame =
    graft.queries.T.load(spark, sfDir, "documents")
      .where(col("doc_id") % 10 === 3)
      .select(col("doc_id"),
        expr(graft.queries.TextQueries.hashExpr("text")).as("h"))

  def bloomFeedDir(spark: SparkSession, sfDir: String): String = {
    val feedDir =
      s"target/stream_bloom_feed_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val done = new java.io.File(s"$feedDir/_FEED_READY")
    val fresh = done.exists() && new String(
      java.nio.file.Files.readAllBytes(done.toPath), "UTF-8") ==
      sourceSig(sfDir)
    if (!fresh) {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(feedDir))
      val batch = batchDocs(spark, sfDir)
      val base = System.currentTimeMillis() - 60000
      writeFeedFile(feedDir, batch.where(col("doc_id") % 20 === 3),
        "00_first.parquet", base)
      writeFeedFile(feedDir, batch.where(col("doc_id") % 20 =!= 3),
        "01_second.parquet", base + 10000)
      java.nio.file.Files.write(done.toPath,
        sourceSig(sfDir).getBytes("UTF-8"))
    }
    feedDir
  }

  def readFeed(spark: SparkSession, feedDir: String): DataFrame =
    spark.readStream
      .schema(feedSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(feedDir)
}
