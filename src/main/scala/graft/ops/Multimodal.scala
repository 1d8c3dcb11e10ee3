package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition.
  *
  * The decode step is a clearly-marked STUB (no codec libraries in this
  * container): `decodeStub` derives deterministic fake dimensions/frames
  * from the payload bytes. The Spark-side plumbing is real — schema,
  * partition-iterator batch shape, typed Dataset in/out — so swapping in
  * a real decoder is a one-function change.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  case class Decoded(width: Int, height: Int, frames: Seq[Long])

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      fingerprint: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** STUB — a real implementation would invoke an image/audio codec.
    * Deterministic fake: dimensions from the first payload bytes, frame
    * samples = every-32nd byte ("frame-sample" shape without a codec). */
  def decodeStub(payload: Array[Byte]): Decoded = {
    val w = 64 + (if (payload.nonEmpty) payload(0) & 0xFF else 0)
    val h = 64 + (if (payload.length > 1) payload(1) & 0xFF else 0)
    val frames = payload.indices.by(32).take(8)
      .map(i => (payload(i) & 0xFF).toLong)
    Decoded(w, h, frames)
  }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** Batch feature extraction: one codec init per partition (the real
    * cost model for media decode), streaming over rows. */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition setup would initialize the codec once here
      rows.map { r =>
        val d = decodeStub(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          md5Hex(r.payload), d.width, d.height, d.frames.length)
      }
    }
  }

  /** Frame sampling: media row -> one row per sampled frame. */
  def sampleFrames(ds: Dataset[MediaRow]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      decodeStub(r.payload).frames.zipWithIndex.map { case (v, i) =>
        (r.media_id, r.kind, i, v)
      }
    }.toDF("media_id", "kind", "frame_idx", "sample")
  }

  /** Synthesize a media table from the documents fixture: text bytes as
    * the opaque payload, kinds cycled deterministically. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }
}
