package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Codebook-drift policy for the PQ index family — the product-
  * quantization analogue of [[IvfMaintenance]]'s centroid-drift
  * counters.
  *
  * The stored codebooks were trained on the corpus as it looked at
  * build time. Appended batches encode against those FROZEN codebooks
  * (that is what keeps ingest cheap: resident code partitions never
  * rewrite), so a distribution shift in the arriving vectors shows up
  * as rising QUANTIZATION DISTORTION — the squared L2 between a
  * vector's sub-vectors and the codewords it quantized to. Recall
  * decays with distortion (ADC ranks by the codeword, not the
  * vector), so distortion is the observable that tells maintenance
  * when the codebooks stopped describing the data.
  *
  * Policy (mirrors IvfMaintenance's shape): measure the mean
  * distortion of a REFERENCE slice (what the codebooks were trained
  * on) and of the APPENDED slice; fire when the ratio crosses
  * `ratioThreshold` (default 2.0 — appended vectors quantize twice as
  * badly as the training data). The report is side-effect-free; the
  * escape hatch is a codebook re-train + full re-encode, which is the
  * same two plan shapes as the original build at any corpus size.
  *
  * Cost: one broadcast join (PqM x PqK codebook rows) + one partial-
  * aggregated average per measured slice — linear in the slice, zero
  * index IO beyond the codebooks.
  */
object PqMaintenance {

  final val DefaultRatioThreshold = 2.0

  final case class PqDriftReport(
      baseAvgDistortion: Double,
      appendedAvgDistortion: Double,
      ratio: Double,
      retrain: Boolean)

  private val M = graft.queries.SimilarityQueries.PqM
  private val D = graft.queries.SimilarityQueries.PqSubDim

  private def subRows(df: DataFrame): DataFrame =
    df.select(col("vec_id"),
      posexplode(array((0 until M).map(m =>
        array((0 until D).map(i =>
          element_at(col("embedding"), m * D + i + 1)
            .cast(DoubleType)): _*)): _*)).as(Seq("m", "sv")))

  private def l2(a: Column, b: Column): Column =
    (1 to D).map { i =>
      val d = element_at(a, i) - element_at(b, i)
      d * d
    }.reduce(_ + _)

  /** Mean quantization distortion of `vectors` (vec_id, embedding)
    * against the STORED codebooks at `codebooksPath`: each sub-vector
    * is assigned to its nearest codeword (the encode rule — min L2,
    * ties to the lower code) and the winning squared L2s average over
    * all (vector, subspace) pairs. One broadcast join + one
    * aggregation. */
  def distortion(s: SparkSession, codebooksPath: String,
      vectors: DataFrame): Double = {
    val cb = s.read.parquet(codebooksPath)
    val winner = subRows(vectors)
      .join(broadcast(cb), Seq("m"))
      .withColumn("d", l2(col("sv"), col("cv")))
      .groupBy("vec_id", "m")
      .agg(min(col("d")).as("d"))
    winner.agg(avg(col("d"))).head.getDouble(0)
  }

  /** Side-effect-free drift report: distortion of the appended slice
    * vs the reference (training-time) slice against the same stored
    * codebooks. `retrain` fires when appended/reference crosses the
    * threshold — the codebooks stopped describing the arriving data. */
  def driftReport(s: SparkSession, codebooksPath: String,
      reference: DataFrame, appended: DataFrame,
      ratioThreshold: Double = DefaultRatioThreshold): PqDriftReport = {
    val base = distortion(s, codebooksPath, reference)
    val app = distortion(s, codebooksPath, appended)
    val ratio = if (base == 0.0) Double.PositiveInfinity else app / base
    PqDriftReport(base, app, ratio, retrain = ratio > ratioThreshold)
  }
}
