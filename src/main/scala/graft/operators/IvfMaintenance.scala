package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Drift policy for an incrementally-maintained IVF index.
  *
  * Incremental appends assign new vectors to EXISTING centroids
  * (graft.queries.SimilarityQueries.ivfIncrementalIndexPath), so the
  * centroid set slowly stops describing the data it routes: recall
  * decays as the appended fraction grows, and hot partitions stop
  * pruning. This module is the documented re-train trigger the index
  * needs at 100 TB:
  *
  *  - every build/append records per-cid row counters in a sidecar
  *    (`<index>_maint/{base,appends}` — metadata-bounded: one row per
  *    centroid per append, never vectors);
  *  - [[driftReport]] computes the appended/base ratio and the
  *    partition-size skew from those counters alone — zero index IO;
  *  - the trigger fires PER CID: any centroid whose own
  *    `appended/base > ratioThreshold` (default 0.2), or — under
  *    `max partition rows > skewThreshold × avg` (default 4.0) — the
  *    oversized partitions;
  *  - [[maybeRetrain]] then RE-CENTERS only the touched centroids: each
  *    one becomes the per-dimension mean of its partition's CURRENT
  *    rows — one aggregation over the touched partitions only (the
  *    appended mass pulls the routing vector back onto the data it
  *    routes), the centroid file is rewritten (it is broadcast-sized by
  *    construction), and the appended counters fold into base so the
  *    trigger re-arms. Untouched partitions are never read or written.
  *
  * A full re-cluster (new centroid COUNT, rows reshuffled) remains the
  * offline escape hatch when re-centering stops recovering recall —
  * that is a rebuild, not maintenance, and is intentionally out of
  * scope here.
  */
object IvfMaintenance {

  final val DefaultRatioThreshold = 0.2
  final val DefaultSkewThreshold = 4.0

  case class DriftReport(
      baseRows: Long,
      appendedRows: Long,
      ratio: Double,
      skew: Double,
      touched: Seq[Long],
      retrain: Boolean)

  private def maintDir(indexPath: String) = s"${indexPath}_maint"
  private def basePath(indexPath: String) = s"${maintDir(indexPath)}/base"
  private def appendsPath(indexPath: String) =
    s"${maintDir(indexPath)}/appends"

  /** Record the base build's per-cid row counts (schema: cid, rows).
    * Resets any prior append history — a fresh build starts undrifted. */
  def recordBase(spark: SparkSession, indexPath: String,
      counts: DataFrame): Unit = {
    counts.select(col("cid").cast("long"), col("rows").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(basePath(indexPath))
    val ap = new java.io.File(appendsPath(indexPath))
    if (ap.exists()) scala.reflect.io.Directory(ap).deleteRecursively()
  }

  /** Record one incremental append's per-cid row counts. */
  def recordAppend(spark: SparkSession, indexPath: String,
      counts: DataFrame): Unit =
    counts.select(col("cid").cast("long"), col("rows").cast("long"))
      .coalesce(1).write.mode("append").parquet(appendsPath(indexPath))

  /** Compute drift from the counters alone — no index IO. */
  def driftReport(spark: SparkSession, indexPath: String,
      ratioThreshold: Double = DefaultRatioThreshold,
      skewThreshold: Double = DefaultSkewThreshold): DriftReport = {
    val base = spark.read.parquet(basePath(indexPath))
      .groupBy("cid").agg(sum("rows").as("base_rows"))
    val appends =
      if (!new java.io.File(appendsPath(indexPath)).exists())
        base.select(col("cid"), lit(0L).as("app_rows")).limit(0)
      else spark.read.parquet(appendsPath(indexPath))
        .groupBy("cid").agg(sum("rows").as("app_rows"))
    // counters are O(centroids) — driver-resident by design, the same
    // bound as the broadcast centroid set itself
    val merged = base.join(appends, Seq("cid"), "full_outer")
      .select(col("cid"),
        coalesce(col("base_rows"), lit(0L)).as("b"),
        coalesce(col("app_rows"), lit(0L)).as("a"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val baseTotal = merged.map(_._2).sum
    val appTotal = merged.map(_._3).sum
    val ratio = if (baseTotal == 0) Double.PositiveInfinity
      else appTotal.toDouble / baseTotal
    val totals = merged.map(t => t._2 + t._3)
    val avg = if (merged.isEmpty) 0.0 else totals.sum.toDouble / merged.length
    val skew = if (avg == 0.0) 0.0 else totals.max / avg
    val skewFired = skew > skewThreshold
    // The trigger is PER-CID: a single hot centroid in a 10k-centroid
    // index never moves the global appended fraction, yet its partition
    // is exactly the one whose routing vector has stopped describing
    // its contents. touched = centroids whose OWN appended share
    // crossed the ratio bar (an append-only cid is infinitely over it),
    // plus (under a skew trigger) the oversized partitions. Re-centering
    // costs O(touched partitions), so firing often on small partitions
    // is cheap by construction.
    val touched = merged.collect {
      case (cid, b, a)
        if (b > 0 && a.toDouble / b > ratioThreshold) ||
          (b == 0 && a > 0) ||
          (skewFired && avg > 0 && (b + a) > skewThreshold * avg) => cid
    }.toSeq.sorted
    DriftReport(baseTotal, appTotal, ratio, skew, touched,
      retrain = touched.nonEmpty)
  }

  /** Evaluate the trigger and, when it fires, re-center the touched
    * centroids from their partitions' current rows. Returns the report
    * that drove the decision. `dim` is the embedding dimensionality. */
  def maybeRetrain(spark: SparkSession, indexPath: String,
      centroidsPath: String, dim: Int,
      ratioThreshold: Double = DefaultRatioThreshold,
      skewThreshold: Double = DefaultSkewThreshold): DriftReport = {
    val report = driftReport(spark, indexPath, ratioThreshold, skewThreshold)
    if (!report.retrain) return report
    val touched = report.touched
    // one aggregation over ONLY the touched cid partitions (static
    // partition prune on the read path — `touched` is O(centroids))
    val recentered = spark.read.parquet(indexPath)
      // hive partition-column inference may narrow cid to int: normalize
      .withColumn("cid", col("cid").cast("long"))
      .where(col("cid").isInCollection(touched))
      .groupBy("cid")
      .agg(array((1 to dim).map(i =>
        avg(element_at(col("embedding"), i).cast(DoubleType))): _*).as("cv"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Double](1))
      .toMap
    // centroid set is broadcast-sized by construction: materialize,
    // patch, rewrite atomically via overwrite
    val old = spark.read.parquet(centroidsPath).collect()
      .map(r => (r.getLong(r.fieldIndex("cid")),
        r.getSeq[Double](r.fieldIndex("cv"))))
    val patched = old.map { case (cid, cv) =>
      (cid, recentered.getOrElse(cid, cv))
    }
    import spark.implicits._
    patched.toSeq.toDF("cid", "cv")
      .coalesce(1).write.mode("overwrite").parquet(centroidsPath)
    // fold ONLY the touched cids' appends into base — an untouched cid
    // keeps its append history, so drift it accumulated below the bar
    // (say 19% each cycle) still counts toward its OWN future trigger
    // instead of being silently erased every time another cid fires
    val touchedSet = touched.toSet
    val appendRows: Seq[(Long, Long)] = {
      val ap = appendsPath(indexPath)
      if (!new java.io.File(ap).exists()) Seq.empty
      else spark.read.parquet(ap).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val foldIn = appendRows.filter(t => touchedSet(t._1))
      .groupBy(_._1).map { case (cid, rs) => cid -> rs.map(_._2).sum }
    val keep = appendRows.filterNot(t => touchedSet(t._1))
    val baseRows = spark.read.parquet(basePath(indexPath))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val baseCids = baseRows.map(_._1).toSet
    val folded = baseRows
      .map { case (cid, b) => (cid, b + foldIn.getOrElse(cid, 0L)) } ++
      // a touched cid that had NO base row (append-only cid) folds in
      // as its own base entry
      foldIn.filterNot { case (cid, _) => baseCids(cid) }
    folded.toSeq.toDF("cid", "rows")
      .coalesce(1).write.mode("overwrite").parquet(basePath(indexPath))
    val ap = new java.io.File(appendsPath(indexPath))
    if (ap.exists()) scala.reflect.io.Directory(ap).deleteRecursively()
    if (keep.nonEmpty)
      keep.toDF("cid", "rows")
        .coalesce(1).write.mode("append").parquet(appendsPath(indexPath))
    report
  }
}
