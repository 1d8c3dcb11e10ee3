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
  *    (`<index>_maint/` — metadata-bounded: one row per centroid per
  *    append, never vectors);
  *  - [[driftReport]] computes the appended/base ratio and the
  *    partition-size skew from those counters alone — zero index IO;
  *  - the trigger fires PER CID: any centroid whose own
  *    `appended/base > ratioThreshold` (default 0.2) — a single hot
  *    centroid in a 10k-centroid index never moves the global
  *    fraction, yet its partition is exactly the one whose routing
  *    vector stopped describing its contents. Partition-size skew
  *    (`max partition rows > skewThreshold × avg`, default 4.0) is
  *    REPORT-ONLY (`skewAlert`/`skewCids`): re-centering cannot shrink
  *    an oversized partition — and because the counter fold leaves
  *    partition totals (and thus skew) unchanged, a skew-driven
  *    retrain would re-fire on every call while rewriting an identical
  *    centroid file; the remedy is the full-re-cluster escape hatch
  *    below;
  *  - [[maybeRetrain]] then RE-CENTERS only the touched centroids: each
  *    one becomes the per-dimension mean of its partition's CURRENT
  *    rows — one aggregation over the touched partitions only (the
  *    appended mass pulls the routing vector back onto the data it
  *    routes), the centroid file is rewritten (it is broadcast-sized by
  *    construction), and ONLY the touched cids' appended counters fold
  *    into base — an untouched cid keeps its append history, so drift
  *    it accumulated below the bar still counts toward its OWN future
  *    trigger instead of being erased every time another cid fires.
  *
  * Sidecar durability: the counters live in immutable versioned state
  * dirs (`state_v<N>/` holding (kind, cid, rows) rows) selected by a
  * CURRENT pointer file that is swapped with an atomic rename — a crash
  * at ANY point leaves CURRENT on the previous consistent state (no
  * lost history, no double-counted folds); superseded state dirs are
  * swept best-effort after the swap.
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
      retrain: Boolean,
      skewAlert: Boolean = false,
      skewCids: Seq[Long] = Nil)

  /** Per-cid counter state: base rows and appended rows. */
  private case class State(counts: Map[Long, (Long, Long)]) {
    def baseTotal: Long = counts.valuesIterator.map(_._1).sum
    def appendTotal: Long = counts.valuesIterator.map(_._2).sum
  }

  private def maintDir(indexPath: String) = s"${indexPath}_maint"
  private def currentFile(indexPath: String) =
    new java.io.File(maintDir(indexPath), "CURRENT")

  private def readCurrentVersion(indexPath: String): Long = {
    val f = currentFile(indexPath)
    if (!f.exists()) -1L
    else new String(java.nio.file.Files.readAllBytes(f.toPath),
      "UTF-8").trim.toLong
  }

  private def stateDir(indexPath: String, v: Long) =
    s"${maintDir(indexPath)}/state_v$v"

  private def loadState(spark: SparkSession, indexPath: String): State = {
    val v = readCurrentVersion(indexPath)
    require(v >= 0, s"no maintenance state recorded under " +
      s"${maintDir(indexPath)} — recordBase must run at index build")
    val rows = spark.read.parquet(stateDir(indexPath, v)).collect()
    State(rows.groupBy(_.getLong(1)).map { case (cid, rs) =>
      val base = rs.filter(_.getString(0) == "base").map(_.getLong(2)).sum
      val app = rs.filter(_.getString(0) == "append").map(_.getLong(2)).sum
      cid -> (base, app)
    })
  }

  /** In-process concurrency: every public operation is a read-modify-
    * write over the state pointer, so they serialize on one lock —
    * without it two concurrent recordAppend calls would both load v1
    * and the second write would erase the first's counts. Cross-process
    * writers are out of scope (index maintenance is a single job by
    * construction); the atomic CURRENT swap covers crash recovery. */
  private val opLock = new Object

  /** Write a new state version and atomically swap CURRENT to it. */
  private def writeState(spark: SparkSession, indexPath: String,
      counts: Map[Long, (Long, Long)]): Unit = {
    import spark.implicits._
    val prev = readCurrentVersion(indexPath)
    val next = prev + 1
    val rows = counts.toSeq.flatMap { case (cid, (b, a)) =>
      Seq(("base", cid, b)) ++ (if (a > 0) Seq(("append", cid, a)) else Nil)
    }
    rows.toDF("kind", "cid", "rows")
      .coalesce(1).write.mode("overwrite")
      .parquet(stateDir(indexPath, next))
    val cur = currentFile(indexPath)
    cur.getParentFile.mkdirs()
    val tmp = new java.io.File(cur.getParentFile, s"CURRENT.tmp$next")
    java.nio.file.Files.write(tmp.toPath, next.toString.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath, cur.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // superseded states are garbage once the pointer moved; best-effort
    if (prev >= 0) {
      val old = new java.io.File(stateDir(indexPath, prev))
      if (old.exists())
        scala.util.Try(scala.reflect.io.Directory(old).deleteRecursively())
    }
  }

  /** Record the base build's per-cid row counts (schema: cid, rows).
    * Resets any prior append history — a fresh build starts undrifted. */
  def recordBase(spark: SparkSession, indexPath: String,
      counts: DataFrame): Unit = opLock.synchronized {
    // sum duplicate cid rows (unaggregated per-partition counts are a
    // legal input — recordAppend accepts them, so base must too)
    val base = counts.select(col("cid").cast("long"), col("rows").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (cid, rs) => cid -> (rs.map(_._2).sum, 0L) }
    writeState(spark, indexPath, base)
  }

  /** Record one incremental append's per-cid row counts. */
  def recordAppend(spark: SparkSession, indexPath: String,
      counts: DataFrame): Unit = opLock.synchronized {
    val add = counts.select(col("cid").cast("long"), col("rows").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cur = loadState(spark, indexPath).counts
    val next = add.foldLeft(cur) { case (m, (cid, n)) =>
      val (b, a) = m.getOrElse(cid, (0L, 0L))
      m + (cid -> (b, a + n))
    }
    writeState(spark, indexPath, next)
  }

  private def report(state: State, ratioThreshold: Double,
      skewThreshold: Double): DriftReport = {
    val merged = state.counts.toSeq.map { case (cid, (b, a)) => (cid, b, a) }
    val baseTotal = state.baseTotal
    val appTotal = state.appendTotal
    val ratio = if (baseTotal == 0) Double.PositiveInfinity
      else appTotal.toDouble / baseTotal
    val totals = merged.map(t => t._2 + t._3)
    val avg = if (merged.isEmpty) 0.0 else totals.sum.toDouble / merged.length
    val skew = if (avg == 0.0) 0.0 else totals.max / avg
    val skewFired = skew > skewThreshold
    // skew is REPORT-ONLY: re-centering cannot fix an oversized
    // partition (the fold leaves every partition's total — and thus the
    // skew — unchanged, so a skew-driven retrain would re-fire forever
    // while re-writing an identical centroid file). A partition that
    // dwarfs the average needs the full-re-cluster escape hatch (a new
    // centroid COUNT, rows reshuffled) — surfaced as skewAlert/skewCids
    // for the operator that owns that rebuild.
    val skewCids = if (skewFired && avg > 0) merged.collect {
      case (cid, b, a) if (b + a) > skewThreshold * avg => cid
    }.sorted else Nil
    val touched = merged.collect {
      case (cid, b, a)
        if (b > 0 && a.toDouble / b > ratioThreshold) ||
          (b == 0 && a > 0) => cid
    }.sorted
    DriftReport(baseTotal, appTotal, ratio, skew, touched,
      retrain = touched.nonEmpty,
      skewAlert = skewFired, skewCids = skewCids)
  }

  /** Compute drift from the counters alone — no index IO. The state is
    * O(centroids) — driver-resident by design, the same bound as the
    * broadcast centroid set itself. */
  def driftReport(spark: SparkSession, indexPath: String,
      ratioThreshold: Double = DefaultRatioThreshold,
      skewThreshold: Double = DefaultSkewThreshold): DriftReport =
    opLock.synchronized {
      report(loadState(spark, indexPath), ratioThreshold, skewThreshold)
    }

  /** Evaluate the trigger and, when it fires, re-center the touched
    * centroids from their partitions' current rows. Returns the report
    * that drove the decision. `dim` is the embedding dimensionality. */
  def maybeRetrain(spark: SparkSession, indexPath: String,
      centroidsPath: String, dim: Int,
      ratioThreshold: Double = DefaultRatioThreshold,
      skewThreshold: Double = DefaultSkewThreshold): DriftReport =
      opLock.synchronized {
    val state = loadState(spark, indexPath)
    val rep = report(state, ratioThreshold, skewThreshold)
    if (!rep.retrain) return rep
    val touched = rep.touched
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
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
      .toMap
    // centroid set is broadcast-sized by construction: materialize,
    // patch, and SWAP — a plain overwrite deletes the live dir before
    // writing, so a crash there would leave the index unroutable;
    // writing to a sibling and renaming keeps a complete centroid set
    // on disk (under one of the two names) at every instant
    val old = spark.read.parquet(centroidsPath).collect()
      .map(r => (r.getLong(r.fieldIndex("cid")),
        r.getSeq[Double](r.fieldIndex("cv"))))
    val patched = old.map { case (cid, cv) =>
      (cid, recentered.getOrElse(cid, cv))
    }
    import spark.implicits._
    val nextDir = new java.io.File(centroidsPath + "_next")
    if (nextDir.exists())
      scala.reflect.io.Directory(nextDir).deleteRecursively()
    patched.toSeq.toDF("cid", "cv")
      .coalesce(1).write.parquet(nextDir.getAbsolutePath)
    val dest = new java.io.File(centroidsPath)
    val prevDir = new java.io.File(centroidsPath + "_prev")
    if (prevDir.exists())
      scala.reflect.io.Directory(prevDir).deleteRecursively()
    if (dest.exists())
      java.nio.file.Files.move(dest.toPath, prevDir.toPath)
    java.nio.file.Files.move(nextDir.toPath, dest.toPath)
    scala.reflect.io.Directory(prevDir).deleteRecursively()
    // fold ONLY the touched cids' appends into base; the new state
    // lands via the atomic CURRENT swap, so a crash anywhere leaves
    // the previous consistent counters in place
    val touchedSet = touched.toSet
    val folded = state.counts.map { case (cid, (b, a)) =>
      if (touchedSet(cid)) cid -> (b + a, 0L) else cid -> (b, a)
    }
    writeState(spark, indexPath, folded)
    rep
  }

  private def splitMarker(indexPath: String, cid: Long) =
    new java.io.File(s"${indexPath}_split_pending_$cid")

  /** True when a prior [[splitCell]] of `cid` crashed mid-operation —
    * rows may exist under BOTH the old cell and its new sub-cells.
    * Heal by re-running splitCell for the same cid (it is restartable:
    * it first discards any partially-written sub-cell partitions the
    * marker lists). */
  def splitPending(indexPath: String, cid: Long): Boolean =
    splitMarker(indexPath, cid).exists()

  /** The SKEW escape hatch: re-cluster ONE oversized cell into `ways`
    * sub-cells. Skew is the one drift signal re-centering cannot fix
    * (moving a centroid never shrinks its partition), and the
    * full-corpus re-cluster is priced like a rebuild — but a fat cell
    * is a LOCAL problem, and this fixes it at O(cell) cost: read only
    * that cid's partition (static partition prune), k-means it into
    * `ways` sub-cells with the index build's own two plan shapes
    * (broadcast-assign + partial-aggregated means, empty-cluster
    * retention as in codebook training), append the sub-cell
    * partitions, drop the old one, patch the (broadcast-sized)
    * centroid file via sibling swap, and replace the cell's counters
    * with per-sub-cell base counts. At 100 TB this is the remedy the
    * skewAlert feeds: each fat cell costs one bounded job, probes keep
    * pruning throughout, and occupancy returns under the rerank-budget
    * rule (the PqResidualProbe finding: recall dies exactly when
    * occupancy dwarfs cand).
    *
    * Restartability: a `<index>_split_pending_<cid>` marker listing
    * the planned sub-cids brackets EVERY mutating step (partition
    * append, old-partition drop, centroid swap, counter replacement —
    * the marker is deleted last). Re-running splitCell for the same
    * cid heals any crash point by inspecting the physical state: while
    * the OLD partition still exists, the sub-cell partitions are
    * discardable duplicates — discard and redo the split from scratch;
    * once the old partition is gone, the sub-cell partitions are the
    * ONLY copy of the rows — the re-run ROLLS FORWARD instead
    * (restore the centroid file from its `_prev` sibling if a crash
    * landed mid-swap, re-derive the sub-centroids as their partitions'
    * means — the maybeRetrain re-center rule — patch centroids if the
    * crash preceded the swap, rewrite the counters idempotently, drop
    * the marker). Maintenance is a single job by construction (as
    * maybeRetrain); concurrent probes during the append→drop window
    * may transiently see a row under both cids — the same
    * read-during-maintenance caveat as the PQ retrain hatch.
    *
    * Returns the new sub-cell cids. */
  def splitCell(spark: SparkSession, indexPath: String,
      centroidsPath: String, cid: Long, ways: Int,
      dim: Int): Seq[Long] = opLock.synchronized {
    import spark.implicits._
    require(ways >= 2, s"splitting into $ways sub-cells is a no-op")
    val marker = splitMarker(indexPath, cid)
    val oldDir = new java.io.File(indexPath, s"cid=$cid")
    if (marker.exists() && !oldDir.isDirectory) {
      // post-drop crash: the sub-cell partitions are the only copy of
      // the cell's rows — roll the interrupted split forward, never
      // discard (discarding here was a data-loss bug)
      return rollForwardSplit(spark, indexPath, centroidsPath, cid, dim)
    }
    // a crash mid-swap can leave the centroid file only under _prev
    // even while the old partition survives (steps are not ordered
    // for concurrent failures of both) — restore before reading
    restoreCentroidsFromPrev(centroidsPath)
    val oldCentroids = spark.read.parquet(centroidsPath).collect()
      .map(r => (r.getLong(r.fieldIndex("cid")),
        r.getSeq[Double](r.fieldIndex("cv"))))
    require(oldCentroids.exists(_._1 == cid),
      s"cid $cid is not in the centroid set at $centroidsPath")
    // collision-free new ids: dense above the current max
    val newCids = {
      val maxCid = oldCentroids.map(_._1).max
      (1 to ways).map(maxCid + _.toLong)
    }
    // pre-drop restart: the old partition is intact, so partial
    // sub-cell partitions from the crashed attempt are duplicates —
    // discard and redo (the marker records ITS planned ids)
    if (marker.exists()) {
      markerCids(marker).foreach { c =>
        val d = new java.io.File(indexPath, s"cid=$c")
        if (d.exists())
          scala.reflect.io.Directory(d).deleteRecursively()
      }
    }
    // the fat cell's rows, fully materialized BEFORE any physical step
    // (the split must not re-read a partition it is about to drop).
    // Synthetic maintenance fixtures carry no label column — assignTo
    // requires one, so inject a dummy and drop it again on write.
    val raw = spark.read.parquet(indexPath)
    val hasLabel = raw.columns.contains("label")
    val cell = {
      val base = raw.withColumn("cid", col("cid").cast("long"))
        .where(col("cid") === cid)
      (if (hasLabel) base else base.withColumn("label", lit(0L)))
        .select("vec_id", "label", "embedding")
        .localCheckpoint()
    }
    val nRows = cell.count()
    require(nRows >= ways, s"cell $cid has $nRows rows < $ways ways")
    // within-cell k-means: seeds = the `ways` lowest vec_ids' vectors
    // (deterministic), two Lloyd passes of the index build's own plan
    // shapes; a sub-centroid that loses every assignment keeps its
    // previous position (the codebook-training retention rule) so the
    // split always yields exactly `ways` routable sub-cells
    val seedRows = cell.orderBy("vec_id").limit(ways).collect()
    var centroids = seedRows.zipWithIndex.map { case (r, i) =>
      // the index stores float embeddings; synthetic spec fixtures use
      // double — seed either way
      (newCids(i), r.getSeq[Any](r.fieldIndex("embedding")).map {
        case f: Float => f.toDouble
        case d: Double => d
        case other => throw new IllegalStateException(
          s"unexpected embedding element $other")
      })
    }.toSeq.toDF("cid", "cv")
    def assign(c: DataFrame): DataFrame =
      graft.queries.SimilarityQueries.assignTo(cell, c)
    for (_ <- 1 to 2) {
      val moved = assign(centroids).groupBy("cid")
        .agg(array((1 to dim).map(i =>
          avg(element_at(col("embedding"), i).cast(DoubleType))): _*)
          .as("cv"))
        .localCheckpoint()
      centroids = moved.unionByName(
        centroids.join(moved.select("cid"), Seq("cid"), "left_anti"))
    }
    val outCols =
      if (hasLabel) Seq(col("vec_id"), col("label"), col("embedding"),
        col("cid"))
      else Seq(col("vec_id"), col("embedding"), col("cid"))
    val assigned = assign(centroids)
      .select(outCols: _*)
      .localCheckpoint()
    // physical steps, bracketed by the pending marker (deleted LAST,
    // after the counters — so every crash point is re-armed)
    java.nio.file.Files.write(marker.toPath,
      newCids.mkString(",").getBytes("UTF-8"))
    assigned.write.mode("append").partitionBy("cid").parquet(indexPath)
    scala.reflect.io.Directory(oldDir).deleteRecursively()
    // centroid file patch via sibling swap (maybeRetrain's discipline)
    val cvByCid = centroids.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val patched = oldCentroids.filterNot(_._1 == cid) ++
      newCids.map(c => (c, cvByCid(c)))
    swapInCentroids(spark, centroidsPath, patched)
    // counters: the fat cell's entry is REPLACED by per-sub-cell base
    // counts (fresh cells start undrifted), via the atomic CURRENT swap
    val subCounts = assigned.groupBy("cid").count().collect()
      .map(r => r.getLong(0) -> (r.getLong(1), 0L)).toMap
    val state = loadState(spark, indexPath)
    writeState(spark, indexPath, (state.counts - cid) ++ subCounts)
    java.nio.file.Files.deleteIfExists(marker.toPath)
    newCids
  }

  private def markerCids(marker: java.io.File): Seq[Long] =
    new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8")
      .trim.split(",").filter(_.nonEmpty).map(_.toLong).toSeq

  /** A crash between the two renames of a centroid sibling swap leaves
    * the live name missing and the complete previous set under
    * `_prev` — restore it so readers (and the re-run) see a coherent
    * centroid file at every crash point. */
  private def restoreCentroidsFromPrev(centroidsPath: String): Unit = {
    val dest = new java.io.File(centroidsPath)
    val prev = new java.io.File(centroidsPath + "_prev")
    if (!dest.exists() && prev.exists())
      java.nio.file.Files.move(prev.toPath, dest.toPath)
  }

  /** Sibling-swap a new centroid set into place (a plain overwrite
    * deletes the live dir before writing — a crash there would leave
    * the index unroutable). */
  private def swapInCentroids(spark: SparkSession, centroidsPath: String,
      rows: Seq[(Long, Seq[Double])]): Unit = {
    import spark.implicits._
    val nextDir = new java.io.File(centroidsPath + "_next")
    if (nextDir.exists())
      scala.reflect.io.Directory(nextDir).deleteRecursively()
    rows.toDF("cid", "cv")
      .coalesce(1).write.parquet(nextDir.getAbsolutePath)
    val dest = new java.io.File(centroidsPath)
    val prevDir = new java.io.File(centroidsPath + "_prev")
    if (prevDir.exists())
      scala.reflect.io.Directory(prevDir).deleteRecursively()
    if (dest.exists())
      java.nio.file.Files.move(dest.toPath, prevDir.toPath)
    java.nio.file.Files.move(nextDir.toPath, dest.toPath)
    scala.reflect.io.Directory(prevDir).deleteRecursively()
  }

  /** Finish an interrupted split whose old partition is already gone:
    * the sub-cell partitions (the only copy of the rows) stay; the
    * centroid file is restored from `_prev` if the crash landed
    * mid-swap, then patched if the crash preceded the swap — the
    * re-derived sub-centroids are their partitions' per-dimension
    * means (the maybeRetrain re-center rule; the k-means' in-flight
    * routing vectors died with the crashed job, and partition means
    * are the canonical recovery of "the centroid of what this
    * partition actually holds"). Counters are rewritten idempotently;
    * the marker drops last. */
  private def rollForwardSplit(spark: SparkSession, indexPath: String,
      centroidsPath: String, cid: Long, dim: Int): Seq[Long] = {
    val marker = splitMarker(indexPath, cid)
    val newCids = markerCids(marker)
    val present = newCids.filter(c =>
      new java.io.File(indexPath, s"cid=$c").isDirectory)
    require(present.nonEmpty,
      s"split of cell $cid crashed after dropping the old partition " +
        s"but no sub-cell partition of $newCids exists under $indexPath " +
        "— the cell's rows are unrecoverable from this index alone")
    restoreCentroidsFromPrev(centroidsPath)
    val current = spark.read.parquet(centroidsPath).collect()
      .map(r => (r.getLong(r.fieldIndex("cid")),
        r.getSeq[Double](r.fieldIndex("cv"))))
    val needPatch = current.exists(_._1 == cid) ||
      !present.forall(c => current.exists(_._1 == c))
    if (needPatch) {
      val subMeans = spark.read.parquet(indexPath)
        .withColumn("cid", col("cid").cast("long"))
        .where(col("cid").isInCollection(present))
        .groupBy("cid")
        .agg(array((1 to dim).map(i =>
          avg(element_at(col("embedding"), i).cast(DoubleType))): _*)
          .as("cv"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      swapInCentroids(spark, centroidsPath,
        current.filterNot(t => t._1 == cid ||
          subMeans.exists(_._1 == t._1)).toSeq ++ subMeans)
    }
    // counters, idempotent recount of the sub-cells
    val subCounts = spark.read.parquet(indexPath)
      .withColumn("cid", col("cid").cast("long"))
      .where(col("cid").isInCollection(present))
      .groupBy("cid").count().collect()
      .map(r => r.getLong(0) -> (r.getLong(1), 0L)).toMap
    val state = loadState(spark, indexPath)
    writeState(spark, indexPath, (state.counts - cid) ++ subCounts)
    java.nio.file.Files.deleteIfExists(marker.toPath)
    present
  }
}
