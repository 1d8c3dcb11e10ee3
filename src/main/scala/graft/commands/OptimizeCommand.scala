package graft.commands

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.delta.DeltaTable
import graft.delta.log.{Actions, CommitWriter}

/** OPTIMIZE: bin-packing compaction (beyond-parity lakehouse command —
  * the reference has no write path at all; at 100 TB the small-file
  * problem this solves is the dominant scan-cost pathology for
  * training-data tables).
  *
  * Partitions (or the whole table, if unpartitioned) containing at
  * least `minFiles` files below `targetFileSize` are rewritten through
  * the full read path (deletion vectors applied, schema normalized) and
  * committed as remove+add with dataChange=false, so concurrent readers
  * see identical rows and history stays time-travelable.
  */
object OptimizeCommand {

  val DefaultTargetFileSize: Long = 128L * 1024 * 1024

  /** Z-order clustering value: per-column rank quantized to 16 bits,
    * bit-interleaved across columns. Sorting the rewrite by this value
    * clusters correlated ranges into the same files, which is what
    * makes min/max file skipping effective on multiple columns at
    * once. Ranks come from ntile over each column — types just need an
    * ordering. */
  private def zorderValue(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets = 1 << 16
    val ranked = cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(s"__rank_$i",
        ntile(buckets).over(Window.orderBy(col(c))) - 1)
    }
    // interleave bit b of every column: position b*n + i
    val n = cols.length
    val interleaved = (0 until 16).flatMap { b =>
      (0 until n).map { i =>
        (shiftright(col(s"__rank_$i"), b) % 2).cast("long") *
          lit(1L << (b * n + i))
      }
    }.reduce(_ + _)
    ranked.withColumn("__z", interleaved)
  }

  def optimize(spark: SparkSession, tablePath: String,
      targetFileSize: Long = DefaultTargetFileSize,
      minFiles: Int = 2,
      zorderBy: Seq[String] = Seq.empty): DataFrame = {
    val snap = DeltaTable.forPath(spark, tablePath)
    val partCols = snap.partitionColumns

    val files = snap.allFiles
      .select("path", "partitionValues", "size")
      .collect()
      .map(r => (r.getAs[String]("path"),
        Option(r.getAs[Map[String, String]]("partitionValues"))
          .getOrElse(Map.empty), r.getAs[Long]("size")))

    val byPartition = files.groupBy(_._2)
    val toCompact = byPartition.filter { case (_, fs) =>
      // a z-order request rewrites every qualifying partition even if
      // already compact (re-clustering is the point)
      fs.count(_._3 < targetFileSize) >= minFiles ||
        (zorderBy.nonEmpty && fs.nonEmpty)
    }

    if (toCompact.isEmpty) return metrics(spark, 0, 0, 0)

    var removed = 0
    var added = 0
    val actions = Seq.newBuilder[String]
    for ((partValues, partFiles) <- toCompact) {
      val df =
        if (partCols.isEmpty) snap.read
        else {
          val preds = partCols.map { c =>
            partValues.get(c) match {
              case Some(v) => col(c) === lit(v).cast(snap.schema(c).dataType)
              case None => col(c).isNull
            }
          }
          snap.readWhere(preds: _*)
        }
      // rewrite the partition as one file per shuffle-partition-sized
      // chunk (local fixtures compact to 1)
      val chunks = math.max(1,
        (partFiles.map(_._3).sum / math.max(targetFileSize, 1L)).toInt)
      val rewritten =
        if (zorderBy.isEmpty) df.coalesce(chunks)
        else zorderValue(df, zorderBy)
          .repartitionByRange(chunks, col("__z"))
          .sortWithinPartitions("__z")
          .drop((zorderBy.indices.map(i => s"__rank_$i") :+ "__z"): _*)
      val adds = CommitWriter.writeFiles(spark, rewritten,
        tablePath, partCols, dataChange = false)
      val now = System.currentTimeMillis()
      partFiles.foreach { case (p, _, _) =>
        actions += CommitWriter.removeJson(
          Actions.RemoveFile(p, Some(now), dataChange = false))
        removed += 1
      }
      adds.foreach { a => actions += CommitWriter.addJson(a); added += 1 }
    }
    CommitWriter.commit(spark, tablePath, snap.version + 1,
      actions.result(), operation = "OPTIMIZE")
    metrics(spark, toCompact.size, removed, added)
  }

  private def metrics(spark: SparkSession, partitions: Int,
      removed: Int, added: Int): DataFrame = {
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row("partitions_optimized", partitions.toString))
    rows.add(Row("files_removed", removed.toString))
    rows.add(Row("files_added", added.toString))
    spark.createDataFrame(rows, VacuumCommand.metricsSchema)
  }
}
