package graft.delta.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.execution.datasources.{NoopCache, PartitionDirectory, PartitionPath, PartitionSpec, PartitioningAwareFileIndex}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String
import graft.delta.Snapshot
import graft.delta.log.LogSegment
import graft.delta.scan.StatsSkipping

/** Delta-log-backed `FileIndex` — the DSv2 scan's source of file splits.
  *
  * Spark's planner calls `listFiles(partitionFilters, dataFilters)` at
  * plan time; this index serves it entirely from log metadata:
  *
  *  - `FileStatus`es are BUILT from add-action fields (path, size,
  *    modificationTime) — zero filesystem RPCs regardless of file count
  *    (at 100 TB a listing of millions of objects is the scan-planning
  *    bottleneck this avoids);
  *  - partition pruning uses the log's partitionValues (hive-style dirs
  *    grouped into `PartitionSpec`), evaluated by Spark's own pruner;
  *  - data filters additionally run through the SAME stats-skipping
  *    engine as the v1 path (min/max/nullCount per file), so a pushed
  *    predicate prunes whole files before any parquet footer is read.
  *
  * The reference's analogue is the scan-unit stream handed to its exec
  * node (crates/datafusion/src/table_provider/delta/mod.rs:90-149); the
  * driver-resident live-file list mirrors production Delta readers'
  * driver index and is metadata-only (~100 bytes/file).
  */
final class GraftDeltaFileIndex(spark: SparkSession, snapshot: Snapshot)
    extends PartitioningAwareFileIndex(
      spark, Map.empty, Some(snapshot.schema), NoopCache) {

  private val qualifiedTable: Path =
    LogSegment.fs(spark, snapshot.tablePath).makeQualified(snapshot.tablePath)

  private def absPath(rel: String): Path = {
    val p = new Path(rel)
    if (p.isAbsolute) p else new Path(qualifiedTable, rel)
  }

  private val partCols: Seq[String] = snapshot.partitionColumns

  /** (absolute path, synthesized status, partition values) per live file. */
  private lazy val live: Array[(Path, FileStatus, Map[String, String])] =
    snapshot.allFiles
      .select("path", "size", "modificationTime", "partitionValues")
      .collect().map { r =>
        val p = absPath(r.getString(0))
        val st = new FileStatus(r.getLong(1), false, 1, 128L * 1024 * 1024,
          r.getLong(2), p)
        (p, st,
          Option(r.getAs[Map[String, String]](3)).getOrElse(Map.empty))
      }

  override def rootPaths: Seq[Path] = Seq(qualifiedTable)

  override def refresh(): Unit = () // a snapshot is immutable

  override lazy val leafFiles
      : scala.collection.mutable.LinkedHashMap[Path, FileStatus] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Path, FileStatus]
    live.foreach { case (p, st, _) => m.put(p, st) }
    m
  }

  override lazy val leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    live.groupBy(_._1.getParent).map { case (dir, fs) =>
      dir -> fs.map(_._2)
    }

  override lazy val partitionSpec: PartitionSpec = {
    if (partCols.isEmpty) PartitionSpec.emptySpec
    else {
      val partSchema = StructType(partCols.map(c => snapshot.schema(c)))
      val tz = Option(spark.conf.get("spark.sql.session.timeZone"))
      val dirs = live.groupBy(_._1.getParent).toSeq.map { case (dir, fs) =>
        val pv = fs.head._3
        val values = InternalRow.fromSeq(partCols.map { c =>
          pv.get(c).filterNot(_ == "__HIVE_DEFAULT_PARTITION__") match {
            case None => null
            case Some(raw) => Cast(
              Literal(UTF8String.fromString(raw), StringType),
              partSchema(c).dataType, tz).eval(InternalRow.empty)
          }
        })
        PartitionPath(values, dir)
      }
      PartitionSpec(partSchema, dirs)
    }
  }

  /** Partition pruning via Spark's evaluator (super), then stats-based
    * file skipping with the pushed data filters — the v1 path's pruning
    * engine, reached through the public Filter → Column translation so
    * both paths share one skipping implementation. */
  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    val cols = dataFilters
      .flatMap(e => org.apache.spark.sql.graftshim.Shims.translateFilter(e))
      .flatMap(f => FilterColumns.toColumn(f))
    val out =
      if (cols.isEmpty) base
      else {
        val kept = StatsSkipping
          .prune(snapshot, snapshot.allFiles, cols)
          .select("path").collect().map(r => absPath(r.getString(0)).toString)
          .toSet
        base.map { pd =>
          PartitionDirectory(pd.values,
            pd.files.filter(f => kept.contains(f.getPath.toString)))
        }.filter(_.files.nonEmpty)
      }
    GraftDeltaFileIndex.recordList(partitionFilters.size,
      dataFilters.size, out.map(_.files.length).sum)
    out
  }
}

object GraftDeltaFileIndex {
  /** Test observability: the last 32 `listFiles` calls in this JVM as
    * (partitionFilterCount, dataFilterCount, filesReturned) — a
    * runtime-filtered (DPP) execution shows up as a call with an extra
    * partition filter returning a pruned file count. Bounded ring, so
    * a long-lived session never accumulates. */
  private val listCalls =
    new java.util.ArrayDeque[(Int, Int, Long)](33)
  private[graft] def recordList(nPart: Int, nData: Int,
      files: Long): Unit = listCalls.synchronized {
    if (listCalls.size >= 32) listCalls.removeFirst()
    listCalls.addLast((nPart, nData, files))
  }
  private[graft] def recentLists: Seq[(Int, Int, Long)] =
    listCalls.synchronized {
      scala.jdk.CollectionConverters.IteratorHasAsScala(
        listCalls.iterator).asScala.toList
    }
  private[graft] def clearListLog(): Unit =
    listCalls.synchronized(listCalls.clear())
}
