package graft.delta.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, Row, SQLContext, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import graft.delta.DeltaTable

/** `spark.read.format("graftdelta")` — data-source integration for the
  * graft Delta read path.
  *
  * The Spark analogue of the reference's `TableProvider` registration
  * (reference: crates/datafusion/src/table_provider/delta/mod.rs:90-149):
  * Spark hands projection + filters to `buildScan`
  * (PrunedFilteredScan), which routes them through stats-based file
  * skipping and partition pruning before any parquet is opened; the
  * same predicates stay applied row-level (the reference's Inexact
  * filter contract), so Spark's re-evaluation above the scan is a
  * no-op semantically but keeps correctness obvious.
  *
  * Options: `path` (required), `versionAsOf` (optional time travel).
  */
class GraftDeltaSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graftdelta"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graftdelta requires a path"))
    val versionAsOf = parameters.get("versionAsOf").map(_.toLong)
    GraftDeltaRelation(sqlContext.sparkSession, path, versionAsOf)
  }

  /** Write path: df.write.format("graftdelta").mode(...).save(path).
    * ErrorIfExists/Ignore look for an existing _delta_log; Append adds
    * a commit; Overwrite removes the previous live files and adds the
    * new ones in one commit (logical overwrite — old versions stay
    * time-travelable until VACUUM). */
  override def createRelation(sqlContext: SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): BaseRelation = {
    import org.apache.spark.sql.SaveMode
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graftdelta requires a path"))
    val partitionCols = parameters.get("partitionBy")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(Seq.empty)
    val existing = scala.util.Try(DeltaTable.forPath(spark, path)).toOption

    (mode, existing) match {
      case (SaveMode.ErrorIfExists, Some(_)) =>
        throw new IllegalStateException(s"Delta table already exists: $path")
      case (SaveMode.Ignore, Some(_)) => ()
      case (_, None) =>
        graft.delta.log.CommitWriter.createTable(spark, data, path,
          partitionColumns = partitionCols)
      case (SaveMode.Append, Some(_)) =>
        graft.delta.log.CommitWriter.append(spark, data, path)
      case (SaveMode.Overwrite, Some(snap)) =>
        val oldPaths = snap.allFiles.select("path")
          .collect().map(_.getString(0)).toSeq
        val adds = graft.delta.log.CommitWriter.writeFiles(
          spark, data, path, snap.partitionColumns)
        val now = System.currentTimeMillis()
        val removes = oldPaths.map(p =>
          graft.delta.log.CommitWriter.removeJson(
            graft.delta.log.Actions.RemoveFile(p, Some(now), dataChange = true)))
        graft.delta.log.CommitWriter.commit(spark, path, snap.version + 1,
          removes ++ adds.map(graft.delta.log.CommitWriter.addJson),
          operation = "WRITE")
      case _ => ()
    }
    GraftDeltaRelation(spark, path, None)
  }
}

final case class GraftDeltaRelation(
    spark: SparkSession,
    path: String,
    versionAsOf: Option[Long]) extends BaseRelation with PrunedFilteredScan {

  private def snapshot = DeltaTable.forPath(spark, path, versionAsOf)

  override def sqlContext: SQLContext = spark.sqlContext

  override val schema: StructType = snapshot.schema

  /** All filters are handled best-effort (file skipping) but none are
    * guaranteed exact — Spark must re-apply everything. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val pushed = filters.flatMap(toColumn)
    val snap = snapshot
    val df = if (pushed.isEmpty) snap.read else snap.readWhere(pushed.toIndexedSeq: _*)
    val projected =
      if (requiredColumns.isEmpty) df
      else df.select(requiredColumns.map(col).toIndexedSeq: _*)
    projected.rdd
  }

  /** public sources.Filter → Column (only shapes our skipping layer
    * understands; the rest are left for Spark's own evaluation). */
  private def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === v)
    case GreaterThan(a, v) => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v) => Some(col(a) < v)
    case LessThanOrEqual(a, v) => Some(col(a) <= v)
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, p) => Some(col(a).startsWith(p))
    case And(l, r) => for {lc <- toColumn(l); rc <- toColumn(r)} yield lc && rc
    case Or(l, r) => for {lc <- toColumn(l); rc <- toColumn(r)} yield lc || rc
    case Not(c) => toColumn(c).map(!_)
    case _ => None
  }
}
