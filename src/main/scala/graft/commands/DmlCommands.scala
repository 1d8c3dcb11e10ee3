package graft.commands

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.delta.DeltaTable
import graft.delta.log.{Actions, CommitWriter}
import graft.delta.scan.DeltaScan

/** Row-level DELETE and UPDATE, file-granular copy-on-write (the same
  * shape as MERGE): the provenance scan finds exactly the files with
  * matching rows; only those are rewritten. Beyond-parity — the
  * reference is read-only.
  */
object DmlCommands {

  /** DELETE FROM table WHERE condition. */
  def delete(spark: SparkSession, tablePath: String,
      condition: Column): DataFrame =
    rewrite(spark, tablePath, condition, "DELETE",
      keep = df => df.where(!coalesce(condition, lit(false))))

  /** UPDATE table SET col = expr, ... WHERE condition. */
  def update(spark: SparkSession, tablePath: String, condition: Column,
      set: Map[String, Column]): DataFrame = {
    val identity = graft.delta.log.IdentityColumns.of(
      graft.delta.DeltaTable.forPath(spark, tablePath).metadata)
      .map(_.name.toLowerCase).toSet
    val touched = set.keys.filter(k => identity(k.toLowerCase))
    require(touched.isEmpty,
      s"UPDATE cannot set identity column(s) ${touched.mkString(", ")} " +
        "(GENERATED ALWAYS); existing values ride the rewrite unchanged")
    rewrite(spark, tablePath, condition, "UPDATE",
      keep = df => {
        val cond = coalesce(condition, lit(false))
        set.foldLeft(df) { case (d, (name, value)) =>
          d.withColumn(name, when(cond, value).otherwise(col(name)))
        }
      })
  }

  /** Shared copy-on-write: rewrite the affected files with `keep`
    * applied, remove the originals, one commit. */
  private def rewrite(spark: SparkSession, tablePath: String,
      condition: Column, operation: String,
      keep: DataFrame => DataFrame): DataFrame = {
    val snap = DeltaTable.forPath(spark, tablePath)
    graft.delta.log.ProtocolSupport.assertWritable(
      tablePath, snap.metadata, snap.protocol, dataChangingRemoves = true)
    require(graft.delta.scan.ColumnMapping.mode(snap.metadata) == "none",
      s"$operation on column-mapped tables is not supported (the " +
        "rewrite would need logical->physical projection per file)")
    val target = DeltaScan.buildWithFileKey(snap)

    val affected = target.where(condition)
      .select(DeltaScan.FileKeyColumn).distinct()
      .collect().map(_.getString(0)).toSet

    if (affected.isEmpty) return metrics(spark, 0, 0, operation)

    val fs = graft.delta.log.LogSegment.fs(spark, snap.tablePath)
    val qualified = fs.makeQualified(snap.tablePath)
    def normKey(rel: String): String = {
      val p = new org.apache.hadoop.fs.Path(qualified, rel)
      new java.io.File(p.toUri.getPath).toURI.getRawPath.stripSuffix("/")
    }
    val affectedRel = snap.allFiles.collect()
      .map(_.getAs[String]("path"))
      .filter(rel => affected.contains(normKey(rel)))

    val rewritten = keep(DeltaScan.whereFileKeyIn(target, affected))
      .select(snap.schema.fieldNames.map(col).toIndexedSeq: _*)

    // UPDATE can manufacture a violating row; guard the rewrite inline.
    // Generated columns are recomputed so base-column updates flow into
    // them (the spec's "generated columns are updated" rule).
    val adds = CommitWriter.writeFiles(spark,
      graft.delta.log.Constraints.enforce(
        graft.delta.log.GeneratedColumns.recompute(rewritten, snap.metadata),
        snap.metadata),
      tablePath, snap.partitionColumns)
    val now = System.currentTimeMillis()
    val removes = affectedRel.map(p => CommitWriter.removeJson(
      Actions.RemoveFile(p, Some(now), dataChange = true)))
    CommitWriter.commit(spark, tablePath, snap.version + 1,
      removes.toIndexedSeq ++ adds.map(CommitWriter.addJson), operation)
    metrics(spark, affectedRel.length, adds.size, operation)
  }

  private def metrics(spark: SparkSession, rewritten: Int, added: Int,
      operation: String): DataFrame = {
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row("operation", operation))
    rows.add(Row("files_rewritten", rewritten.toString))
    rows.add(Row("files_added", added.toString))
    spark.createDataFrame(rows, VacuumCommand.metricsSchema)
  }
}
