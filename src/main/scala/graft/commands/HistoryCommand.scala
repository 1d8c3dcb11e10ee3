package graft.commands

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import com.fasterxml.jackson.databind.ObjectMapper
import graft.delta.DeltaTable
import graft.delta.log.{Actions, CommitWriter, LogSegment}

/** DESCRIBE HISTORY + RESTORE: table history from commitInfo lines and
  * version rollback as a new commit (standard lakehouse maintenance
  * surface; the reference is read-only so both are beyond-parity). */
object HistoryCommand {
  private val mapper = new ObjectMapper()

  /** Rows the last restore() brought to the driver — pinned by
    * RestoreSpec to the DIFF size, guarding against a regression to
    * full-inventory collects. */
  @volatile private[graft] var collectedForTest: Long = -1L

  val historySchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("timestamp", LongType, nullable = true),
    StructField("operation", StringType, nullable = true),
    StructField("engine_info", StringType, nullable = true),
    StructField("operation_parameters", StringType, nullable = true),
    StructField("n_actions", LongType, nullable = false)))

  val detailSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("description", StringType, nullable = true),
    StructField("location", StringType, nullable = false),
    StructField("createdAt", LongType, nullable = true),
    StructField("lastModified", LongType, nullable = true),
    StructField("partitionColumns", ArrayType(StringType), nullable = false),
    StructField("clusteringColumns", ArrayType(StringType),
      nullable = false),
    StructField("numFiles", LongType, nullable = false),
    StructField("sizeInBytes", LongType, nullable = false),
    StructField("properties", MapType(StringType, StringType),
      nullable = false),
    StructField("minReaderVersion", IntegerType, nullable = false),
    StructField("minWriterVersion", IntegerType, nullable = false)))

  /** DESCRIBE DETAIL: one metadata row for the current snapshot. File
    * count/bytes are a distributed aggregation over the live-file list;
    * timestamps come from commit mtimes (same clock DESCRIBE HISTORY
    * reports). */
  def detail(spark: SparkSession, tablePath: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val snap = DeltaTable.forPath(spark, tablePath)
    val agg = snap.allFiles
      .agg(count(lit(1)), coalesce(sum(col("size")), lit(0L))).head
    val fs = LogSegment.fs(spark, new Path(tablePath))
    val mtimes = fs.listStatus(new Path(tablePath, "_delta_log")).toSeq
      .flatMap(st => LogSegment.commitVersion(st.getPath.getName)
        .map(_ => st.getModificationTime))
    val row = Row(
      snap.metadata.format.provider,
      snap.metadata.id,
      snap.metadata.name.orNull,
      snap.metadata.description.orNull,
      tablePath,
      snap.metadata.createdTime
        .map(Long.box).getOrElse(
          if (mtimes.isEmpty) null else Long.box(mtimes.min)),
      if (mtimes.isEmpty) null else Long.box(mtimes.max),
      snap.partitionColumns,
      graft.delta.log.Clustering.columnsOf(spark, snap.segment),
      agg.getLong(0),
      agg.getLong(1),
      snap.metadata.configuration,
      snap.protocol.minReaderVersion,
      snap.protocol.minWriterVersion)
    spark.createDataFrame(java.util.Arrays.asList(row), detailSchema)
  }

  /** One row per commit, newest first (driver-side: the commit list is
    * the log tail, bounded). */
  def history(spark: SparkSession, tablePath: String): DataFrame = {
    val fs = LogSegment.fs(spark, new Path(tablePath))
    val logPath = new Path(tablePath, "_delta_log")
    val commits = fs.listStatus(logPath).toSeq
      .flatMap(st => LogSegment.commitVersion(st.getPath.getName).map(_ -> st))
      .sortBy(-_._1)
    val rows = new java.util.ArrayList[Row](commits.size)
    for ((version, st) <- commits) {
      val in = fs.open(st.getPath)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toVector finally in.close()
      val ci = lines.filter(_.nonEmpty).map(mapper.readTree)
        .find(_.has("commitInfo")).map(_.get("commitInfo"))
      rows.add(Row(version,
        ci.flatMap(c => Option(c.get("timestamp")).map(_.asLong()))
          .map(Long.box).orNull,
        ci.flatMap(c => Option(c.get("operation")).map(_.asText())).orNull,
        ci.flatMap(c => Option(c.get("engineInfo")).map(_.asText())).orNull,
        // raw minified JSON of commitInfo.operationParameters (the
        // ecosystem-standard operation metadata: DML predicates, merge
        // keys) — null for commits that recorded none
        ci.flatMap(c => Option(c.get("operationParameters"))
          .map(_.toString)).orNull,
        lines.count(_.nonEmpty).toLong - ci.size))
    }
    spark.createDataFrame(rows, historySchema)
  }

  /** Restore the table to `version`: one commit removing files not in
    * the target version and re-adding files the target had (data files
    * are never touched, so the restore itself is time-travelable). */
  def restore(spark: SparkSession, tablePath: String,
      version: Long): DataFrame = {
    val current = DeltaTable.forPath(spark, tablePath)
    graft.delta.log.ProtocolSupport.assertWritable(
      tablePath, current.metadata, current.protocol,
      dataChangingRemoves = true)
    require(version <= current.version,
      s"Cannot restore to future version $version (latest ${current.version})")
    val target = DeltaTable.forPath(spark, tablePath, Some(version))

    // The diff is computed DISTRIBUTED and only the changed rows are
    // collected: at 10^7 files, a restore that touches 100 of them
    // brings 100 rows to the driver, not two full inventories. The
    // DV identity join key mirrors DeletionVectorDescriptor.uniqueId.
    import org.apache.spark.sql.functions.{coalesce, col, concat, lit}
    val dvIdCol = coalesce(
      concat(col("deletionVector.storageType"),
        col("deletionVector.pathOrInlineDv"),
        coalesce(concat(lit("@"),
          col("deletionVector.offset").cast("string")), lit(""))),
      lit(""))
    val curKeys = current.allFiles
      .select(col("path"), dvIdCol.as("__cur_dv"))
    val tgtKeys = target.allFiles
      .select(col("path"), dvIdCol.as("__tgt_dv"))

    val now = System.currentTimeMillis()
    // removes carry the removed version's DV descriptor (protocol's
    // remove.deletionVector) so LITE vacuums reclaim them post-checkpoint
    val removedRows = current.allFiles
      .join(tgtKeys.select("path"), Seq("path"), "left_anti")
      .select("path", "deletionVector")
      .collect().sortBy(_.getString(0))
    val removedPaths = removedRows.map(_.getString(0))
    val removes = removedRows.toSeq.map(r => CommitWriter.removeJson(
      Actions.RemoveFile(r.getString(0), Some(now), dataChange = true,
        deletionVector = DmlCommands.dvDescriptorOf(r))))

    // re-add files the target had, AND files present in both versions
    // whose deletion vector differs (a path-only diff would silently keep
    // the current DV, resurrecting or re-deleting rows); the re-add
    // carries the target's DV so the restored snapshot masks exactly the
    // target's deleted rows
    val readdRows = target.allFiles
      .withColumn("__tgt_dv", dvIdCol)
      .join(curKeys, Seq("path"), "left")
      .where(col("__cur_dv").isNull || col("__cur_dv") =!= col("__tgt_dv"))
      .drop("__cur_dv", "__tgt_dv")
      .collect().sortBy(_.getAs[String]("path"))
    collectedForTest = removedPaths.length.toLong + readdRows.length
    val adds = readdRows.toSeq
      .map { r =>
        val p = r.getAs[String]("path")
        CommitWriter.addJson(Actions.AddFile(
          path = p,
          partitionValues = Option(r.getAs[Map[String, String]]("partitionValues"))
            .getOrElse(Map.empty),
          size = r.getAs[Long]("size"),
          modificationTime = r.getAs[Long]("modificationTime"),
          dataChange = true,
          stats = Option(r.getAs[String]("stats")),
          deletionVector = DmlCommands.dvDescriptorOf(r),
          // restored rows keep their identities (same physical files)
          baseRowId = Option(r.getAs[java.lang.Long]("baseRowId"))
            .map(_.longValue()),
          defaultRowCommitVersion =
            Option(r.getAs[java.lang.Long]("defaultRowCommitVersion"))
              .map(_.longValue())))
      }
    // restoring an older schema re-publishes its metaData too
    val metaAction =
      if (target.metadata.schemaString != current.metadata.schemaString)
        Seq(CommitWriter.metadataJson(target.metadata))
      else Seq.empty

    // RESTORE's actions were computed from the FULL current live set, so
    // any concurrent data change is a real conflict (typed); only a
    // content-neutral winner (pure SetTransaction) permits a rebase.
    // readsWholeTable stands in for the READ inventory (O(1) on the
    // driver); removePaths is the restore's own remove set — already
    // collected as the diff — so a del/del race keeps its
    // ConcurrentDeleteDelete classification.
    CommitWriter.commitWithRebase(spark, tablePath, current.version,
      metaAction ++ removes ++ adds, operation = s"RESTORE VERSION $version",
      profile = graft.delta.log.ConflictChecker.TxnProfile(
        removePaths = removedPaths.toSet,
        dependsOnNewData = true, readsWholeTable = true))

    val rows = new java.util.ArrayList[Row]()
    rows.add(Row("restored_to_version", version.toString))
    rows.add(Row("files_removed", removes.size.toString))
    rows.add(Row("files_added", adds.size.toString))
    spark.createDataFrame(rows, VacuumCommand.metricsSchema)
  }
}
