package graft.delta.scan

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.delta.Snapshot
import graft.delta.log.Actions.DeletionVectorDescriptor
import graft.delta.log.LogSegment

/** Assembles the user-facing DataFrame for a snapshot:
  *
  *   prune file list (stats + partition values, distributed)
  *     → collect surviving file paths (only the pruned list)
  *     → ONE parquet scan over all files with the physical schema
  *     → physical→logical rename (column mapping, nested rebuild)
  *     → partition-value injection via a broadcast join on file path
  *     → deletion-vector row filter on _metadata.row_index
  *     → residual predicate
  *
  * The reference does the same work as a custom exec node applying a
  * per-file transform expression (reference: crates/datafusion/src/
  * table_provider/delta/exec.rs:25-237, mod.rs:90-149). In Spark the
  * per-file dispatch collapses: name-based parquet resolution imputes
  * missing columns, and the per-file parts (partition values, DV) key off
  * `_metadata.file_path` — a single scan, no N-way union, so the plan
  * shape is independent of file count (100 TB-safe).
  */
object DeltaScan {

  /** `size`/`modTime` are the log-recorded FileStatus halves (AddFile
    * carries both per the protocol); -1 = unknown, which drops that
    * scan back to the listing path. */
  final case class ScanFile(
      relPath: String,
      partitionValues: Map[String, String],
      dv: Option[DeletionVectorDescriptor],
      size: Long = -1L,
      modTime: Long = -1L)

  private val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** DV row filtering switches from the codegen-friendly broadcast
    * anti-join to the compressed-bitmap UDF above this many deleted
    * rows (the pair expansion of a huge DV would dwarf the bitmaps). */
  private val DvAntiJoinMaxRows = 100000L

  /** Join keys between `_metadata.file_path` (a percent-encoded URI)
    * and driver-built paths: the SQL side strips the scheme but keeps
    * the URI encoding; the driver side re-encodes the raw on-disk path
    * the same way (File.toURI: %XX for space/%/non-ASCII). */
  private def normalizeExpr(c: Column): Column =
    regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")
  private def normalize(p: Path): String =
    new java.io.File(p.toUri.getPath).toURI.getRawPath.stripSuffix("/")

  def prunedFiles(snapshot: Snapshot, filters: Seq[Column]): DataFrame =
    StatsSkipping.prune(snapshot, snapshot.allFiles, filters)

  /** Name of the per-row provenance column exposed by `buildWithFileKey`
    * (the normalized path of the file the row came from). */
  final val FileKeyColumn = "_graft_file"

  /** Name of the per-row PHYSICAL position column exposed by
    * `buildWithRowIndex` — the parquet row index within the file the
    * row came from, i.e. exactly the coordinate a deletion vector
    * addresses. Rows already masked by an existing DV never appear in
    * the scan, so indexes collected from this column can be unioned
    * into the file's DV without overlap. */
  final val RowIndexColumn = "_graft_row_index"

  /** Scan that keeps row provenance — used by copy-on-write commands
    * (MERGE) to locate the files that contain matching rows. */
  def buildWithFileKey(snapshot: Snapshot): DataFrame =
    build(snapshot, Seq.empty, withFileColumn = true)

  /** Scan that keeps (file, physical row index) provenance — used by
    * merge-on-read DML to build deletion vectors for matching rows. */
  def buildWithRowIndex(snapshot: Snapshot): DataFrame =
    build(snapshot, Seq.empty, withFileColumn = true, withRowIndex = true)

  /** User-facing row-tracking columns (fresh row ids). */
  final val RowIdColumn = "_row_id"
  final val RowCommitVersionColumn = "_row_commit_version"

  /** Scan carrying fresh row-tracking columns: `_row_id` = the file's
    * baseRowId + the row's physical index (stable across DV-masked
    * DML — surviving rows never move), `_row_commit_version` = the
    * commit that created the row's file. The per-file id map is
    * metadata-bounded and broadcast; the id arithmetic is one codegen'd
    * projection over the normal scan. */
  def buildWithRowIds(snapshot: Snapshot): DataFrame = {
    val spark = snapshot.spark
    val fs = graft.delta.log.LogSegment.fs(spark, snapshot.tablePath)
    val qualified = fs.makeQualified(snapshot.tablePath)
    val idRows = snapshot.allFiles
      .select("path", "baseRowId", "defaultRowCommitVersion").collect()
    val missing = idRows.filter(_.isNullAt(1)).map(_.getString(0))
    require(missing.isEmpty,
      s"row tracking: ${missing.length} live file(s) lack baseRowId " +
        s"(e.g. '${missing.headOption.getOrElse("")}') — written by an " +
        "engine without the rowTracking feature? Fresh ids cannot be " +
        "derived")
    import spark.implicits._
    val idMap = idRows.toSeq.map { r =>
      (normalize(new Path(qualified, r.getString(0))), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))
    }.toDF(FileKeyColumn, "__base_row_id", "__row_cv")
    buildWithRowIndex(snapshot)
      .join(broadcast(idMap), Seq(FileKeyColumn))
      .withColumn(RowIdColumn, col("__base_row_id") + col(RowIndexColumn))
      .withColumn(RowCommitVersionColumn,
        when(col("__row_cv") >= 0, col("__row_cv")))
      .drop(FileKeyColumn, RowIndexColumn, "__base_row_id", "__row_cv")
  }

  /** Restrict a provenance-keyed scan to rows from the given files — a
    * broadcast semi-join on [[FileKeyColumn]], NOT an `isin`: a DML/MERGE
    * touching 10⁶ files would otherwise build a 10⁶-element In-literal
    * expression tree on the driver, while the broadcast hash relation
    * ships the same keys as compact data. */
  def whereFileKeyIn(df: DataFrame, keys: Iterable[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyDf = spark.createDataset(keys.toSeq).toDF(FileKeyColumn)
    df.join(broadcast(keyDf), Seq(FileKeyColumn), "left_semi")
  }

  def build(snapshot: Snapshot, filters: Seq[Column],
      withFileColumn: Boolean = false,
      withRowIndex: Boolean = false): DataFrame = {
    val scanFiles: Seq[ScanFile] = prunedFiles(snapshot, filters)
      .select("path", "partitionValues", "deletionVector", "size",
        "modificationTime")
      .collect().toSeq.map { r =>
        ScanFile(
          r.getAs[String]("path"),
          Option(r.getAs[Map[String, String]]("partitionValues"))
            .getOrElse(Map.empty),
          Option(r.getAs[Row]("deletionVector")).map(parseDv),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))
      }
    assemble(snapshot, scanFiles, filters, withFileColumn, withRowIndex)
  }

  /** Scan an EXPLICIT file list through the snapshot's schema machinery
    * (column mapping, partition values, DVs) — the files need not be
    * live in the snapshot (the streaming source reads a commit's adds
    * even if a later rewrite already removed them from the log; the
    * data files exist until VACUUM). */
  def buildForFiles(snapshot: Snapshot, scanFiles: Seq[ScanFile]): DataFrame =
    assemble(snapshot, scanFiles, Seq.empty, withFileColumn = false)

  private def assemble(snapshot: Snapshot, scanFiles: Seq[ScanFile],
      filters: Seq[Column], withFileColumn: Boolean,
      withRowIndex: Boolean = false): DataFrame = {
    val spark = snapshot.spark
    val logical = snapshot.schema
    val partCols = snapshot.partitionColumns

    if (scanFiles.isEmpty) {
      // an empty table still needs the provenance columns the caller
      // asked for (DML on an empty table groups by them)
      val extra =
        (if (withFileColumn) Seq(StructField(FileKeyColumn, StringType))
         else Nil) ++
        (if (withRowIndex) Seq(StructField(RowIndexColumn, LongType))
         else Nil)
      val empty = spark.createDataFrame(
        new java.util.ArrayList[Row](), StructType(logical.fields ++ extra))
      return applyResidual(empty, filters)
    }

    val fs = LogSegment.fs(spark, snapshot.tablePath)
    val qualifiedTable = fs.makeQualified(snapshot.tablePath)
    def abs(rel: String): Path = {
      val p = new Path(rel)
      if (p.isAbsolute) p else new Path(qualifiedTable, rel)
    }

    val dataFields = logical.fields.filterNot(f => partCols.contains(f.name))
    val mappingMode = ColumnMapping.mode(snapshot.metadata)
    val physicalDataSchema =
      ColumnMapping.toPhysicalSchema(StructType(dataFields), mappingMode)

    val needDv = scanFiles.exists(_.dv.isDefined)
    val needPart = partCols.nonEmpty

    // the driver holds DV DESCRIPTORS only (path/offset/size — bytes
    // per file), never an accumulated bitmap map: the surgical planner
    // and the small-DV expansion load one bitmap at a time and drop it,
    // and the large-DV mask decodes in the tasks that read each file
    // (DvTaskFilter) — so a scan over thousands of heavy-DV files never
    // concentrates sum-of-bitmap bytes in driver heap
    val dvDescriptors: Map[String, DeletionVectorDescriptor] =
      if (!needDv) Map.empty
      else scanFiles.flatMap(f =>
        f.dv.map(d => normalize(abs(f.relPath)) -> d)).toMap

    // the small-DV mask path will decode every bitmap on the driver
    // anyway (bounded by the anti-join cap); on that path the surgical
    // planner RETAINS what it decoded so the mask never re-reads a DV.
    // On the large path nothing is retained — the mask decodes in tasks.
    val totalDeleted = scanFiles.flatMap(_.dv).map(_.cardinality).sum
    val smallDvPath = totalDeleted <= DvAntiJoinMaxRows
    val plannedBitmaps =
      new java.util.concurrent.ConcurrentHashMap[String, DvBitmap.Bitmap]()

    // surgical row-group skip: files whose DV kills whole row groups
    // read through byte-ranged splits that never decode the dead groups
    val hconf = org.apache.spark.sql.graftshim.Shims
      .hadoopConfWithOptions(spark, Map.empty)
    val surgical: Map[String, (Seq[(Long, Long)], Int, Int)] =
      if (!needDv || !DvRowGroupSkip.enabled(spark)) Map.empty
      else {
        val minDel = DvRowGroupSkip.minDeleted(spark)
        val candidates = scanFiles
          .filter(_.dv.exists(_.cardinality >= minDel))
        // footer reads are independent metadata I/O — run them on the
        // global pool so a scan with many heavy-DV files doesn't
        // serialize per-file round trips on the driver
        import scala.concurrent.{Await, ExecutionContext, Future}
        implicit val ec: ExecutionContext = ExecutionContext.global
        Await.result(
          Future.traverse(candidates) { f => Future {
            val key = normalize(abs(f.relPath))
            // transient on the large path; kept for the mask on the
            // small path (where total decoded rows are capped anyway)
            val bm = DvBitmap.load(fs, qualifiedTable, dvDescriptors(key))
            if (smallDvPath) plannedBitmaps.put(key, bm)
            DvRowGroupSkip.liveRanges(fs, abs(f.relPath), bm, hconf)
              .map(key -> _)
          }},
          scala.concurrent.duration.Duration.Inf).flatten.toMap
      }
    if (surgical.nonEmpty) {
      DvRowGroupSkip.lastSkipped.set(surgical.values.map(_._2.toLong).sum)
      DvRowGroupSkip.lastDecoded.set(
        surgical.values.map(v => (v._3 - v._2).toLong).sum)
    }
    val normalScanFiles =
      scanFiles.filterNot(f => surgical.contains(normalize(abs(f.relPath))))

    // the log IS the file inventory: when every surviving file carries
    // its log-recorded (size, mtime) — the protocol requires both — the
    // scan relation is built directly over those statuses, so planning
    // does ZERO filesystem listing/stat calls (spark.read.parquet would
    // re-stat every path per scan, and past 32 paths launch a
    // distributed listing job per read — the k-NN join family's driver
    // floor, r17). Files lacking a recorded status (foreign writers)
    // fall back to the listing read.
    // measurement escape hatch (tools only): force the old listing
    // path so the A/B is reproducible — not a tuning knob
    val forceListing = sys.env.contains("GRAFT_SCAN_FORCE_LISTING")
    val statusesKnown = !forceListing &&
      normalScanFiles.forall(f => f.size >= 0 && f.modTime >= 0)
    var df =
      if (statusesKnown && normalScanFiles.nonEmpty)
        org.apache.spark.sql.graftshim.Shims.parquetScanFromStatuses(
          spark, physicalDataSchema,
          normalScanFiles.map(f => (abs(f.relPath), f.size, f.modTime)))
      else spark.read
        .schema(physicalDataSchema)
        .parquet(normalScanFiles.map(f => abs(f.relPath).toString): _*)

    val helperCols = Seq.newBuilder[Column]
    if (needPart || needDv || withFileColumn)
      helperCols += normalizeExpr(col("_metadata.file_path")).as("__fkey")
    if (needDv || withRowIndex)
      helperCols += col("_metadata.row_index").as("__row_index")

    val logicalDataCols = dataFields.zip(physicalDataSchema.fields).map {
      case (lf, pf) => ColumnMapping.toLogicalColumn(pf, lf)
    }
    df = df.select((logicalDataCols ++ helperCols.result()).toIndexedSeq: _*)

    if (surgical.nonEmpty) {
      // surgical files union in AFTER the physical->logical projection:
      // their frame already carries __fkey/__row_index (same provenance
      // contract), and a surgical scan implies needDv, so both helper
      // columns exist on the normal side too
      val surgicalFiles = scanFiles
        .filter(f => surgical.contains(normalize(abs(f.relPath))))
        .map { f =>
          val absPath = abs(f.relPath)
          val key = normalize(absPath)
          val st = fs.getFileStatus(absPath)
          (absPath, key, surgical(key)._1, st.getModificationTime, st.getLen)
        }
      val sdf = DvRowGroupSkip.scan(spark, physicalDataSchema, surgicalFiles)
      val sSel = sdf.select(
        (logicalDataCols :+ col("__fkey") :+ col("__row_index"))
          .toIndexedSeq: _*)
      df = (if (normalScanFiles.isEmpty) sSel else df.unionByName(sSel))
    }

    if (needPart) {
      // file -> partition values, broadcast-joined: one hash lookup per
      // row, plan shape independent of partition count.
      val partSchema = StructType(
        StructField("__fkey", StringType) +:
          partCols.map(c => StructField(s"__pv_$c", StringType)))
      // partitionValues keys follow the protocol: PHYSICAL names under
      // column mapping (fall back to the logical key for tolerance of
      // pre-convention writers)
      val rows = scanFiles.map { f =>
        Row.fromSeq(normalize(abs(f.relPath)) +:
          partCols.map(c => f.partitionValues
            .get(ColumnMapping.physicalPartitionName(snapshot.metadata, c))
            .orElse(f.partitionValues.get(c)).orNull))
      }
      val rowList = new java.util.ArrayList[Row](rows.size)
      rows.foreach(rowList.add)
      val partDF = spark.createDataFrame(rowList, partSchema)
      df = df.join(broadcast(partDF), Seq("__fkey"), "left")
      for (c <- partCols) {
        val dt = logical(c).dataType
        df = df.withColumn(c,
          when(col(s"__pv_$c") === HiveDefaultPartition, lit(null))
            .otherwise(col(s"__pv_$c")).cast(dt))
      }
      df = df.drop(partCols.map(c => s"__pv_$c"): _*)
    }

    if (needDv) {
      if (smallDvPath) {
        // small-DV path (the overwhelmingly common case: DVs mark a few
        // deleted rows per file): materialize the deleted (file, row)
        // pairs and drop them with a broadcast LEFT ANTI join — a plain
        // BroadcastHashJoin that stays inside whole-stage codegen,
        // unlike a per-row Scala UDF which fences it
        val delSchema = StructType(Seq(
          StructField("__fkey", StringType),
          StructField("__row_index", LongType)))
        val delRows = new java.util.ArrayList[Row](totalDeleted.toInt)
        for ((k, d) <- dvDescriptors) {
          // transient decode, bounded by DvAntiJoinMaxRows total;
          // surgical candidates reuse the planner's decode
          val bm = Option(plannedBitmaps.get(k))
            .getOrElse(DvBitmap.load(fs, qualifiedTable, d))
          bm.iterator.foreach(i => delRows.add(Row(k, i)))
        }
        df = df.join(broadcast(spark.createDataFrame(delRows, delSchema)),
          Seq("__fkey", "__row_index"), "left_anti")
      } else {
        // large-DV path: ship descriptors, decode IN THE TASKS that
        // read each file (per-executor bounded cache) — driver memory
        // stays O(files) and decode work lands where the rows are read,
        // the executor-side placement production Delta readers use.
        // The probe is a NATIVE expression (DvKeep): one generated
        // method call per row inside the fused stage, where the Scala
        // UDF it replaced fenced whole-stage codegen on exactly the
        // path with the most rows
        val keep = org.apache.spark.sql.graftshim.Shims.column(
          DvKeep(
            org.apache.spark.sql.graftshim.Shims.expression(col("__fkey")),
            org.apache.spark.sql.graftshim.Shims.expression(
              col("__row_index")),
            qualifiedTable.toUri.toString, dvDescriptors,
            new DvTaskFilter.SerHadoopConf(hconf)))
        df = df.where(keep)
      }
    }

    if (withFileColumn) df = df.withColumn(FileKeyColumn, col("__fkey"))
    if (withRowIndex) df = df.withColumn(RowIndexColumn, col("__row_index"))
    df = df.drop("__fkey", "__row_index")
    val outCols = logical.fieldNames.toIndexedSeq ++
      (if (withFileColumn) Seq(FileKeyColumn) else Seq.empty) ++
      (if (withRowIndex) Seq(RowIndexColumn) else Seq.empty)
    df = df.select(outCols.map(col): _*)
    applyResidual(df, filters)
  }

  private def applyResidual(df: DataFrame, filters: Seq[Column]): DataFrame =
    if (filters.isEmpty) df else df.where(filters.reduce(_ && _))

  private def parseDv(r: Row): DeletionVectorDescriptor =
    DeletionVectorDescriptor(
      storageType = r.getAs[String]("storageType"),
      pathOrInlineDv = r.getAs[String]("pathOrInlineDv"),
      offset = Option(r.getAs[java.lang.Integer]("offset")).map(_.intValue()),
      sizeInBytes = r.getAs[Int]("sizeInBytes"),
      cardinality = r.getAs[Long]("cardinality"))
}
