package graft.delta.log

import org.apache.spark.sql.types.{StructField, StructType}

import Actions.{Metadata, Protocol}

/** Fail-closed protocol gates per the Delta table-features spec: a
  * reader MUST reject a table whose `readerFeatures` include anything
  * it does not implement (reading anyway returns silently wrong rows —
  * e.g. ignoring v2Checkpoint sidecars drops files), and a writer MUST
  * NOT commit to a table whose declared or version-implied writer
  * features it cannot honor (e.g. committing rows that violate a CHECK
  * constraint it never evaluated corrupts the table for every compliant
  * engine downstream).
  *
  * Reference boots the equivalent gate inside delta-kernel-rs when the
  * snapshot resolves (crates/datafusion/src/session.rs:169-191 resolves
  * through kernel's protocol check); here it lives at the same choke
  * points: [[graft.delta.DeltaTable.forPath]] for reads and every
  * commit-producing entry point for writes.
  */
object ProtocolSupport {

  /** Reader features implemented end-to-end in this engine.
    * `v2Checkpoint`: UUID-named sidecar checkpoints replay natively
    * ([[Replay]] resolves the manifest + `_sidecars`); the writer
    * obligation is honored by REFUSING to write a classic checkpoint
    * into a v2 table ([[CommitWriter.checkpoint]]) — commits are fine
    * (checkpointing is optional), a wrong-format checkpoint is not. */
  val SupportedReaderFeatures: Set[String] = Set(
    "deletionVectors", "columnMapping", "timestampNtz",
    "typeWidening", "typeWidening-preview", "vacuumProtocolCheck",
    "v2Checkpoint")

  /** Writer features this engine honors at commit time. `appendOnly`
    * is enforced at the commit choke point; `invariants` and
    * `checkConstraints` are ENFORCED inline on every data-writing path
    * ([[Constraints.enforce]] — a violating row aborts the write job
    * before any file is committed). */
  val SupportedWriterFeatures: Set[String] = Set(
    "appendOnly", "invariants", "checkConstraints", "generatedColumns",
    "identityColumns", "deletionVectors", "columnMapping", "timestampNtz",
    "typeWidening", "typeWidening-preview", "vacuumProtocolCheck",
    // changeDataFeed's writer obligation (cdc actions on data-changing
    // commits when the property is on) is honored fail-closed below:
    // such commits are refused outright, appends need no cdc actions
    "changeDataFeed",
    // v2Checkpoint's writer obligation (checkpoints must be v2) is
    // honored fail-closed in CommitWriter.checkpoint
    "v2Checkpoint",
    // monotonic commitInfo.inCommitTimestamp, stamped at the commit
    // choke point when delta.enableInCommitTimestamps=true
    "inCommitTimestamp",
    // fresh row ids: baseRowId on every add + the delta.rowTracking
    // high-water-mark domain, allocated at every data-writing path;
    // row-moving rewrites (CoW DML/MERGE, OPTIMIZE) are refused on
    // row-tracked tables so ids stay stable (RowTracking)
    "rowTracking",
    // named metadata domains: replayed (latest per domain), preserved
    // through checkpoints, written by row tracking
    "domainMetadata",
    // clustered tables: clustering columns in the delta.clustering
    // domain; OPTIMIZE re-clusters by them (Clustering). Writer-only
    // and advisory per spec — no read-side obligation
    "clustering",
    // column DEFAULT values: CURRENT_DEFAULT in field metadata,
    // materialized at write time into omitting batches (ColumnDefaults)
    "allowColumnDefaults")

  /** The protocol a table needs before row tracking may be written:
    * `rowTracking` plus its `domainMetadata` dependency. `None` when
    * both are already declared. */
  def withRowTracking(p: Protocol): Option[Protocol] = {
    val step = withWriterFeature(p, "domainMetadata")
    val fin = withWriterFeature(step.getOrElse(p), "rowTracking")
    fin.orElse(step)
  }

  /** Legacy writer versions imply feature sets without naming them;
    * upgrading to the table-features protocol must enumerate them so
    * no obligation is silently dropped (Delta PROTOCOL.md, table
    * features: "the upgrade must declare every feature the legacy
    * version implied"). */
  private def impliedWriterFeatures(minWriterVersion: Int): Seq[String] =
    Seq(2 -> "appendOnly", 2 -> "invariants", 3 -> "checkConstraints",
      4 -> "changeDataFeed", 4 -> "generatedColumns", 5 -> "columnMapping",
      6 -> "identityColumns")
      .collect { case (v, f) if minWriterVersion >= v => f }

  private def impliedReaderFeatures(minReaderVersion: Int): Seq[String] =
    if (minReaderVersion >= 2) Seq("columnMapping") else Nil

  /** The protocol a table needs before commits may carry `feature` (a
    * WRITER-only feature, e.g. `inCommitTimestamp`): minWriter 7 with
    * the feature declared, legacy-implied features enumerated, reader
    * side untouched. `None` when already declared. */
  def withWriterFeature(p: Protocol, feature: String): Option[Protocol] = {
    val writers = (if (p.minWriterVersion >= 7)
        p.writerFeatures.getOrElse(Nil)
      else impliedWriterFeatures(p.minWriterVersion)).toSet
    if (writers.contains(feature)) None
    else Some(p.copy(minWriterVersion = 7,
      writerFeatures = Some((writers + feature).toSeq.sorted)))
  }

  /** The protocol a table needs before `feature` — a READER+WRITER
    * table feature (e.g. `deletionVectors`, `v2Checkpoint`) — applies:
    * reader 3 / writer 7 with the feature in BOTH lists and
    * legacy-implied features enumerated. `None` when already
    * declared. */
  def withReaderWriterFeature(p: Protocol, feature: String)
      : Option[Protocol] = {
    val readers = (if (p.minReaderVersion >= 3)
        p.readerFeatures.getOrElse(Nil)
      else impliedReaderFeatures(p.minReaderVersion)).toSet
    val writers = (if (p.minWriterVersion >= 7)
        p.writerFeatures.getOrElse(Nil)
      else impliedWriterFeatures(p.minWriterVersion)).toSet
    if (readers.contains(feature) && writers.contains(feature)) None
    else Some(Protocol(3, 7,
      Some((readers + feature).toSeq.sorted),
      Some((writers + feature).toSeq.sorted)))
  }

  /** The protocol a table needs before deletion vectors may be written
    * (a legacy reader would silently resurrect deleted rows). */
  def withDeletionVectors(p: Protocol): Option[Protocol] =
    withReaderWriterFeature(p, "deletionVectors")

  /** True when the table requests write-time change-data files. */
  def cdfEnabled(meta: Metadata): Boolean =
    meta.configuration.get("delta.enableChangeDataFeed")
      .exists(_.equalsIgnoreCase("true"))

  def assertReadable(tablePath: String, proto: Protocol): Unit = {
    require(proto.minReaderVersion <= 3,
      s"Unsupported minReaderVersion ${proto.minReaderVersion} " +
        s"(max supported: 3) reading $tablePath")
    if (proto.minReaderVersion >= 3) {
      val unknown =
        proto.readerFeatures.getOrElse(Nil).toSet -- SupportedReaderFeatures
      require(unknown.isEmpty,
        s"Table $tablePath requires reader features this engine does not " +
          s"implement: ${unknown.toSeq.sorted.mkString(", ")}. Refusing to " +
          "read rather than return silently wrong results.")
    }
  }

  /** Gate every commit against an EXISTING table (fresh creates pick
    * this engine's own protocol and need no gate). Checks, in order:
    * declared writer features, then version-implied feature USE — a
    * legacy minWriterVersion implies generated/identity-column support
    * without naming it, so the metadata is searched for actual use
    * (recursively — the keys attach to NESTED fields too) and the
    * write refused only when semantics would be violated. CHECK
    * constraints and column invariants pass this gate: they are
    * enforced inline by [[Constraints.enforce]] on every data write.
    *
    * `dataChangingRemoves = true` marks commits that rewrite or delete
    * rows (DML/MERGE/overwrite/RESTORE). On a table with
    * `delta.enableChangeDataFeed=true` those commits must carry cdc
    * actions; callers that write them (DELETE/UPDATE/MERGE —
    * [[graft.commands.DmlCommands]]) pass `producesCdc = true`, the
    * rest (overwrite/RESTORE/OPTIMIZE-with-DVs) are refused — a
    * compliant CDF reader would serve wrong change data for the
    * commit. Pure appends stay allowed: inserts derive from add
    * actions per spec. */
  def assertWritable(tablePath: String, meta: Metadata,
      proto: Protocol, dataChangingRemoves: Boolean = false,
      producesCdc: Boolean = false): Unit = {
    assertReadable(tablePath, proto) // a writer replays the log first
    require(proto.minWriterVersion <= 7,
      s"Unsupported minWriterVersion ${proto.minWriterVersion} " +
        s"(max supported: 7) writing $tablePath")
    if (proto.minWriterVersion >= 7) {
      val unknown =
        proto.writerFeatures.getOrElse(Nil).toSet -- SupportedWriterFeatures
      require(unknown.isEmpty,
        s"Table $tablePath requires writer features this engine does not " +
          s"implement: ${unknown.toSeq.sorted.mkString(", ")}. Refusing to " +
          "write rather than break the table's contract.")
    }
    if (dataChangingRemoves && !producesCdc && cdfEnabled(meta))
      throw new IllegalArgumentException(
        s"Table $tablePath has delta.enableChangeDataFeed=true: " +
          "data-changing rewrites must produce cdc actions, which this " +
          "entry point does not — refusing rather than break CDF " +
          "readers. DELETE/UPDATE/MERGE write cdc files; appends " +
          "remain allowed (inserts derive from add actions).")
    // one parse; recurse so invariants on nested fields are seen
    def collect(fields: Seq[StructField], prefix: String,
        key: String): Seq[String] =
      fields.flatMap { f =>
        val here =
          if (f.metadata.contains(key)) Seq(prefix + f.name) else Nil
        here ++ (f.dataType match {
          case st: StructType =>
            collect(st.fields.toSeq, s"$prefix${f.name}.", key)
          case _ => Nil
        })
      }
    val fields = meta.dataSchema.fields.toSeq
    def using(key: String): Seq[String] = collect(fields, "", key)
    // CHECK constraints, column invariants, generated columns and
    // identity columns are NOT refused here: every data-writing path
    // handles them inline via [[Constraints.enforce]] /
    // [[GeneratedColumns]] / [[IdentityColumns]] (exotic expressions
    // this engine cannot parse still fail closed — expr() throws
    // before any file lands; explicit identity values and MERGE into
    // identity tables are refused at their own choke points). Identity
    // columns are only valid at the TOP level of the schema, which is
    // where [[IdentityColumns.of]] looks; a nested declaration is a
    // corrupt table and is refused here.
    val nestedIdentity = using("delta.identity.start")
      .filter(_.contains("."))
    require(nestedIdentity.isEmpty,
      s"Table $tablePath declares identity metadata on NESTED fields " +
        s"(${nestedIdentity.mkString(", ")}) — not valid Delta; refusing.")
  }
}
