package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query at
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Delta fixtures are built (or found cached) in a warm-up pass before
  * the clock starts, so timings measure query execution, not one-time
  * fixture writes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val samples = sys.env.getOrElse("SPARK_GRAFT_BENCH_SAMPLES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet is TIMESTAMP(NANOS); pin the legacy-long reading at
      // session build so no timed run depends on which query set it first
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the full-suite run leaks orphaned shuffle/broadcast/checkpoint
      // blocks between queries; with a big heap the JVM may not GC for
      // the whole run, so ContextCleaner never fires and late queries
      // time block-manager pressure instead of themselves. Force a
      // periodic context GC so per-query timings stay independent.
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: JVM/codegen + delta fixture builds (cached on disk)
    queriesWarmup(spark, sfDir)

    // median of N samples per query, sampled INTERLEAVED: the whole
    // suite runs S times end-to-end and each query's samples come one
    // per pass, minutes apart — so an external load window inflates at
    // most one sample per query instead of all N samples of a
    // contiguous alphabetical stretch (which the median would then
    // launder into the artifact; that contaminated the round-11 and
    // round-12 driver runs). Each sample also records its wall-clock
    // start, so a contention window is visible in bench_full.json
    // itself. A query that THROWS must surface as an error marker,
    // never as a (fast) wall time — a bench-only crash (e.g. OOM at
    // sf0.1 that passes the sf0.01 correctness gate) would otherwise
    // read as a speedup.
    //
    // Pass 0 is a per-query WARM-UP pass, discarded from the
    // median/min/max exactly like `queriesWarmup` is off the clock:
    // round-13's samples_detail proved pass 1 carries first-touch costs
    // (codegen compiles, page-cache fills, per-query fixture lazy init —
    // q_ngram_jaccard [6.21, 5.11, 1.78]; q_auto_compact [8.83, 0.16,
    // 0.62]) that a 3-sample median then laundered into the artifact:
    // the driver read stable 30.24 s while a clean warm run of the same
    // code read 21.77 s. The warm-up pass stays visible in
    // samples_detail (pass 0) so a warm-up-only anomaly is still
    // diagnosable from the artifact, but only warm passes 1..S are
    // eligible for the reported statistics.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val outcomesByQuery =
      scala.collection.mutable.Map.empty[String, Vector[BenchSample]]
        .withDefaultValue(Vector.empty)
    for (pass <- 0 to samples; (name, fn) <- ordered) {
      val startMs = System.currentTimeMillis()
      val t0 = System.nanoTime()
      val sample = try {
        fn(spark, sfDir).count()
        BenchSample(pass, startMs, (System.nanoTime() - t0) / 1e9, None)
      } catch { case e: Throwable =>
        BenchSample(pass, startMs, -1.0, Some(
          s"${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").replaceAll("\\s+", " ").take(160)))
      }
      outcomesByQuery(name) = outcomesByQuery(name) :+ sample
    }
    val results = ordered.map { case (name, _) =>
      val r = summarize(name, outcomesByQuery(name))
      r.error.foreach(m =>
        System.err.println(s"[bench] QUERY FAILED $name: $m"))
      r
    }
    val failed = results.filter(_.error.isDefined)
    // Locale.ROOT: the f interpolator is locale-sensitive, and a
    // comma-decimal default locale would make the JSON line unparseable
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val qs = results.map(r => "\"" + r.name + "\":" + fmt(r.median))
      .mkString("{", ",", "}")
    val spread = results.map(r =>
      "\"" + r.name + "\":[" + fmt(r.min) + "," + fmt(r.max) + "]")
      .mkString("{", ",", "}")
    val errJson = failed.map(r => "\"" + r.name + "\":" + jstr(r.error.get))
      .mkString("{", ",", "}")
    val samplesJson = samplesDetailJson(results)
    // total sums only succeeding queries; errored ones carry -1 in the
    // per-query map and are enumerated in "errors"
    val total = results.filter(_.error.isEmpty).map(_.median).sum
    // FROZEN round-over-round comparison set (the 49 headline queries
    // present in both round 4 and round 5): new queries keep landing in
    // `queries`/`value`, but `stable_total` sums only this fixed list,
    // so cross-round speedup/regression reads off one number. Do NOT
    // extend this list — that is what `value` is for.
    val stableSet = Bench.stableSet
    val stableTotal = results
      .filter(r => r.error.isEmpty && stableSet(r.name)).map(_.median).sum
    // ambient adjudication computed ONCE, shipped in both artifacts:
    // samples counts WARM passes only; passes_total spells out the
    // executed pass count (warm + the discarded warm-up) so consumers
    // never have to derive the convention
    val inflation = passInflation(results)
    val ambient = ambientPasses(results)
    val inflationJson = inflation.toSeq.sortBy(_._1)
      .map { case (p, f) => s""""$p":${fmt(f)}""" }
      .mkString("{", ",", "}")
    val ambientJson = ambient.toSeq.sorted.mkString("[", ",", "]")
    val fullJson =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","stable_total":${fmt(stableTotal)},"queries":$qs,"sf":"$sfDir","samples":$samples,"warmup_passes":1,"passes_total":${samples + 1},"sampling":"interleaved_passes_warm_discard","run_epoch_ms":${System.currentTimeMillis()},"spread":$spread,"pass_inflation":$inflationJson,"ambient_passes":$ambientJson,"samples_detail":$samplesJson,"n_errors":${failed.length},"errors":$errJson}"""
    // the driver keeps only the last ~2000 chars of output; persist the full
    // per-query vector to a file and print a compact headline line LAST so it
    // survives the tail buffer intact and parses
    try {
      val out = java.nio.file.Paths.get("target", "bench_full.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, fullJson.getBytes("UTF-8"))
      System.err.println(s"[bench] full per-query JSON at $out")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not persist json: ${e.getMessage}")
    }
    val headline = Set(
      "delta_scan", "file_skipping", "deletion_vectors", "partition_pruning",
      "schema_evolution", "time_travel", "snapshot_refresh", "q_checkpoint_state",
      "q1_agg", "q_agg", "q_join_inner", "q_join_broadcast", "q_window_rank",
      "q_topk", "q_sort", "q_union_all", "q_subquery_in", "q_percentile",
      "q_asof_join", "q_events_window", "q_dedup", "q_near_dedup",
      "q_minhash_signatures", "q_simhash", "q_ngram_jaccard", "q_embed_near_dup",
      "q_sim_topk", "q_sim_ann_ivf", "q_text_stats", "q_lang_id",
      "q_dup_clusters", "q_range_join", "q_stratified_sample",
      "q_embed_quantize", "q_doc_rarity", "q_change_feed", "q_version_diff",
      "q_token_count", "q_multimodal_features", "q_stream_window",
      "q_stream_watermark",
      "q_stream_sessions", "q_stream_delta_source", "q_merge",
      "q_contamination", "q_edit_distance", "q_pack_sequences",
      "q_stats_agg", "vacuum_dry_run", "q_pii_redact", "q_strip_markup",
      "q_simhash_near_dup", "q_mixture_cap", "q_stream_dedup",
      "q_quality_filter", "q_incremental_dedup", "q_dv_dml",
      // round-7 additions (headline display only — stableSet is frozen)
      "q_concurrent_write", "q_row_ids", "q_global_shuffle",
      "q_curriculum",
      // round-8 additions
      "q_dpp_join", "q_auto_compact", "q_temperature_mix", "q_stream_cdf",
      // round-11 additions
      "q_bloom_dedup", "q_sim_ann_incremental")
    val headQs = results.collect { case r if headline(r.name) =>
      "\"" + r.name + "\":" + fmt(r.median)
    }.mkString("{", ",", "}")
    val headSpread = spreadFlags(results, ambient)
    // headline errors carry NAMES ONLY, capped: the driver keeps the
    // last ~2000 chars of stdout, and a handful of 160-char messages
    // would push the line head past the buffer and break its parse —
    // full messages live in target/bench_full.json
    val headErrs = {
      val shown = failed.take(8).map(r =>
        "\"" + r.name + "\":" + jstr(r.error.get.take(40)))
      val more = if (failed.length > 8)
        Seq("\"__truncated__\":" + jstr(s"+${failed.length - 8} more"))
      else Nil
      (shown ++ more).mkString("{", ",", "}")
    }
    // HARD line budget (r17): the round-16 driver artifact proved the
    // headline can outgrow the ~2000-char stdout tail — under contention
    // the spread_flags map plus 8 truncated error messages pushed the
    // line past the buffer and it arrived DECAPITATED (BENCH_r16.json's
    // tail begins mid-JSON). The contract fields (metric/value/unit/
    // stable_total/queries/sf/n_queries/n_errors) are printed
    // unconditionally — the queries map is the driver's per-query
    // round-over-round comparison and must never lose entries — and the
    // purely diagnostic fields append ONLY while the line stays under
    // the budget, so a noisy run degrades to fewer diagnostics on
    // stdout (all of them always live in target/bench_full.json), never
    // to an unparseable line.
    val headlineBudget = 1800
    val base =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","stable_total":${fmt(stableTotal)},"queries":$headQs,"sf":"$sfDir","n_queries":${results.length},"n_errors":${failed.length}"""
    val optional = Seq(
      s""""samples":$samples""",
      s""""warmup_passes":1,"passes_total":${samples + 1}""",
      s""""sampling":"interleaved_passes_warm_discard"""",
      s""""errors":$headErrs""",
      s""""ambient_passes":$ambientJson""",
      s""""spread_flags":$headSpread""")
    val line = optional.foldLeft(base) { (acc, field) =>
      if (acc.length + 1 + field.length + 1 <= headlineBudget)
        acc + "," + field
      else acc
    } + "}"
    println(line)
    spark.stop()
    // failures are surfaced as the "errors" map + -1 markers in BOTH
    // artifacts and a stderr line per query; exit stays 0 so the driver
    // always collects the artifact (a nonzero exit could discard it)
    if (failed.nonEmpty)
      System.err.println(s"[bench] ${failed.length} QUERIES FAILED: " +
        failed.map(_.name).mkString(", "))
  }

  private[graft] final case class BenchSample(pass: Int, startMs: Long,
      sec: Double, error: Option[String])

  private[graft] final case class BenchResult(name: String, median: Double,
      min: Double, max: Double, error: Option[String],
      samples: Vector[BenchSample] = Vector.empty)

  /** Per-query statistics over the WARM passes only: pass 0 is the
    * discarded per-query warm-up (first-touch codegen/page-cache/lazy
    * fixture costs bill there, symmetric with `queriesWarmup`), but it
    * stays in `samples` so samples_detail still shows it. ANY failed
    * sample — warm-up included, a crash is a crash — poisons the query
    * to -1: a flaky OOM must not report the median of its surviving
    * samples (the artifact would read as a speedup while broken). */
  private[graft] def summarize(name: String,
      outcomes: Vector[BenchSample]): BenchResult = {
    val errors = outcomes.flatMap(_.error)
    val times = outcomes.filter(o => o.error.isEmpty && o.pass > 0)
      .map(_.sec).sorted
    if (errors.nonEmpty || times.isEmpty)
      BenchResult(name, -1.0, -1.0, -1.0,
        errors.headOption.orElse(Some("no warm samples")), outcomes)
    else BenchResult(name, times(times.length / 2), times.head, times.last,
      None, outcomes)
  }

  /** Per-sample detail (FULL artifact only): pass index, wall-clock
    * start (epoch ms), seconds. Samples are taken INTERLEAVED (one per
    * full-suite pass), so a machine-contention window shows up as a
    * cluster of inflated samples sharing a start_ms range across
    * unrelated queries — diagnosable from the artifact alone. */
  private[graft] def samplesDetailJson(results: Seq[BenchResult]): String = {
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    results.map { r =>
      val arr = r.samples.map(s =>
        s"""{"pass":${s.pass},"start_ms":${s.startMs},"sec":${fmt(s.sec)}""" +
          s.error.map(m => ",\"err\":" + jstr(m.take(80))).getOrElse("") + "}")
        .mkString("[", ",", "]")
      "\"" + r.name + "\":" + arr
    }.mkString("{", ",", "}")
  }

  /** Per-pass co-inflation index over the WARM passes: the fraction of
    * eligible queries (no error, warm min ≥ 0.1 s — micro-query jitter
    * must not vote) whose pass-p sample runs ≥ `factor`× their own warm
    * minimum. Unrelated queries do not slow down together for
    * per-query reasons, so a pass where a QUORUM of the suite
    * co-inflates is an AMBIENT window (external machine load) — the
    * adjudication previous rounds did by hand from samples_detail
    * timestamps. */
  private[graft] def passInflation(results: Seq[BenchResult],
      factor: Double = 2.0): Map[Int, Double] = {
    val eligible = results.filter(r => r.error.isEmpty && r.min >= 0.1)
    val passes = eligible.flatMap(_.samples.collect {
      case s if s.pass > 0 && s.error.isEmpty => s.pass
    }).distinct
    passes.map { p =>
      val votes = eligible.flatMap(r =>
        r.samples.find(s => s.pass == p && s.error.isEmpty)
          .map(_.sec >= r.min * factor))
      p -> (if (votes.isEmpty) 0.0
            else votes.count(identity).toDouble / votes.size)
    }.toMap
  }

  /** Passes whose co-inflation crosses the quorum — the ambient windows. */
  private[graft] def ambientPasses(results: Seq[BenchResult],
      factor: Double = 2.0, quorum: Double = 0.3): Set[Int] =
    passInflation(results, factor).filter(_._2 >= quorum).keySet

  /** Contention self-diagnosis for the HEADLINE artifact: a compact map
    * of only the queries whose sample spread says the number is not
    * trustworthy (max ≥ 2.5× min AND ≥ 0.5 s apart — a micro-query's
    * jitter or a steady query never flags), each carrying its
    * ADJUDICATION: `ambient: true` when the flag's worst sample sits in
    * a pass the whole suite co-inflated in (machine load — the spread
    * says nothing about the query), `false` when the slowdown is the
    * query's own. The full per-query spread lives in
    * target/bench_full.json; this subset is capped so the driver's
    * ~2000-char stdout tail can't truncate the line into unparseable
    * JSON. */
  private[graft] def spreadFlags(results: Seq[BenchResult]): String =
    spreadFlags(results, ambientPasses(results))

  /** Same, against a precomputed ambient set — main computes the set
    * once and feeds both artifacts, so headline flags and
    * bench_full.json's ambient_passes can never disagree on the
    * (factor, quorum) knobs. */
  private[graft] def spreadFlags(results: Seq[BenchResult],
      ambient: Set[Int]): String = {
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val flagged = results.filter(r => r.error.isEmpty &&
      r.max >= r.min * 2.5 && r.max - r.min >= 0.5)
      .sortBy(r => -(r.max - r.min))
    val shown = flagged.take(8).map { r =>
      val worstPass = r.samples
        .filter(s => s.pass > 0 && s.error.isEmpty) match {
        case ss if ss.nonEmpty => Some(ss.maxBy(_.sec).pass)
        case _ => None
      }
      val amb = worstPass.exists(ambient.contains)
      "\"" + r.name + "\":{\"min\":" + fmt(r.min) + ",\"max\":" +
        fmt(r.max) + ",\"ambient\":" + amb + "}"
    }
    val more = if (flagged.length > 8)
      Seq("\"__truncated__\":{\"more\":" + (flagged.length - 8) + "}")
    else Nil
    (shown ++ more).mkString("{", ",", "}")
  }

  /** Build a single-file 1000-row slice of events and push it through
    * both streaming query shapes (complete-mode window agg +
    * mapGroupsWithState), so streaming-engine init is off the clock. */
  private def streamingWarmup(spark: SparkSession, sfDir: String): Unit = {
    val warmDir = s"target/bench_stream_warm"
    val f = new java.io.File(s"$warmDir/events.parquet")
    val src = new java.io.File(s"$sfDir/events.parquet")
    if (!f.exists() || f.lastModified() < src.lastModified()) {
      val staging = s"$warmDir/.staging"
      // normalized slice (epoch-ns long ts), matching the feed schema
      // the streaming queries expect
      graft.queries.T.normalizeEventTs(
          spark.read.parquet(s"$sfDir/events.parquet")).limit(1000)
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, f.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(staging))
    }
    SparkEntry.queries("q_stream_window")(spark, warmDir).count()
    SparkEntry.queries("q_stream_sessions")(spark, warmDir).count()
    // the watermarked append shape (EventTimeWatermark + append-mode
    // state eviction) compiles a different streaming plan — warm it too
    SparkEntry.queries("q_stream_watermark")(spark, warmDir).count()
    // the dedup shape adds a dropDuplicatesWithinWatermark state store —
    // yet another streaming plan; warming it also pre-builds its feed
    SparkEntry.queries("q_stream_dedup")(spark, warmDir).count()
    // stream-stream interval join: two watermarked sides + symmetric
    // join state stores — the most expensive streaming plan to
    // initialize, and previously the only shape paying that init on
    // the clock
    SparkEntry.queries("q_stream_join")(spark, warmDir).count()
    // the delta streaming SOURCE compiles yet another plan (v1 Source +
    // composed scan per micro-batch); warm it against a 2-commit toy
    // table so q_stream_delta_source times the operator, not engine init
    val tiny = s"$warmDir/delta_tbl"
    if (!new java.io.File(s"$tiny/_delta_log").exists()) {
      val region = spark.read.parquet(s"$sfDir/region.parquet")
      graft.delta.log.CommitWriter.createTable(spark,
        region.limit(2), tiny)
      graft.delta.log.CommitWriter.append(spark, region.limit(1), tiny)
    }
    val ss = spark.newSession()
    val q = ss.readStream.format("graftdelta").option("path", tiny)
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream.outputMode("append")
      .format("memory").queryName("bench_delta_src_warm").start()
    try q.processAllAvailable() finally q.stop()
    // the change-feed source mode compiles yet another incremental plan
    val q2 = ss.readStream.format("graftdelta").option("path", tiny)
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream.outputMode("append")
      .format("memory").queryName("bench_delta_cdf_warm").start()
    try q2.processAllAvailable() finally q2.stop()
  }

  private[graft] def queriesWarmup(spark: SparkSession, sfDir: String): Unit = {
    import graft.queries.DeltaQueries
    try {
      DeltaQueries.basicTable(spark, sfDir)
      DeltaQueries.rangedTable(spark, sfDir)
      DeltaQueries.partitionedTable(spark, sfDir)
      DeltaQueries.versionedTable(spark, sfDir)
      DeltaQueries.evolvedTable(spark, sfDir)
      DeltaQueries.nestedTable(spark, sfDir)
      DeltaQueries.widenedTable(spark, sfDir)
      DeltaQueries.dvTable(spark, sfDir)
      DeltaQueries.convertedTable(spark, sfDir)
      DeltaQueries.mappedTable(spark, sfDir)
      // DML/MERGE/CDC/checkpoint fixtures: building one of these mid-
      // sample would bill several commits + cdc/sidecar writes to the
      // first timed run of its query
      DeltaQueries.mergedTable(spark, sfDir)
      DeltaQueries.dvDmlTable(spark, sfDir)
      DeltaQueries.cdcTable(spark, sfDir)
      DeltaQueries.cdfWriteTable(spark, sfDir)
      DeltaQueries.checkpointedTable(spark, sfDir)
      DeltaQueries.v2CheckpointedTable(spark, sfDir)
      // vacuum fixture (built inside its query fn on first call)
      SparkEntry.queries("vacuum_dry_run")(spark, sfDir).count()
      // IVF index build (amortized at real scale)
      graft.queries.SimilarityQueries.ivfIndexPath(spark, sfDir)
      // warm the per-(table, version) replay caches once
      for (t <- Seq(DeltaQueries.basicTable(spark, sfDir),
        DeltaQueries.rangedTable(spark, sfDir),
        DeltaQueries.partitionedTable(spark, sfDir),
        DeltaQueries.versionedTable(spark, sfDir),
        DeltaQueries.evolvedTable(spark, sfDir),
        DeltaQueries.nestedTable(spark, sfDir),
        DeltaQueries.widenedTable(spark, sfDir),
        DeltaQueries.dvTable(spark, sfDir)))
        graft.delta.DeltaTable.forPath(spark, t).allFiles.count()
      // streaming machinery warm-up: the first streaming query in a JVM
      // pays several seconds of engine/codegen/state-store init; run both
      // streaming shapes against a 1000-row slice so the timed runs
      // measure the operator, not the init
      streamingWarmup(spark, sfDir)
      // one tiny end-to-end job to finish JVM/codegen warm-up
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }
  }

  /** FROZEN round-over-round comparison set (the 49 headline queries
    * present in both round 4 and round 5): new queries keep landing in
    * `queries`/`value`, but `stable_total` sums only this fixed list,
    * so cross-round speedup/regression reads off one number. Do NOT
    * extend this list — that is what `value` is for. */
  private[graft] val stableSet = Set(
    "deletion_vectors", "delta_scan", "file_skipping", "partition_pruning",
    "q1_agg", "q_agg", "q_asof_join", "q_change_feed", "q_checkpoint_state",
    "q_contamination", "q_dedup", "q_doc_rarity", "q_dup_clusters",
    "q_edit_distance", "q_embed_near_dup", "q_embed_quantize",
    "q_events_window", "q_join_broadcast", "q_join_inner", "q_lang_id",
    "q_merge", "q_minhash_signatures", "q_multimodal_features",
    "q_near_dedup", "q_ngram_jaccard", "q_pack_sequences", "q_percentile",
    "q_range_join", "q_sim_ann_ivf", "q_sim_topk", "q_simhash", "q_sort",
    "q_stats_agg", "q_stratified_sample", "q_stream_delta_source",
    "q_stream_sessions", "q_stream_watermark", "q_stream_window",
    "q_subquery_in", "q_text_stats", "q_token_count", "q_topk",
    "q_union_all", "q_version_diff", "q_window_rank", "schema_evolution",
    "snapshot_refresh", "time_travel", "vacuum_dry_run")

  /** The stable set as run by the sf1 scaling snapshot
    * ([[graft.tools.Sf1Bench]]): `vacuum_dry_run` is excluded — its
    * fixture is the sf-INDEPENDENT shared log demo, identical at any
    * scale, so timing it against "sf1" teaches nothing. */
  private[graft] val stableSetForScale: Set[String] =
    stableSet - "vacuum_dry_run"
}
