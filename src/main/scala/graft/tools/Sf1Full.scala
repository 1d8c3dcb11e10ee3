package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-13 rehearsal (verdict-r12 ask #7): run the ENTIRE declared
  * query suite once against the synthetic sf1 dataset (10× sf0.1 —
  * built by [[Sf1Bench]]'s recipe, shared cache under
  * `target/sf1_full/`), printing one wall-time line per query so
  * anything scaling worse than ~10× its sf0.1 wall can be triaged.
  *
  * Also runs the q_knn_join 10% probe-fraction rehearsal (verdict-r12
  * ask #2): at sf1 with a 10% probe fraction the probe relation is
  * ~24k vector-bearing rows (~15 MB) — past the broadcast threshold,
  * so the size gate must pick the shuffle join and still finish.
  *
  * Run: sbt "runMain graft.tools.Sf1Full" (optionally a query-name
  * filter as args(0), comma-separated).
  */
object Sf1Full {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = "target/sf1_full"
    if (!new java.io.File(s"$out/lineitem.parquet").exists())
      Sf1Bench.build(spark, "/root/testdata/sf0.1", out)

    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(',').toSet) else None
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    graft.Bench.queriesWarmup(spark, out)
    var failed = 0
    val times = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val res = try Right(fn(spark, out).count())
        catch { case e: Throwable => Left(
          s"${e.getClass.getSimpleName}: ${Option(e.getMessage)
            .getOrElse("").replaceAll("\\s+", " ").take(120)}") }
      val s = (System.nanoTime() - t0) / 1e9
      res match {
        case Right(n) => println(f"[sf1full] $name%-28s ${s}%8.3f s  rows=$n")
        case Left(m) =>
          failed += 1; println(f"[sf1full] $name%-28s FAILED: $m")
      }
      name -> s
    }
    println(f"[sf1full] TOTAL ${times.map(_._2).sum}%.1f s over " +
      s"${times.size} queries, $failed failed")

    if (only.isEmpty || only.exists(_.contains("knn10"))) {
      // probe-fraction k-NN join rehearsals. The GATE decides the
      // pre-AQE plan from its deliberately ~2x-conservative estimate
      // (8 B/dim for float vectors — it can only err toward shuffle);
      // AQE may then re-convert to broadcast from the MEASURED size,
      // which is a runtime-sized decision, not the unconditional-hint
      // OOM shape the gate exists to prevent. At this corpus (20k
      // vectors) the 10% fraction is ~4.7 MB — genuinely broadcastable
      // — while 100% (~47 MB estimated) must take the shuffle path.
      for ((label, modulus) <- Seq(("knn_join_10pct", 10),
          ("knn_join_dense", 1))) {
        val t0 = System.nanoTime()
        val df = graft.queries.SimilarityQueries.knnJoin(spark, out,
          k = 5, nprobe = 4, probeModulus = modulus)
        // snapshot BEFORE execution: once AQE runs, the
        // AdaptiveSparkPlan stringifies as the FINAL plan
        val static = df.queryExecution.sparkPlan.toString
        val n = df.count()
        val s = (System.nanoTime() - t0) / 1e9
        val gate =
          if (static.contains("SortMergeJoin") ||
            static.contains("ShuffledHashJoin")) "shuffle"
          else if (static.contains("BroadcastHashJoin")) "broadcast"
          else "?"
        val runtime =
          if (df.queryExecution.executedPlan.toString
            .contains("BroadcastHashJoin")) "broadcast"
          else "shuffle"
        println(f"[sf1full] $label ${s}%8.3f s rows=$n " +
          s"gate=$gate runtime=$runtime")
      }
    }
    spark.stop()
  }
}
