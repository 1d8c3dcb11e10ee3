package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Adjudicate the three r16-touched queries whose full-bench medians
  * were contaminated by machine load (VERDICT r16 item 2): interleaved
  * in-JVM A/B of the r16 formulation vs its pre-r16 predecessor through
  * the FULL query body, value identity pinned. q_stream_ann_ingest has
  * no toggleable predecessor (the gating removes per-trigger metadata
  * reads outright), so it gets a clean multi-sample timing instead.
  */
object AmbigProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.{SimilarityQueries => SQ, TextQueries => TQ, T}

    val samples = sys.env.getOrElse("SPARK_GRAFT_PROBE_SAMPLES", "5").toInt
    // INTERLEAVED A/B: one (a, b) sample pair per round, so an ambient
    // window inflates both sides of a pair, not one side's whole series
    def ab(name: String, a: => Long, b: => Long): Unit = {
      val (ta, tb) = (Array.ofDim[Double](samples), Array.ofDim[Double](samples))
      for (i <- 0 until samples) {
        var t0 = System.nanoTime(); a; ta(i) = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); b; tb(i) = (System.nanoTime() - t0) / 1e9
      }
      def med(xs: Array[Double]) = xs.sorted.apply(xs.length / 2)
      println(f"[ambig] $name%-18s current=${med(ta)}%5.2fs  pre-r16=${med(tb)}%5.2fs  " +
        s"cur=${ta.map(t => f"$t%.2f").mkString(",")}  " +
        s"pre=${tb.map(t => f"$t%.2f").mkString(",")}")
    }

    val docs = T.load(spark, sfDir, "documents")
    val emb = T.load(spark, sfDir, "embeddings")
    docs.count(); emb.count() // warm

    // --- q_dup_clusters: zip shingler (r16) vs lead-window shingler ---
    def dupZip = TQ.dupClustersFromBuckets(spark,
      TQ.minhashBucketsFrom(spark, TQ.minhashBandsFrom(
        TQ.shingleHashesZip(docs))))
    def dupLead = TQ.dupClustersFromBuckets(spark,
      TQ.minhashBucketsFrom(spark, TQ.minhashBandsFrom(
        TQ.shingleHashesLead(docs))))
    def pin(name: String, x: DataFrame, y: DataFrame): Unit = {
      val d = x.exceptAll(y).count() + y.exceptAll(x).count()
      println(s"[ambig] $name identity diff=$d (must be 0)")
      require(d == 0)
    }
    pin("q_dup_clusters", dupZip, dupLead)
    dupZip.count(); dupLead.count() // warm both plans
    ab("q_dup_clusters", dupZip.count(), dupLead.count())

    // --- q_embed_near_dup: two-Generate pair explode (r16) vs lambda ---
    def nearDupGen = SQ.embedNearDupVerify(emb, SQ.embedCandidates(emb))
    def nearDupLam = SQ.embedNearDupVerify(emb, SQ.embedCandidatesLambda(emb))
    pin("q_embed_near_dup", nearDupGen, nearDupLam)
    nearDupGen.count(); nearDupLam.count()
    ab("q_embed_near_dup", nearDupGen.count(), nearDupLam.count())

    // --- q_stream_ann_ingest: clean multi-sample timing (no toggle) ---
    val q = graft.SparkEntry.queries("q_stream_ann_ingest")
    q(spark, sfDir).count() // warm (feed + index builds)
    val ts = (1 to samples).map { _ =>
      val t0 = System.nanoTime(); q(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[ambig] q_stream_ann_ingest median=${ts(ts.length / 2)}%5.2fs  " +
      s"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
