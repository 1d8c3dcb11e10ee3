package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-profiler for the q_ngram_jaccard plan variants: times each
  * formulation 5x at SPARK_GRAFT_SF_DIR and prints medians, so the
  * shipped Q entry is the measured-fastest, not the guessed-fastest. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[profile] $name%-14s median=${ts(ts.length / 2)}%5.2fs  " +
        s"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    spark.read.parquet(s"$sfDir/documents.parquet").count() // warm
    graft.queries.TextQueries.ngramJaccardPostings(spark, sfDir).count()

    time("Q(current)") {
      graft.SparkEntry.queries("q_ngram_jaccard")(spark, sfDir).count()
    }
    time("postingsV2") {
      graft.queries.TextQueries.ngramJaccardPostings(spark, sfDir).count()
    }
    time("streamed") {
      graft.queries.TextQueries.ngramJaccardStreamed(spark, sfDir).count()
    }
    // stage decomposition: where do the seconds actually go?
    time("setsOnly") {
      graft.queries.TextQueries.ngramShingleSets(spark, sfDir).count()
    }
    time("streamedLead") {
      graft.queries.TextQueries.ngramJaccardStreamedLead(spark, sfDir).count()
    }
    // r17 candidates: grouped zip shingler (one-exchange sets), window-
    // free cap + self-join vs postings + codegen pair explode
    time("postingsZip") {
      graft.queries.TextQueries.ngramJaccardPostingsZip(spark, sfDir).count()
    }
    time("groupedZip") {
      graft.queries.TextQueries.ngramJaccardGroupedZip(spark, sfDir).count()
    }
    time("setsGrouped") {
      graft.queries.TextQueries.ngramShingleSetsGrouped(spark, sfDir).count()
    }
    time("streamedGrp") {
      graft.queries.TextQueries.ngramJaccardStreamedGrouped(spark, sfDir)
        .count()
    }
    println("--- streamed plan (look for ReusedExchange) ---")
    graft.queries.TextQueries.ngramJaccardStreamed(spark, sfDir)
      .explain("formatted")
    spark.stop()
  }
}
