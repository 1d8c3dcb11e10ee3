package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-profiler for the shingling formulations feeding the MinHash /
  * jaccard family (r16 optimization round): the round-15 measurement
  * (tools.ProfileNgram) compared the interpreted-lambda array builder
  * against the lead-window form and shipped the window; this probe adds
  * the third option neither round tried — row-local bigrams via
  * arrays_zip of two token-array slices (ordinary codegen expressions,
  * no interpreted lambda, no token-stream shuffle) — and checks it is
  * value-identical before any Q body switches to it. */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.TextQueries

    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[shingle] $name%-22s median=${ts(ts.length / 2)}%5.2fs  " +
        s"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm page cache

    // value-identity first: the multiset of (doc_id, h) must match
    val lead = TextQueries.shingleHashesForAudit(spark, sfDir)
      .groupBy("doc_id", "h").count()
    val zip = TextQueries.shingleHashesZip(docs.select("doc_id", "text"))
      .groupBy("doc_id", "h").count()
    val diff = lead.exceptAll(zip).count() + zip.exceptAll(lead).count()
    println(s"[shingle] value identity: diff=$diff (must be 0)")
    require(diff == 0, "zip shingler diverges from lead shingler")

    // minhash-signature shape (the shared downstream of the family)
    time("sigs/lead-window") {
      TextQueries.shingleHashesForAudit(spark, sfDir)
        .groupBy("doc_id")
        .agg(min(col("h") * 2 + 1).as("m0")).count()
    }
    time("sigs/zip") {
      TextQueries.shingleHashesZip(docs.select("doc_id", "text"))
        .groupBy("doc_id")
        .agg(min(col("h") * 2 + 1).as("m0")).count()
    }
    // full query shapes
    time("jaccard/lead (Q)") {
      graft.SparkEntry.queries("q_ngram_jaccard")(spark, sfDir).count()
    }
    time("jaccard/zip") {
      TextQueries.ngramJaccardStreamedZip(spark, sfDir).count()
    }
    spark.stop()
  }
}
