package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of q_simhash_near_dup (r16): which of the three
  * shuffle stages — 60-vote signature aggregation, capped banding, pair
  * explode + verify — actually carries the query's seconds. */
object SimhashProbe {
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

    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[simhash] $name%-16s median=${ts(ts.length / 2)}%5.2fs  " +
        s"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    spark.read.parquet(s"$sfDir/documents.parquet").count()
    graft.SparkEntry.queries("q_simhash_near_dup")(spark, sfDir).count()

    // packed (shipped) vs ±1-vote (r15) signature aggregation, value
    // identity + interleaved timing in ONE JVM (cross-JVM medians on
    // this host wobble ±0.3 s)
    val packed = graft.queries.TextQueries.simhashSignatures(spark, sfDir)
    val votes = graft.queries.TextQueries.simhashSignaturesVotes(spark, sfDir)
    val diff = packed.exceptAll(votes).count() +
      votes.exceptAll(packed).count()
    println(s"[simhash] packed-vs-votes identity: diff=$diff (must be 0)")
    require(diff == 0)
    // force the signature columns (a bare count() would let Catalyst
    // prune the aggregates)
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("sig1") + col("sig2"))).count()
    time("sigs/votes(r15)") { force(votes) }
    time("sigs/packed") { force(packed) }
    time("fullQuery") {
      graft.SparkEntry.queries("q_simhash_near_dup")(spark, sfDir).count()
    }
    spark.stop()
  }
}
