package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the LSH bucket pair-generation forms (r16): nested-transform
  * lambda single explode (interpreted) vs two chained codegen Generates
  * (posexplode + runtime-start slice explode). Times the pair count
  * over the real minhash buckets at SPARK_GRAFT_SF_DIR and pins value
  * identity. */
object PairGenProbe {
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
      println(f"[pairgen] $name%-14s median=${ts(ts.length / 2)}%5.2fs  " +
        s"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // buckets materialized once so the probe times ONLY pair generation
    val buckets = graft.queries.TextQueries.minhashBucketsForAudit(
      spark, sfDir).localCheckpoint()
    println(s"[pairgen] buckets: ${buckets.count()}")

    def lambdaPairs = buckets.select(col("band"), explode(expr(
      """flatten(transform(ds, (x, i) ->
        |  transform(slice(ds, i + 2, size(ds) - i - 1), y ->
        |    struct(x AS doc_a, y AS doc_b))))""".stripMargin)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("band"))
    def explodePairs = buckets
      .select(col("band"), col("ds"),
        posexplode(col("ds")).as(Seq("i", "doc_a")))
      .select(col("band"), col("doc_a"),
        explode(expr("slice(ds, i + 2, size(ds) - i - 1)")).as("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("band"))

    val diff = lambdaPairs.exceptAll(explodePairs).count() +
      explodePairs.exceptAll(lambdaPairs).count()
    println(s"[pairgen] value identity: diff=$diff (must be 0)")
    require(diff == 0)

    time("lambda") { lambdaPairs.groupBy("doc_a", "doc_b").count().count() }
    time("explode2") { explodePairs.groupBy("doc_a", "doc_b").count().count() }
    spark.stop()
  }
}
