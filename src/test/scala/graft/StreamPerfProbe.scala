package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe for q_stream_window configs (not a test; run via
  * sbt "Test/runMain graft.StreamPerfProbe"). */
object StreamPerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    spark.read.parquet(s"$dir/region.parquet").count()
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    import org.apache.spark.sql.types._
    val shRaw = docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("source"), explode(expr(
        """transform(sequence(0, greatest(size(toks) - 2, 0)),
          |          i -> concat(toks[i], ' ', toks[i + 1]))""".stripMargin))
        .as("shingle"))
      .where(col("shingle").isNotNull)
      .select(col("doc_id"), col("source"),
        (conv(substring(md5(col("shingle").cast(BinaryType)), 1, 15), 16, 10)
          .cast(LongType) % 2147483647L).as("h"))
    val docSets = shRaw.groupBy("doc_id", "source")
      .agg(collect_set(col("h")).as("hs"))
    val sh = docSets.select(col("doc_id"), col("source"),
      size(col("hs")).as("sz"), explode(col("hs")).as("h"))
    time("B docset shuffle") { sh.count() }
    time("B warm") { sh.count() }
    val pl = sh.groupBy("source", "h")
      .agg(array_sort(collect_list(struct(col("doc_id"), col("sz")))).as("ds"))
      .where(size(col("ds")).between(2, 1000))
    time("C +bucket agg") { pl.count() }
    val pairs = pl.select(explode(expr(
      """flatten(transform(ds, (x, i) ->
        |  transform(slice(ds, i + 2, size(ds) - i - 1), y ->
        |    struct(x.doc_id AS doc_a, y.doc_id AS doc_b,
        |           x.sz AS sza, y.sz AS szb))))""".stripMargin)).as("p"))
      .select("p.*")
    time("D +pair explode") { pairs.count() }
    val full = pairs.groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("c"))
    time("E +pair agg") { full.count() }
    spark.stop()
  }
}
