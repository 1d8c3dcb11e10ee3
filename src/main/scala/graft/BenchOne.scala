package graft

import org.apache.spark.sql.SparkSession

/** Local profiling aid: time a comma-separated list of declared queries
  * with the same session shape as Bench (warmup included), printing one
  * line per sample. Not part of the driver contract. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val samples = sys.env.getOrElse("SPARK_GRAFT_BENCH_SAMPLES", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same JVM/codegen warmup as Bench so numbers are comparable; set
    // SPARK_GRAFT_FULL_WARMUP=1 to also run Bench's fixture/streaming
    // warmup (for reproducing full-bench-context effects)
    if (sys.env.get("SPARK_GRAFT_FULL_WARMUP").contains("1"))
      Bench.queriesWarmup(spark, sfDir)
    spark.read.parquet(s"$sfDir/region.parquet").count()
    for (name <- names; i <- 1 to samples) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[benchone] $name sample $i: $dt%.3f s ($n rows)")
    }
    spark.stop()
  }
}
