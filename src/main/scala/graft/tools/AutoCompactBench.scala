package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.delta.DeltaTable
import graft.delta.log.CommitWriter

/** Probe: per-commit cost of the auto-compact qualification check and
  * the steady-state behavior under sustained small appends. Three
  * tables x N appends: no property / property-on-but-never-fires /
  * property-on-and-firing. Prints totals + final file counts. */
object AutoCompactBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(40)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft_ac_bench")

    def run(label: String, cfg: Map[String, String],
        minFiles: Option[Int]): Unit = {
      minFiles.foreach(m => spark.conf.set(
        "spark.lakehouse.autoCompact.minNumFiles", m.toString))
      try {
        val p = new java.io.File(dir.toFile, label).getAbsolutePath
        CommitWriter.createTable(spark,
          spark.range(100).coalesce(1).toDF("id"), p, configuration = cfg)
        val t0 = System.nanoTime()
        for (i <- 1 to n)
          CommitWriter.append(spark,
            spark.range(i * 100L, i * 100L + 100).coalesce(1).toDF("id"), p)
        val dt = (System.nanoTime() - t0) / 1e9
        val snap = DeltaTable.forPath(spark, p)
        println(f"[acbench] $label%-28s $n appends ${dt}%7.2f s " +
          f"(${dt / n * 1000}%6.1f ms/commit)  final files " +
          f"${snap.allFiles.count()}%3d  rows ${snap.read.count()}")
      } finally minFiles.foreach(_ => spark.conf.unset(
        "spark.lakehouse.autoCompact.minNumFiles"))
    }

    // discarded warmup: JIT/codegen/first-shuffle costs must not land
    // on whichever timed run happens to go first
    run("warmup-discard", Map.empty, None)
    run("baseline-no-property", Map.empty, None)
    run("property-never-fires",
      Map(CommitWriter.AutoCompactPropKey -> "true"), Some(10000))
    run("property-fires-at-10",
      Map(CommitWriter.AutoCompactPropKey -> "true"), Some(10))
    spark.stop()
  }
}
