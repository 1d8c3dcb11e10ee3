package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.delta.DeltaTable
import graft.delta.log.CommitWriter
import graft.commands.DmlCommands

/** Probe: surgical DV row-group skip vs the plain whole-file scan, on
  * a heavily-deleted multi-row-group file — the shape where the skip
  * pays (or doesn't). Prints medians; not part of the driver contract. */
object DvSkipBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_dvskip_bench")
    val p = new java.io.File(dir.toFile, "tbl").getAbsolutePath
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)

    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("parquet.block.size", (256 * 1024).toString)
    try {
      // one sorted file, many row groups; delete the leading 90%
      CommitWriter.createTable(spark,
        spark.range(n).select(col("id"),
          (col("id") * 37 % 1000).as("v"),
          concat(lit("pad-"), col("id")).as("s")).coalesce(1),
        p, configuration = Map("delta.enableDeletionVectors" -> "true"))
    } finally hc.unset("parquet.block.size")
    DmlCommands.delete(spark, p, col("id") < (n * 9 / 10))

    def time(label: String, samples: Int)(body: => Long): Unit = {
      val ts = (1 to samples).map { _ =>
        val t0 = System.nanoTime()
        val rows = body
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val med = ts.map(_._1).sorted.apply(samples / 2)
      println(f"[dvskip] $label%-24s median $med%.3f s  " +
        f"(min ${ts.map(_._1).min}%.3f max ${ts.map(_._1).max}%.3f, " +
        s"rows ${ts.head._2})")
    }

    spark.conf.set("spark.lakehouse.dv.rowGroupSkip.minDeleted", "1")
    time("surgical-skip", 7) {
      spark.conf.set("spark.lakehouse.dv.rowGroupSkip.enabled", "true")
      DeltaTable.forPath(spark, p).read.agg(sum("v")).head; // force
      DeltaTable.forPath(spark, p).read.count()
    }
    time("whole-file+mask", 7) {
      spark.conf.set("spark.lakehouse.dv.rowGroupSkip.enabled", "false")
      DeltaTable.forPath(spark, p).read.agg(sum("v")).head;
      DeltaTable.forPath(spark, p).read.count()
    }
    spark.stop()
  }
}
