package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Profile one declared query's Spark-job breakdown: registers a
  * listener, runs the query twice (warm-up + measured), prints each
  * job's wall time and first-stage callsite for the measured run.
  * Local measurement aid (guide §1: find where the time goes before
  * touching anything); not part of the driver contract. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // warm-up run (fixture/feed builds, codegen)
    graft.SparkEntry.queries(name)(spark, sfDir).count()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?")
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(js.jobId, (js.time, s"$site | $desc"))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val st = jobs.get(je.jobId)
        if (st != null) out.add((je.jobId, je.time - st._1, st._2))
      }
    })
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // drain listener bus
    println(f"[jobprofile] $name total ${dt}%.3f s ($n rows), jobs:")
    val sorted = out.toArray(Array.empty[(Int, Long, String)]).sortBy(_._1)
    var sum = 0L
    sorted.foreach { case (id, ms, site) =>
      sum += ms
      println(f"[jobprofile]   job $id%4d ${ms / 1000.0}%7.3f s  $site")
    }
    println(f"[jobprofile] job-time sum ${sum / 1000.0}%.3f s (wall $dt%.3f)")
    spark.stop()
  }
}
