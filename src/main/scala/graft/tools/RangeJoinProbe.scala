package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin
import graft.queries.T

/** Five-way decomposition of q_range_join's cost (round-9 regression
  * protocol, same shape as the round-7 asof table in SCALE.md): scan,
  * normalize, band-join, agg, full query — to localize where the
  * r7→r8 0.32 → 0.7-0.9 s shift lives. */
object RangeJoinProbe {
  private final val TolNs = 21600000000000L

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(label: String)(f: => Long): Unit = {
      // warm once, then 3 samples
      f
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = samples.map(_._1).sorted.apply(1)
      println(f"[probe] $label%-28s med=$med%.3f s  (${samples.map(s => f"${s._1}%.3f").mkString(", ")})  rows=${samples.head._2}")
    }

    time("raw scan count") {
      spark.read.parquet(s"$dir/events.parquet").count()
    }
    time("normalized scan count") {
      T.events(spark, dir).count()
    }
    time("filter purchases") {
      T.events(spark, dir).where(col("event_type") === "purchase").count()
    }
    val ev = T.events(spark, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_ts"), col("value"))
    time("bandJoin only") {
      RangeJoin.bandJoin(purchases, errors, Seq("user_id"), "ts", "err_ts", TolNs).count()
    }
    time("bandJoin + agg") {
      RangeJoin.bandJoin(purchases, errors, Seq("user_id"), "ts", "err_ts", TolNs)
        .groupBy("event_id", "user_id")
        .agg(count(lit(1)).as("n_errors"), T.dsum(col("value"), 6).as("sum_error_value"))
        .count()
    }
    time("full q_range_join") {
      graft.SparkEntry.queries("q_range_join")(spark, dir).count()
    }
    time("full q_asof_join") {
      graft.SparkEntry.queries("q_asof_join")(spark, dir).count()
    }
    // job/stage accounting for one execution of each
    val counter = new org.apache.spark.scheduler.SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val stages = new java.util.concurrent.atomic.AtomicInteger
      val taskMs = new java.util.concurrent.atomic.AtomicLong
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
      }
      def reset(): Unit = { jobs.set(0); stages.set(0); taskMs.set(0) }
      def report(label: String): Unit =
        println(s"[probe] $label jobs=${jobs.get} stages=${stages.get} taskRunMs=${taskMs.get}")
    }
    spark.sparkContext.addSparkListener(counter)
    for (q <- Seq("q_range_join", "q_asof_join")) {
      counter.reset()
      graft.SparkEntry.queries(q)(spark, dir).count()
      Thread.sleep(500) // let listener events drain
      counter.report(q)
    }
    // variant A: AQE off — how many jobs / how fast?
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("range_join AQE off") {
      graft.SparkEntry.queries("q_range_join")(spark, dir).count()
    }
    counter.reset()
    graft.SparkEntry.queries("q_range_join")(spark, dir).count()
    Thread.sleep(500)
    counter.report("range_join AQE off")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // variant B: drop the final orderBy (how much is the sort's sampling?)
    val ev2 = T.events(spark, dir)
    val p2 = ev2.where(col("event_type") === "purchase").select("event_id", "user_id", "ts")
    val e2 = ev2.where(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_ts"), col("value"))
    time("band+agg no sort") {
      RangeJoin.bandJoin(p2, e2, Seq("user_id"), "ts", "err_ts", TolNs)
        .groupBy("event_id", "user_id")
        .agg(count(lit(1)).as("n_errors"), T.dsum(col("value"), 6).as("sum_error_value"))
        .count()
    }
    // plan for the join, to eyeball the join strategy
    RangeJoin.bandJoin(purchases, errors, Seq("user_id"), "ts", "err_ts", TolNs)
      .explain("formatted")
    spark.stop()
  }
}
