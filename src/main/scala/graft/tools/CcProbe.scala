package graft.tools
import org.apache.spark.sql.SparkSession
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    // warm
    graft.SparkEntry.queries("q_minhash_signatures")(spark, dir).count()
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q_dup_clusters")(spark, dir).count()
      println(s"run $i: ${(System.nanoTime()-t0)/1e9}s rows=$n rounds=${graft.operators.ConnectedComponents.lastRounds.get}")
    }
    spark.stop()
  }
}
