package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Interleaved in-JVM A/B of the q_doc_rarity formulations (r17):
  * instance-level join after a countDistinct aggregation (the r16
  * shape) vs the pre-aggregated (doc_id, tok, tf) shape whose exchange
  * subtree both branches share. Value identity pinned. */
object DocRarityProbe {
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

    val docs = graft.queries.T.load(spark, sfDir, "documents")
    docs.count() // warm

    def toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    // r15/r16 shape: countDistinct + instance-level join
    def oldForm = {
      val tokdf = toks.groupBy("tok")
        .agg(countDistinct(col("doc_id")).as("df"))
      toks.join(tokdf, "tok")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          (sum("df").cast(DoubleType) /
            count(lit(1)).cast(DoubleType)).as("mean_df"))
        .orderBy("doc_id")
    }
    // r17 shape: pre-aggregated tf, shared exchange subtree
    def newForm = {
      val grouped = toks.groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("tf"))
      val tokdf = grouped.groupBy("tok").agg(count(lit(1)).as("df"))
      grouped.join(tokdf, "tok")
        .groupBy("doc_id")
        .agg(sum("tf").as("n_toks"),
          (sum(col("df") * col("tf")).cast(DoubleType) /
            sum("tf").cast(DoubleType)).as("mean_df"))
        .orderBy("doc_id")
    }
    val d = oldForm.exceptAll(newForm).count() +
      newForm.exceptAll(oldForm).count()
    println(s"[docrarity] identity diff=$d (must be 0)")
    require(d == 0)
    oldForm.count(); newForm.count() // warm both plans

    val samples = sys.env.getOrElse("SPARK_GRAFT_PROBE_SAMPLES", "7").toInt
    val (ta, tb) =
      (Array.ofDim[Double](samples), Array.ofDim[Double](samples))
    for (i <- 0 until samples) {
      var t0 = System.nanoTime(); newForm.count()
      ta(i) = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); oldForm.count()
      tb(i) = (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Array[Double]) = xs.sorted.apply(xs.length / 2)
    println(f"[docrarity] new=${med(ta)}%5.2fs old=${med(tb)}%5.2fs  " +
      s"new=${ta.map(t => f"$t%.2f").mkString(",")}  " +
      s"old=${tb.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
