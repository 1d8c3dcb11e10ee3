package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.{SimilarityQueries, T}

/** Dev probe for the PQ candidate stage: where does recall go — coarse
  * pruning (IVF ceiling), ADC ranking, or the cand cutoff? */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val k = 20
    val brute = SimilarityQueries.bruteTopK(spark, sf, 0, k)
      .collect().map(_.getLong(0)).toSet

    // ceiling: exact search restricted to the probed cells
    val ivf = SimilarityQueries.annIvf(spark, sf, 0, k, 8)
      .collect().map(_.getLong(0)).toSet
    println(s"IVF(ceiling) recall = ${(brute intersect ivf).size.toDouble / k}")

    for (cand <- Seq(32, 64, 96, 128, 192)) {
      val pq = SimilarityQueries.annPq(spark, sf, 0, k, 8, cand)
        .collect().map(_.getLong(0)).toSet
      println(s"PQ cand=$cand recall = ${(brute intersect pq).size.toDouble / k}")
    }

    val path = SimilarityQueries.pqIndexPath(spark, sf)
    val codes = spark.read.parquet(path)
    println("total indexed vectors = " + codes.count())
    spark.stop()
  }
}
