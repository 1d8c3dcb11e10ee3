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

/** Exact-vs-PQ k-NN join crossover: at fixture scale the exact join's
  * pair count is tiny and PQ's extra joins cost more than they save;
  * this measures both at sf1 with DENSE probes (pair-dominated), where
  * the code-scored pairwise stage should win. Builds target/sf1_full
  * if missing. Run: sbt "runMain graft.tools.PqJoinProbe [modulus]". */
object PqJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = "target/sf1_full"
    if (!new java.io.File(s"$out/lineitem.parquet").exists())
      Sf1Bench.build(spark, "/root/testdata/sf0.1", out)
    val modulus = args.headOption.map(_.toInt).getOrElse(10)
    def time(label: String)(f: => Long): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[pqjoin] $label%-10s sample $i: " +
        f"${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
    }
    // warm both index builds out of the timings
    SimilarityQueries.pqIndexPath(spark, out)
    time("exact") {
      SimilarityQueries.knnJoin(spark, out, k = 5, nprobe = 4,
        probeModulus = modulus).count()
    }
    time("pq") {
      SimilarityQueries.knnJoinPq(spark, out, k = 5, nprobe = 4,
        cand = SimilarityQueries.PqJoinCand,
        probeModulus = modulus).count()
    }
    spark.stop()
  }
}
