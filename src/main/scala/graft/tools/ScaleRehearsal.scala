package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off sf1 dedup-pipeline rehearsal (round-7 judge ask): build a
  * 10x documents slice (half exact replicas, half perturbed near-dups —
  * deliberately duplicate-heavy so LSH buckets and duplicate components
  * are 10x+ hotter than the organic fixture), then run the MinHash
  * signature, near-dup and duplicate-cluster queries once each and
  * report wall times plus the bucket/component size distribution the
  * caps have to absorb. Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ScaleRehearsal"
  *
  * Results recorded in SCALE.md ("sf1 rehearsal").
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val outDir = "target/sf1_rehearsal"
    val docs1 = s"$outDir" // dir holding documents.parquet
    val f = new java.io.File(s"$docs1/documents.parquet")
    if (!f.exists()) {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
      // copy 0 = original; copies 1-4 exact replicas (exact-dup
      // clusters of size >= 5); copies 5-9 tail-perturbed (near-dups:
      // most shingles shared, so they band-collide with the original)
      val replicas = (0 until 10).map { k =>
        val shifted = base.withColumn("doc_id",
          col("doc_id") + lit(k.toLong * 10000000L))
        if (k < 5) shifted
        // doc-SPECIFIC suffix: unique trailing shingles, so a perturbed
        // copy near-dups only its own original (a copy-shared suffix
        // chains every document into one 50k mega-component through the
        // suffix shingles — run once as an adversarial case: 4 CC
        // rounds, 8.2 s, no OOM at 8g; recorded in SCALE.md)
        else shifted.withColumn("text",
          concat(col("text"), lit(" v"), col("doc_id")))
      }.reduce(_ unionByName _)
      // single file per the fixture layout the queries expect
      val staging = s"$outDir/.staging"
      replicas.coalesce(4).write.mode("overwrite").parquet(staging)
      new java.io.File(outDir).mkdirs()
      val parts = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      // queries read the DIRECTORY documents.parquet — keep parts inside
      val dst = new java.io.File(s"$outDir/documents.parquet")
      org.apache.commons.io.FileUtils.deleteQuietly(dst)
      dst.mkdirs()
      parts.zipWithIndex.foreach { case (p, i) =>
        java.nio.file.Files.move(p.toPath,
          new java.io.File(dst, s"part-$i.parquet").toPath)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(staging))
      println(s"[rehearsal] built $dst: ${spark.read.parquet(dst.toString).count()} docs")
    }

    // 10x embeddings slice: exact replicas with shifted ids, so every
    // replica set lands in ONE k-means cluster — clusters are 10x
    // hotter and the within-cluster pairwise stage carries 100x the
    // pairs, which is precisely the load SemClusterMax has to absorb
    val fe = new java.io.File(s"$docs1/embeddings.parquet")
    if (!fe.exists()) {
      val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val replicas = (0 until 10).map { k =>
        base.withColumn("vec_id", col("vec_id") + lit(k.toLong * 10000000L))
      }.reduce(_ unionByName _)
      val staging = s"$outDir/.staging_emb"
      replicas.coalesce(4).write.mode("overwrite").parquet(staging)
      val parts = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      fe.mkdirs()
      parts.zipWithIndex.foreach { case (p, i) =>
        java.nio.file.Files.move(p.toPath,
          new java.io.File(fe, s"part-$i.parquet").toPath)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(staging))
      println(s"[rehearsal] built $fe: ${spark.read.parquet(fe.toString).count()} vectors")
    }

    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[rehearsal] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    timed("q_minhash_signatures") {
      graft.SparkEntry.queries("q_minhash_signatures")(spark, docs1).count()
    }
    timed("q_near_dedup") {
      graft.SparkEntry.queries("q_near_dedup")(spark, docs1).count()
    }
    timed("q_dup_clusters") {
      graft.SparkEntry.queries("q_dup_clusters")(spark, docs1).count()
    }
    println(s"[rehearsal] cc rounds: ${graft.operators.ConnectedComponents.lastRounds.get()}")
    timed("q_lm_score") {
      graft.SparkEntry.queries("q_lm_score")(spark, docs1).count()
    }
    timed("q_semdedup") {
      graft.SparkEntry.queries("q_semdedup")(spark, docs1).count()
    }
    val sd = graft.SparkEntry.queries("q_semdedup")(spark, docs1)
    val sdAgg = sd.agg(sum(col("is_dup").cast("long")), count(lit(1))).head
    val sdCl = sd.groupBy("cid").agg(count(lit(1)).as("n"))
      .agg(max("n"), count(lit(1))).head
    println(s"[rehearsal] semdedup dups=${sdAgg.get(0)}/${sdAgg.get(1)} " +
      s"cluster max=${sdCl.get(0)} n_clusters=${sdCl.get(1)}")

    // bucket-size distribution BEFORE the cap (what the cap absorbs)
    val docs = spark.read.parquet(s"$docs1/documents.parquet")
    val buckets = graft.queries.TextQueries.minhashBandsForAudit(spark, docs1)
      .groupBy("band", "k1", "k2").agg(count(lit(1)).as("n"))
    val top = buckets.agg(max("n"), expr("approx_percentile(n, 0.99)"),
      count(lit(1))).head
    println(s"[rehearsal] bucket max=${top.get(0)} p99=${top.get(1)} n_buckets=${top.get(2)}")
    val comp = graft.SparkEntry.queries("q_dup_clusters")(spark, docs1)
      .groupBy("cluster_id").agg(count(lit(1)).as("sz"))
      .agg(max("sz"), count(lit(1))).head
    println(s"[rehearsal] component max=${comp.get(0)} n_components=${comp.get(1)}")
    println(s"[rehearsal] heap=${Runtime.getRuntime.maxMemory() / (1024 * 1024)}MB docs=${docs.count()}")
    spark.stop()
  }
}
