package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** Two-level coarse-quantizer rehearsal (dev probe, results cited in
  * SCALE.md) — the ARITHMETIC sequel to CentroidGateProbe.
  *
  * The size gate fixed flat assignment's memory shape at production
  * nlist, but both flat shapes still compute O(n × nlist) dot
  * products — the measured walls at nlist=10^5 × dim 512 (13.6 s
  * shuffle / 10.6 s broadcast for 2 000 vectors) are arithmetic, not
  * transport. The two-level route cuts the count to
  * O(n × (k1 + w·nlist/k1)) ≈ O(n × 2√nlist): at 10^5 cells with
  * k1 = 316 and w = 2 that is ~950 dots per vector instead of
  * 100 000 — ~100× less work, the construction FAISS-style systems
  * use to push cell counts past what exhaustive scoring affords.
  *
  * This probe runs the same synthetic shape as CentroidGateProbe
  * (identical generators) and measures: the one-time super-level
  * training wall, flat gated assignment vs two-level assignment on
  * the same batch, their agreement fraction (two-level is exact
  * except where the true cell hangs under a super outside the top-w
  * routes), and the single-probe coarse ranking both ways.
  *
  * Run: sbt "runMain graft.tools.TwoLevelRouteProbe [nlist] [n]".
  */
object TwoLevelRouteProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nlist = args.headOption.map(_.toInt).getOrElse(100000)
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val dim = 512
    val k1 = math.ceil(math.sqrt(nlist.toDouble)).toInt

    // the CentroidGateProbe generators, verbatim — same shape, same
    // distribution, so the walls compare across the two probes
    val centroids = spark.range(nlist.toLong)
      .select(col("id").as("cid"))
      .withColumn("cv", expr(
        s"transform(sequence(1, $dim), d -> " +
          "cast(pmod(cid * 2654435761 + d * 40503, 1000) as double) / 500 - 1)"))
      .repartition(32)
      .localCheckpoint()
    val batch = spark.range(n.toLong)
      .select(col("id").as("vec_id"), (col("id") % 3).as("label"))
      .withColumn("embedding", expr(
        s"transform(sequence(1, $dim), d -> " +
          "cast(pmod(vec_id * 48271 + d * 16807, 1000) as float) / 500 - 1)"))
      .localCheckpoint()

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[route] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    println(s"[route] nlist=$nlist dim=$dim k1=$k1 n=$n " +
      s"(flat: ${nlist} dots/vector; two-level w=2: " +
      s"~${k1 + 2 * nlist / k1} dots/vector)")

    val (sup, routed) = timed(s"super-level training (k1=$k1, one-time)") {
      val r = SimilarityQueries.trainSuperCentroids(centroids, k1, dim)
      (r._1.localCheckpoint(), r._2.localCheckpoint())
    }

    // two batches: UNIFORM random vectors (the adversarial case — in
    // dim 512 every centroid dot is a near-tie, so the nearest-cell
    // identity itself is fragile and routing errors are maximal) and
    // CLUSTERED vectors (each generated beside a real centroid — the
    // distribution an IVF index exists for)
    val clustered = spark.range(n.toLong)
      .select(col("id").as("vec_id"), (col("id") % 3).as("label"),
        (col("id") * 37 % nlist).as("home"))
      .withColumn("embedding", expr(
        s"transform(sequence(1, $dim), d -> cast(" +
          "(cast(pmod(home * 2654435761 + d * 40503, 1000) as double) / 500 - 1)" +
          " + (cast(pmod(vec_id * 48271 + d * 16807, 1000) as double) / 5000)" +
          " as float))"))
      .drop("home")
      .localCheckpoint()

    for ((name, b) <- Seq("uniform" -> batch, "clustered" -> clustered)) {
      val flat = timed(s"flat gated assignment [$name]") {
        SimilarityQueries.assignTo(b, centroids, nlist.toLong, dim)
          .select("vec_id", "cid").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      for (w <- Seq(1, 2, 4, 8)) {
        val two = timed(s"two-level assignment [$name, w=$w]") {
          SimilarityQueries.assignTwoLevel(b, sup, routed, w)
            .select("vec_id", "cid").collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
        }
        val agree = two.count { case (v, c) => flat(v) == c }.toDouble / n
        println(f"[route]   agreement vs flat [$name, w=$w]: $agree%.4f " +
          f"(~${k1 + w * nlist / k1} dots/vector vs $nlist flat)")
      }
    }

    // single-probe coarse ranking, both ways (the search-side stage)
    val probeVec = batch.where(col("vec_id") === 0)
      .select(col("embedding").as("pv")).localCheckpoint()
    timed("flat coarse rank (nprobe=8 of nlist)") {
      centroids.crossJoin(broadcast(probeVec))
        .withColumn("sim", graft.functions.VectorExpressions
          .vectorDot(col("cv"), col("pv")))
        .orderBy(desc("sim"), asc("cid")).limit(8)
        .select("cid").collect()
    }
    timed("two-level coarse rank (4 supers -> nprobe=8 children)") {
      val topS = sup.crossJoin(broadcast(probeVec))
        .withColumn("ssim", graft.functions.VectorExpressions
          .vectorDot(col("cv"), col("pv")))
        .orderBy(desc("ssim"), asc("scid")).limit(4)
        .select("scid").collect().map(_.getLong(0)).toSeq
      routed.where(col("scid").isInCollection(topS))
        .crossJoin(broadcast(probeVec))
        .withColumn("sim", graft.functions.VectorExpressions
          .vectorDot(col("cv"), col("pv")))
        .orderBy(desc("sim"), asc("cid")).limit(8)
        .select("cid").collect()
    }
    spark.stop()
  }
}
