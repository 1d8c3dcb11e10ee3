package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** Centroid-broadcast ceiling rehearsal (dev probe, results cited in
  * SCALE.md).
  *
  * The fixture indexes run at nlist ~10, where the centroid relation is
  * a few KB and broadcasting it is free. A production coarse quantizer
  * runs nlist 10^5-10^6 at dim 512 — 0.4-4 GB as rows — which breaks
  * the broadcast threshold, one resident copy per executor, and (if
  * collected) driver heap. `assignTo`'s size gate flips the assignment
  * to a shuffle-replicate nested loop whose scoring projection is
  * vector-free after the partial argmax (shuffled bytes
  * O(n × centroidPartitions × 32B)); this probe MEASURES both shapes
  * at a production-shaped nlist so the gate's ceiling is a number, not
  * a belief:
  *
  *  - nlist = 10^5 × dim 512 = ~410 MB of centroid rows (41× the
  *    default 10 MB broadcast threshold);
  *  - a batch of `n` arriving vectors assigned against it, once with
  *    the threshold raised so the broadcast shape still engages
  *    (measuring what the un-gated plan costs) and once through the
  *    gate's shuffle-replicate shape;
  *  - parity asserted on the two assignments (same max_by rule).
  *
  * The assignment work is O(n × nlist) exact dot products either way —
  * the gate changes MEMORY shape, not arithmetic. Production systems
  * with 10^6 cells route through a coarse-of-coarse index to cut the
  * arithmetic too; that is an index-build variant, out of scope for
  * the gate.
  *
  * Run: sbt "runMain graft.tools.CentroidGateProbe [nlist] [n]".
  */
object CentroidGateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the broadcast shape at 410 MB needs driver/executor headroom —
      // part of what this probe demonstrates
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nlist = args.headOption.map(_.toInt).getOrElse(100000)
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val dim = 512

    // deterministic centroids and batch (seeded per row)
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

    val bytesEst = nlist.toLong * (dim * 8L + 80L)
    println(s"[gate] nlist=$nlist dim=$dim -> centroid relation " +
      s"~${bytesEst / 1024 / 1024} MB (threshold default 10 MB)")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[gate] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // 1) the GATED shape (shuffle-replicate NL): what production runs
    val gated = timed("shuffle-replicate assign (gated shape)") {
      SimilarityQueries.assignTo(batch, centroids, nlist.toLong, dim)
        .select("vec_id", "cid").collect().sortBy(_.getLong(0))
    }

    // 2) the broadcast shape FORCED past its design point (threshold
    // raised to 1 GB so the gate keeps the broadcast): the cost the
    // gate exists to avoid — one resident copy of the whole centroid
    // relation per executor plus the broadcast build itself
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      (1024L * 1024 * 1024).toString)
    val broadcasted =
      try timed("broadcast assign (forced past design point)") {
        SimilarityQueries.assignTo(batch, centroids, nlist.toLong, dim)
          .select("vec_id", "cid").collect().sortBy(_.getLong(0))
      } catch {
        case e: Throwable =>
          println(s"[gate] broadcast shape FAILED at nlist=$nlist: " +
            s"${e.getClass.getSimpleName}: ${e.getMessage}")
          null
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    if (broadcasted != null) {
      val same = gated.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        broadcasted.map(r => (r.getLong(0), r.getLong(1))).toSeq
      println(s"[gate] parity gated == broadcast: $same")
      require(same, "gated and broadcast assignments diverged")
    }
    println(s"[gate] assigned ${gated.length} vectors")
    spark.stop()
  }
}
