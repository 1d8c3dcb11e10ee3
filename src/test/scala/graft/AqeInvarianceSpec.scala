package graft

import org.scalatest.funsuite.AnyFunSuite

/** Results must be identical with adaptive query execution on and off:
  * the operators' correctness may not hinge on AQE's runtime re-plans
  * (coalesced shuffles, demoted broadcasts, skew splits). One
  * representative per plan family — agg, LSH join, CC contraction
  * (star rounds AND local finish), window, broadcast topk, DML-backed
  * delta scan. */
class AqeInvarianceSpec extends AnyFunSuite {
  import TestSpark._

  private val names = Seq("q1_agg", "q_near_dedup", "q_dup_clusters",
    "q_window_rank", "q_sim_topk", "deletion_vectors")

  private def run(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq

  test("query results are AQE-invariant") {
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    try for (name <- names) {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      val withAqe = run(name)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val withoutAqe = run(name)
      assert(withAqe == withoutAqe,
        s"$name diverges under AQE toggle (${withAqe.length} vs " +
          s"${withoutAqe.length} rows)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", before)
  }

  test("query results are shuffle-partition-count invariant") {
    // the cluster knob nobody controls per-query: sorted-stream caps,
    // star rounds, and window ranks must not depend on how many
    // partitions a shuffle lands in (a 1000-executor cluster runs
    // thousands, local tests run 32, state stores run 4)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val baseline = names.map(n => n -> run(n)).toMap
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
      for (name <- names)
        assert(run(name) == baseline(name),
          s"$name diverges at 7 shuffle partitions")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
