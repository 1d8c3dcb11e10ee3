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

  test("query results are AQE-invariant") {
    for (name <- names) {
      def run(): Seq[String] =
        SparkEntry.queries(name)(spark, sf).collect()
          .map(_.toString).toSeq
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      val withAqe = run()
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val withoutAqe =
        try run()
        finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      assert(withAqe == withoutAqe,
        s"$name diverges under AQE toggle (${withAqe.length} vs " +
          s"${withoutAqe.length} rows)")
    }
  }
}
