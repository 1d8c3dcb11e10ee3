package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ConnectedComponents, RangeJoin}

/** Unit-level checks for the composed graph/join operators backing
  * q_dup_clusters and q_range_join (value-level parity with DuckDB is
  * covered by the oracle gate; these pin the operator semantics on
  * hand-built inputs where the expected answer is enumerable). */
class GraphJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ---- ConnectedComponents ------------------------------------------

  /** Run `body` with the local-finish cutover pinned to `maxEdges`
    * (0 = force pure star rounds), restoring the session default. */
  private def withLocalFinish[A](maxEdges: Long)(body: => A): A = {
    spark.conf.set(ConnectedComponents.LocalFinishKey, maxEdges.toString)
    try body
    finally spark.conf.unset(ConnectedComponents.LocalFinishKey)
  }

  test("cc: two components + chain, labels are component minima") {
    // chain 1-2-3-4 (diameter 3) and pair 10-11, plus redundant edge
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (4L, 3L))
      .toDF("u", "v")
    val got = ConnectedComponents.components(spark, edges)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L)))
  }

  test("cc: single star and self-loops collapse") {
    val edges = Seq((5L, 9L), (5L, 7L), (5L, 5L), (9L, 7L)).toDF("u", "v")
    val got = ConnectedComponents.components(spark, edges)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((5L, 5L), (7L, 5L), (9L, 5L)))
  }

  test("cc: long path converges (log rounds, not diameter rounds)") {
    // a 64-node path is diameter 63: naive min-propagation would need
    // 63 rounds and trip MaxRounds=50; star-contraction must not.
    // Local finish forced OFF so the star rounds are what's tested.
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("u", "v")
    val got = withLocalFinish(0) {
      ConnectedComponents.components(spark, edges)
        .as[(Long, Long)].collect().toSet
    }
    assert(got == (1L to 64L).map(i => (i, 1L)).toSet)
    assert(!ConnectedComponents.lastLocalFinish.get)
    // star contraction halves-or-better per round pair: well under the
    // 63 rounds diameter-bound propagation would need
    assert(ConnectedComponents.lastRounds.get <= 12,
      s"took ${ConnectedComponents.lastRounds.get} rounds")
  }

  test("cc: 100k-node single-component chain (adversarial diameter)") {
    // one component of 1e5 nodes as a pure path — the worst case for
    // round count AND the shape where naive label propagation needs 1e5
    // shuffles. The sorted-stream star steps hold task state constant
    // (no collected neighbor arrays anywhere), so the only resource
    // that grows with component size is shuffle volume.
    val n = 100000L
    val edges = spark.range(1L, n)
      .select(col("id").as("u"), (col("id") + 1L).as("v"))
    val got = withLocalFinish(0) {
      val df = ConnectedComponents.components(spark, edges)
      (df.count(), df.where(col("component") =!= 1L).count())
    }
    assert(got == (n, 0L))
    assert(!ConnectedComponents.lastLocalFinish.get)
    assert(ConnectedComponents.lastRounds.get <= 20,
      s"took ${ConnectedComponents.lastRounds.get} rounds")
  }

  test("cc: 100k-leaf hub star (the mega-component hub-row shape)") {
    // node 1 is adjacent to every other node — exactly the distribution
    // where a collect_set formulation funnels the whole component into
    // one executor row. Must converge without it.
    val n = 100000L
    val edges = spark.range(2L, n + 2L)
      .select(lit(1L).as("u"), col("id").as("v"))
    val got = withLocalFinish(0) {
      val df = ConnectedComponents.components(spark, edges)
      (df.count(), df.where(col("component") =!= 1L).count())
    }
    assert(got == (n + 1, 0L))
    assert(!ConnectedComponents.lastLocalFinish.get)
  }

  test("cc: local finish equals star rounds and engages below threshold") {
    // same randomized graph through BOTH execution paths; the hybrid
    // cutover must be invisible in the result
    val rnd = new scala.util.Random(99)
    val edges = (1 to 4000).map { _ =>
      (rnd.nextInt(2000).toLong, rnd.nextInt(2000).toLong)
    }.toDF("u", "v")
    val viaStars = withLocalFinish(0) {
      ConnectedComponents.components(spark, edges)
        .as[(Long, Long)].collect().toSet
    }
    assert(!ConnectedComponents.lastLocalFinish.get)
    val viaLocal = ConnectedComponents.components(spark, edges)
      .as[(Long, Long)].collect().toSet
    assert(ConnectedComponents.lastLocalFinish.get,
      "default threshold should take the local path at this size")
    assert(ConnectedComponents.lastRounds.get == 0)
    assert(viaLocal == viaStars)
  }

  test("cc: mid-contraction cutover (star rounds shrink, local pass finishes)") {
    // a dense graph (4 edges/node) contracts toward a star forest of
    // ≤ #nodes edges; a threshold between the two forces ≥1 star round
    // BEFORE the local pass takes over
    val rnd = new scala.util.Random(7)
    val raw = (1 to 6000).map { _ =>
      val u = rnd.nextInt(1500).toLong
      (u, (u + 1 + rnd.nextInt(1499)) % 1500L)
    }
    val distinctEdges = raw.map { case (u, v) =>
      (math.min(u, v), math.max(u, v))
    }.distinct.size
    assert(distinctEdges > 3000, s"fixture too sparse: $distinctEdges")
    val viaStars = withLocalFinish(0) {
      ConnectedComponents.components(spark, raw.toDF("u", "v"))
        .as[(Long, Long)].collect().toSet
    }
    val got = withLocalFinish(3000) {
      ConnectedComponents.components(spark, raw.toDF("u", "v"))
        .as[(Long, Long)].collect().toSet
    }
    assert(ConnectedComponents.lastLocalFinish.get)
    assert(ConnectedComponents.lastRounds.get >= 1)
    assert(got == viaStars)
  }

  // ---- RangeJoin ----------------------------------------------------

  test("cc: randomized graphs equal brute-force union-find") {
    // fixed-seed randomized equivalence over graph shapes the hand
    // cases don't enumerate (cycles, bridges, duplicate/self edges,
    // skewed degree) — guards the fused count+checksum convergence
    // screen and the join-based labeling against silent regressions
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 4) {
      val nNodes = Seq(20, 80, 200, 500)(trial - 1)
      val nEdges = nNodes * Seq(1, 2, 3, 1)(trial - 1) / 2 + 3
      val edges = (1 to nEdges).map { _ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong)
      }
      // brute-force union-find
      val parent = Array.tabulate(nNodes)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      for ((u, v) <- edges) {
        val (ru, rv) = (find(u.toInt), find(v.toInt))
        if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
      }
      val present = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val expect = present.map(n => n -> find(n.toInt).toLong).toMap
      // canonical label = component minimum
      val mins = expect.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
      val want = expect.map { case (n, r) => n -> mins(r) }

      val got = ConnectedComponents
        .components(spark, edges.toDF("u", "v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial (n=$nNodes, e=$nEdges)")
    }
  }

  test("band join rejects clashing non-key column names") {
    val left = Seq((1L, "a", 100L)).toDF("id", "k", "t")
    val right = Seq(("a", 100L, 1.0)).toDF("k", "t", "x") // t clashes
    val e = intercept[IllegalArgumentException] {
      RangeJoin.bandJoin(left, right, Seq("k"), "t", "t", 60L)
    }
    assert(e.getMessage.contains("share non-key column"))
  }

  test("band join matches the naive range predicate") {
    val left = Seq((1L, "a", 100L), (2L, "a", 250L), (3L, "b", 100L))
      .toDF("id", "k", "t")
    val right = Seq(("a", 90L, 1.0), ("a", 161L, 2.0), ("a", 339L, 3.0),
      ("b", 500L, 4.0), ("c", 100L, 5.0)).toDF("k", "rt", "x")
    val got = RangeJoin.bandJoin(left, right, Seq("k"), "t", "rt", 60L)
      .select("id", "rt").as[(Long, Long)].collect().toSet
    // id 1 (t=100): 90 (|10|), 161 is |61| > 60 — excluded
    // id 2 (t=250): none (161 is 89 away, 339 is 89 away)
    // id 3 (k=b, t=100): 500 is 400 away — none
    assert(got == Set((1L, 90L)))

    val got2 = RangeJoin.bandJoin(left, right, Seq("k"), "t", "rt", 100L)
      .select("id", "rt").as[(Long, Long)].collect().toSet
    assert(got2 == Set((1L, 90L), (1L, 161L), (2L, 161L), (2L, 339L)))
  }

  test("band join emits each qualifying pair exactly once") {
    val left = Seq((1L, "a", 100L)).toDF("id", "k", "t")
    val right = Seq(("a", 100L, 1.0)).toDF("k", "rt", "x")
    // same bin AND adjacent-bin replication could double-count without
    // the left-bin-is-single-valued property; row count must be 1
    val rows = RangeJoin.bandJoin(left, right, Seq("k"), "t", "rt", 50L)
    assert(rows.count() == 1L)
    assert(rows.columns.toSeq == Seq("id", "k", "t", "rt", "x"))
  }

  test("band join equals the naive predicate on randomized inputs") {
    // fixed-seed randomized equivalence: the binned rewrite must match
    // a brute-force cross-join filter on every draw
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val tol = Seq(7L, 50L, 1000L)(trial - 1)
      val keys = Seq("a", "b", "c")
      val left = (1 to 60).map(i =>
        (i.toLong, keys(rnd.nextInt(3)), rnd.nextLong(4000) - 2000))
        .toDF("id", "k", "t")
      val right = (1 to 60).map(i =>
        (keys(rnd.nextInt(3)), rnd.nextLong(4000) - 2000, i.toDouble))
        .toDF("k", "rt", "x")
      val banded = RangeJoin.bandJoin(left, right, Seq("k"), "t", "rt", tol)
        .select("id", "rt", "x").as[(Long, Long, Double)].collect().toSet
      val naive = left.join(right, "k")
        .where(abs(col("t") - col("rt")) <= tol)
        .select("id", "rt", "x").as[(Long, Long, Double)].collect().toSet
      assert(banded == naive, s"trial $trial tol=$tol")
    }
  }

  test("band join is exact at epoch-nanosecond magnitudes") {
    // beyond 2^53, double division misbins near-boundary values: with
    // tol=21600000000000 a pair within tolerance could land in bins 2
    // apart and vanish. These values sit within double-rounding range
    // of a bin boundary; the long-arithmetic floorBin must keep them.
    val tol = 21600000000000L
    val bin = 78000L // arbitrary bin index at 2024-epoch-ns scale
    val boundary = bin * tol
    // left sits 1ns below a bin boundary: double division would round
    // its bin UP to `bin`, putting the Δ=tol partner (two bins down)
    // outside the ±1 replication — silently dropped
    val left = Seq((1L, "a", boundary - 1L)).toDF("id", "k", "t")
    val right = Seq(
      ("a", boundary - 1L - tol, 1.0), // Δ = tol exactly: include
      ("a", boundary + tol, 2.0) // Δ = tol + 1: exclude
    ).toDF("k", "rt", "x")
    val got = RangeJoin.bandJoin(left, right, Seq("k"), "t", "rt", tol)
      .select("id", "x").as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 1.0)))
  }

  test("cc: nodes appearing only in self-loops label themselves") {
    val edges = Seq((7L, 7L), (1L, 2L)).toDF("u", "v")
    val got = ConnectedComponents.components(spark, edges)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((7L, 7L), (1L, 1L), (2L, 1L)))
  }

  test("band join negative times bin correctly") {
    val left = Seq((1L, "a", -10L)).toDF("id", "k", "t")
    val right = Seq(("a", 10L, 1.0), ("a", -75L, 2.0)).toDF("k", "rt", "x")
    val got = RangeJoin.bandJoin(left, right, Seq("k"), "t", "rt", 60L)
      .select("id", "rt").as[(Long, Long)].collect().toSet
    // |(-10) - 10| = 20 qualifies; |(-10) - (-75)| = 65 > 60 does not
    // (floor division must bin toward -inf — truncation would misplace
    // negative timestamps at bin boundaries)
    assert(got == Set((1L, 10L)))
  }
}
