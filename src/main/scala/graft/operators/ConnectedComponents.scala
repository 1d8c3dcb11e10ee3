package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an edge list, as alternating large-star /
  * small-star rounds (Kiveris et al., "Connected Components in MapReduce
  * and Beyond", SOCC'14) — the canonical shuffle-based CC algorithm.
  *
  * Each round is two groupBy-explode passes over the edge relation; the
  * edge set converges to a star forest where every node points at the
  * minimum id of its component. Convergence is O(log² n) rounds
  * regardless of component diameter — unlike naive min-label
  * propagation, whose round count is the graph diameter (a 1M-long
  * duplicate chain would need 1M shuffles; this needs ~40). No driver
  * state beyond the per-round convergence counter; every pass is a plain
  * aggregation the planner can AQE-coalesce.
  */
object ConnectedComponents {

  private val MaxRounds = 50

  /** Test observability: rounds the last components() call took. */
  private[graft] val lastRounds = new java.util.concurrent.atomic.AtomicInteger

  /** Star-step core: group symmetric/directed neighbor lists per node,
    * link each selected neighbor to the minimum of the neighborhood. */
  private def largeStar(edges: DataFrame): DataFrame =
    edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
      .groupBy("u").agg(collect_set(col("v")).as("ns"))
      .select(col("u"),
        least(col("u"), array_min(col("ns"))).as("m"), col("ns"))
      .select(col("m"), explode(col("ns")).as("v"), col("u"))
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))

  private def smallStar(edges: DataFrame): DataFrame = {
    val directed = edges.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    directed
      .groupBy("u").agg(collect_set(col("v")).as("ns"))
      .select(col("u"), array_min(col("ns")).as("m"), col("ns"))
      .select(col("m"),
        explode(array_union(col("ns"), array(col("u")))).as("v"))
      .where(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** @param edges two-column DataFrame (u, v) of undirected edges
    * @return (id, component) — every node present in `edges`, labeled
    *         with the minimum node id reachable from it (including
    *         itself); isolated nodes don't appear (they were never in
    *         `edges`).
    */
  def components(spark: SparkSession, edges: DataFrame): DataFrame = {
    // localCheckpoint everywhere: truncates per-round lineage (each
    // round otherwise doubles the logical plan and Catalyst re-analysis
    // goes quadratic) and stops the (possibly expensive) upstream edge
    // pipeline from recomputing in round 1 + the convergence check
    val in = edges.toDF("u", "v").localCheckpoint()
    var e = in.where(col("u") =!= col("v")).distinct().localCheckpoint()
    var n = e.count()
    var converged = false
    var rounds = 0
    while (!converged && rounds < MaxRounds) {
      val next = smallStar(largeStar(e)).distinct().localCheckpoint()
      val nn = next.count()
      // sets of equal size with an empty one-sided difference are equal
      // — one except job per round, not two (both sides materialized)
      converged = nn == n && next.except(e).isEmpty
      e = next
      n = nn
      rounds += 1
    }
    lastRounds.set(rounds)
    require(converged, s"connected components did not converge in $MaxRounds rounds")
    // star forest: every u points at its component min; add the roots,
    // plus nodes that appeared ONLY in self-loop edges (filtered from
    // the contraction input but still "present in edges" per contract —
    // they label themselves)
    val members = e.select(col("u").as("id"), col("v").as("component"))
    val labeled = members.union(
        e.select(col("v").as("id"), col("v").as("component")).distinct())
      .distinct()
    val allNodes = in.select(col("u").as("id"))
      .union(in.select(col("v").as("id"))).distinct()
    labeled.union(
        allNodes.join(labeled.select("id"), Seq("id"), "left_anti")
          .withColumn("component", col("id")))
      .distinct()
  }
}
