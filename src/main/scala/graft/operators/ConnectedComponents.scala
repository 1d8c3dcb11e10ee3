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

  /** Star-step core: link each selected neighbor of a node to the
    * minimum of that node's neighborhood.
    *
    * Formulated as min-aggregate + equi-join back on the node — NOT as
    * `collect_set` + explode: during contraction the component-minimum
    * node's neighborhood grows toward the whole component, so a
    * collected array would concentrate a 10⁸-member duplicate cluster
    * into one executor row (OOM). min() is a partial aggregation
    * (map-side combined, constant per-row state) and the join is a
    * plain shuffled equi-join on u — both AQE-skew-splittable, so no
    * row anywhere holds more than a constant number of values no
    * matter how big one component gets. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u")
      .agg(least(col("u"), min(col("v"))).as("m"))
    sym.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  private def smallStar(edges: DataFrame): DataFrame = {
    val directed = edges.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val mins = directed.groupBy("u").agg(min(col("v")).as("m"))
    // every neighbor v links to m (skipping v == m), and u itself links
    // to m (u is the max of each edge, so u > m always)
    directed.join(mins, "u")
      .where(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
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
