package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
    * Formulated as repartition-by-node + in-partition sort + a single
    * streaming pass — NOT as `collect_set` + explode: during
    * contraction the component-minimum node's neighborhood grows toward
    * the whole component, so a collected array would concentrate a
    * 10⁸-member duplicate cluster into one executor ROW (a single value
    * cannot spill — OOM). Sorting each node's rows by v makes the
    * group's minimum its FIRST row, so the pass holds O(1) state per
    * task no matter how hot the node: one shuffle + sort, no window
    * buffer, no array, memory-constant at ANY component size.
    * (Measured at sf0.1: this matches the collect_set variant's speed;
    * min-aggregate + self-join and whole-partition min-window variants
    * were both ~45% slower — the extra shuffle / the spillable window
    * buffer cost more than the sort.) */
  private def largeStar(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sym = edges.select(col("u").cast(LongType), col("v").cast(LongType))
      .toDF("u", "v")
      .union(edges.select(col("v").cast(LongType), col("u").cast(LongType))
        .toDF("u", "v"))
    sym.repartition(col("u")).sortWithinPartitions("u", "v")
      .as[(Long, Long)]
      .mapPartitions { it =>
        // groups arrive clustered and v-ascending: the first row of a
        // group carries min(v); m = least(u, min v) per the paper
        var curU = Long.MinValue
        var m = 0L
        var started = false
        it.flatMap { case (u, v) =>
          if (!started || u != curU) {
            curU = u; m = math.min(u, v); started = true
          }
          if (v > u) Iterator.single((v, m)) else Iterator.empty
        }
      }.toDF("u", "v")
  }

  private def smallStar(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val directed = edges.select(
      greatest(col("u").cast(LongType), col("v").cast(LongType)).as("u"),
      least(col("u").cast(LongType), col("v").cast(LongType)).as("v"))
    directed.repartition(col("u")).sortWithinPartitions("u", "v")
      .as[(Long, Long)]
      .mapPartitions { it =>
        // every neighbor v links to the group min m (skipping v == m),
        // and u itself links to m (u is each edge's max, so u > m);
        // the first row of a group IS its min, so it emits the (u, m)
        // link and every later row streams through with O(1) state
        var curU = Long.MinValue
        var m = 0L
        var started = false
        it.flatMap { case (u, v) =>
          if (!started || u != curU) {
            curU = u; m = v; started = true
            Iterator.single((u, m))
          } else if (v != m) Iterator.single((v, m))
          else Iterator.empty
        }
      }.toDF("u", "v")
  }

  /** Materialize a round's edge set: persist the underlying RDD, force
    * it, and wrap it back as a LEAF DataFrame (createDataFrame on an
    * RDD), so per-round Catalyst plans stay constant-size (the naive
    * loop doubles the plan every round and re-analysis goes quadratic).
    *
    * persist — not localCheckpoint — for two reasons that matter at
    * cluster scale: (1) the superseded round can be unpersisted
    * DETERMINISTICALLY (localCheckpoint blocks are only reclaimed when
    * a JVM GC happens to collect the RDD reference and ContextCleaner
    * notices — on a large heap that can be never, and an iterative
    * algorithm then accumulates every round's blocks for the job's
    * lifetime; observed as multi-×10 bench spread); (2) the RDD keeps
    * its lineage, so losing an executor degrades to recompute instead
    * of failing the job (localCheckpoint explicitly forfeits that). */
  /** splitmix64 finalizer — scrambles an edge into a well-mixed 64-bit
    * value so the SUM over a (distinct) edge set is an
    * order-independent set checksum. */
  private def mix(u: Long, v: Long): Long = {
    var z = u * 0x9e3779b97f4a7c15L + v
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def materialize(spark: SparkSession, df: DataFrame)
      : (DataFrame, org.apache.spark.rdd.RDD[(Long, Long)], Long, Long) = {
    import spark.implicits._
    val rdd = df.as[(Long, Long)].rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE job per round: count and set checksum in the same pass (the
    // naive count + except convergence check was two extra shuffling
    // jobs per round — the dominant share of the loop's bench spread)
    val (n, ck) = rdd.mapPartitions { it =>
      var c = 0L
      var s = 0L
      while (it.hasNext) {
        val (u, v) = it.next()
        c += 1
        s += mix(u, v)
      }
      Iterator.single((c, s))
    }.fold((0L, 0L))((a, b) => (a._1 + b._1, a._2 + b._2))
    (spark.createDataFrame(rdd).toDF("u", "v"), rdd, n, ck)
  }

  /** @param edges two-column DataFrame (u, v) of undirected edges
    * @return (id, component) — every node present in `edges`, labeled
    *         with the minimum node id reachable from it (including
    *         itself); isolated nodes don't appear (they were never in
    *         `edges`).
    */
  def components(spark: SparkSession, edges: DataFrame): DataFrame = {
    // materializing `in` stops the (possibly expensive) upstream edge
    // pipeline from recomputing in round 1 + the convergence check
    val (in, _, _, _) = materialize(spark, edges.toDF("u", "v")
      .select(col("u").cast(LongType), col("v").cast(LongType)))
    var (e, eRdd, n, ck) =
      materialize(spark, in.where(col("u") =!= col("v")).distinct())
    var converged = false
    var rounds = 0
    while (!converged && rounds < MaxRounds) {
      val (next, nextRdd, nn, nck) =
        materialize(spark, smallStar(largeStar(e)).distinct())
      // (count, checksum) equality screens convergence with ZERO extra
      // jobs (both computed inside materialize's single pass); the one
      // `except` job runs only on a screen hit — normally exactly once,
      // at the actual fixpoint — and confirms set equality EXACTLY, so
      // a checksum collision can never end the loop early
      converged = nn == n && nck == ck && next.except(e).isEmpty
      // free the superseded round NOW (see materialize); the final
      // round and `in` stay pinned — the returned frame reads them
      eRdd.unpersist(blocking = false)
      e = next
      eRdd = nextRdd
      n = nn
      ck = nck
      rounds += 1
    }
    lastRounds.set(rounds)
    require(converged, s"connected components did not converge in $MaxRounds rounds")
    // star forest: every u points at its component min. Label every
    // node present in the ORIGINAL edges with its star target — roots
    // and nodes that appeared only in self-loop edges (filtered from
    // the contraction input but still "present in edges" per contract)
    // carry no out-edge and label themselves via the coalesce. One
    // aggregation + one distinct + one join, replacing the previous
    // five-shuffle union/distinct/anti-join chain.
    val targets = e.groupBy(col("u").as("id"))
      .agg(min(col("v")).as("__comp")) // single-valued at the fixpoint
    val allNodes = in.select(col("u").as("id"))
      .union(in.select(col("v").as("id"))).distinct()
    allNodes.join(targets, Seq("id"), "left")
      .select(col("id"), coalesce(col("__comp"), col("id")).as("component"))
  }
}
