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

  /** Edge count at or below which the remaining contraction finishes as
    * ONE union-find pass in a single executor task instead of more
    * star rounds. Star rounds cost ~3 shuffle stages each regardless of
    * size; once the (already-contracted) edge set fits one task, the
    * O(E α(E)) local pass replaces the whole convergence tail — the
    * standard "finish small graphs locally" step of shuffle-based CC.
    * 1M edges ≈ 16 MB of pairs + ~64 MB of open-addressed union-find
    * state: far under any sane task memory, and NOT driver memory (the
    * pass runs in an executor task; only the conf value lives on the
    * driver). Set to 0 to force pure star rounds (specs do). */
  final val LocalFinishKey = "spark.lakehouse.cc.localFinishMaxEdges"
  private val DefaultLocalFinishMaxEdges = 1000000L

  /** Test observability: rounds the last components() call took. */
  private[graft] val lastRounds = new java.util.concurrent.atomic.AtomicInteger

  /** Test observability: whether the last call ended in the local pass. */
  private[graft] val lastLocalFinish =
    new java.util.concurrent.atomic.AtomicBoolean

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

  /** Open-addressed long→long map (linear probing, power-of-2 capacity)
    * — union-find parent table without per-entry boxing: 1M edges worst
    * case ≈ 2M nodes ≈ 64 MB of two long arrays, vs ~200 MB+ of boxed
    * HashMap entries. Key 0 is handled via a sentinel slot. */
  private final class LongLongMap(initialCapacity: Int) {
    private var cap = Integer.highestOneBit(
      math.max(16, initialCapacity * 2 - 1)) * 2
    private var keys = new Array[Long](cap)
    private var vals = new Array[Long](cap)
    private var used = new Array[Boolean](cap)
    private var size = 0
    private def idx(k: Long): Int = {
      var h = k * 0x9e3779b97f4a7c15L
      h ^= h >>> 32
      var i = (h & (cap - 1)).toInt
      while (used(i) && keys(i) != k) i = (i + 1) & (cap - 1)
      i
    }
    def getOrDefault(k: Long, dflt: Long): Long = {
      val i = idx(k)
      if (used(i)) vals(i) else dflt
    }
    def put(k: Long, v: Long): Unit = {
      val i = idx(k)
      if (!used(i)) {
        used(i) = true; keys(i) = k; size += 1
        if (size * 4 > cap * 3) grow()
      }
      vals(idx(k)) = v
    }
    private def grow(): Unit = {
      val (ok, ov, ou) = (keys, vals, used)
      cap *= 2
      keys = new Array[Long](cap); vals = new Array[Long](cap)
      used = new Array[Boolean](cap)
      var i = 0
      while (i < ok.length) {
        if (ou(i)) { val j = idx(ok(i)); used(j) = true; keys(j) = ok(i); vals(j) = ov(i) }
        i += 1
      }
    }
    def foreachEntry(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < cap) { if (used(i)) f(keys(i), vals(i)); i += 1 }
    }
  }

  /** Finish the contraction locally: one task, classic union-find with
    * min-id roots (union always attaches the larger root under the
    * smaller, so the final root IS the component minimum — the same
    * star-forest contract the rounds converge to). Emits (node, min)
    * for every non-root node; roots self-label downstream exactly like
    * star-forest centers. */
  private def localFinish(spark: SparkSession, edges: DataFrame,
      edgeCount: Long): DataFrame = {
    import spark.implicits._
    edges.as[(Long, Long)].repartition(1).mapPartitions { it =>
      val parent = new LongLongMap(math.min(edgeCount * 2, Int.MaxValue / 4).toInt)
      def find(x: Long): Long = {
        var r = x
        while (getP(r) != r) r = getP(r)
        var c = x
        while (getP(c) != c) { val n = getP(c); parent.put(c, r); c = n }
        r
      }
      def getP(x: Long): Long = parent.getOrDefault(x, x)
      while (it.hasNext) {
        val (u, v) = it.next()
        // register both endpoints so roots enumerate below
        if (getP(u) == u) parent.put(u, u)
        if (getP(v) == v) parent.put(v, v)
        val ru = find(u)
        val rv = find(v)
        if (ru < rv) parent.put(rv, ru)
        else if (rv < ru) parent.put(ru, rv)
      }
      val out = Vector.newBuilder[(Long, Long)]
      parent.foreachEntry((k, _) => {
        val r = find(k)
        if (r != k) out += ((k, r))
      })
      out.result().iterator
    }.toDF("u", "v")
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
    val localMax = spark.conf.getOption(LocalFinishKey).map(_.toLong)
      .getOrElse(DefaultLocalFinishMaxEdges)
    var converged = false
    var localDone = false
    var rounds = 0
    while (!converged && rounds < MaxRounds) {
      if (n <= localMax) {
        // small enough for one task: replace the remaining rounds with
        // a single union-find pass (its output IS a converged star
        // forest by construction — no fixpoint iteration to confirm)
        e = localFinish(spark, e, n)
        converged = true
        localDone = true
      } else {
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
    }
    lastRounds.set(rounds)
    lastLocalFinish.set(localDone)
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
