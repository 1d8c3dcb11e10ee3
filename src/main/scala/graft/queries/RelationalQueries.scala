package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tier B relational surface (SURVEY.md §2): the query capabilities the
  * reference inherits from DataFusion via `sql_delta`
  * (reference: crates/datafusion/src/planner.rs:124-133), re-declared as
  * idiomatic Spark DataFrame programs with DuckDB oracle SQL.
  *
  * Scale notes: all plans are declarative — Catalyst pushes filters and
  * projections to the parquet scan, picks broadcast joins for dimension
  * tables, and keeps aggregation partial/final. Decimal casts exist for
  * cross-engine hash determinism, not correctness.
  */
object RelationalQueries {
  import T._

  val all: Seq[Q] = Seq(
    // ---- flagship aggregation (TPC-H Q1 shape) ----------------------
    Q("q1_agg",
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/CAST(count(l_quantity) AS DOUBLE) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/CAST(count(l_extendedprice) AS DOUBLE) AS avg_price,
        | CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)/CAST(count(l_discount) AS DOUBLE) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin) { (s, dir) =>
      load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampNTZType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
            .cast(DoubleType).as("sum_disc_price"),
          sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax")), 6)).cast(DoubleType).as("sum_charge"),
          davg(col("l_quantity"), 2).as("avg_qty"),
          davg(col("l_extendedprice"), 2).as("avg_price"),
          davg(col("l_discount"), 2).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(asc_nulls_last("l_returnflag"), asc_nulls_last("l_linestatus"))
    },

    // ---- projection / filter ---------------------------------------
    Q("q_project",
      """SELECT o_orderkey, o_custkey, o_totalprice,
        | o_totalprice * 0.9 AS discounted
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          (col("o_totalprice") * lit(0.9)).as("discounted"))
        .orderBy("o_orderkey")
    },

    Q("q_filter",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      load(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- joins ------------------------------------------------------
    Q("q_join_inner",
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      load(s, dir, "orders")
        .join(load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")
    },

    Q("q_join_left",
      """SELECT c_custkey, o_orderkey
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey NULLS LAST, o_orderkey NULLS LAST""".stripMargin) { (s, dir) =>
      load(s, dir, "customer")
        .join(load(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left")
        .select("c_custkey", "o_orderkey")
        .orderBy(asc_nulls_last("c_custkey"), asc_nulls_last("o_orderkey"))
    },

    Q("q_join_right",
      """SELECT c_custkey, o_orderkey
        |FROM orders RIGHT JOIN customer ON c_custkey = o_custkey
        |ORDER BY c_custkey NULLS LAST, o_orderkey NULLS LAST""".stripMargin) { (s, dir) =>
      load(s, dir, "orders")
        .join(load(s, dir, "customer"),
          col("c_custkey") === col("o_custkey"), "right")
        .select("c_custkey", "o_orderkey")
        .orderBy(asc_nulls_last("c_custkey"), asc_nulls_last("o_orderkey"))
    },

    Q("q_join_full",
      """SELECT a.c_custkey, b.o_orderkey
        |FROM (SELECT * FROM customer WHERE c_custkey < 500) a
        |FULL JOIN (SELECT * FROM orders WHERE o_custkey > 300) b
        |  ON a.c_custkey = b.o_custkey
        |ORDER BY a.c_custkey NULLS LAST, b.o_orderkey NULLS LAST""".stripMargin) { (s, dir) =>
      val c = load(s, dir, "customer").filter(col("c_custkey") < 500)
      val o = load(s, dir, "orders").filter(col("o_custkey") > 300)
      c.join(o, col("c_custkey") === col("o_custkey"), "full")
        .select("c_custkey", "o_orderkey")
        .orderBy(asc_nulls_last("c_custkey"), asc_nulls_last("o_orderkey"))
    },

    Q("q_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      load(s, dir, "customer")
        .join(load(s, dir, "orders").filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    Q("q_join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 350000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      load(s, dir, "customer")
        .join(load(s, dir, "orders").filter(col("o_totalprice") > 350000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    Q("q_join_theta",
      """SELECT n_name, r_name FROM nation JOIN region ON n_regionkey < r_regionkey
        |ORDER BY n_name, r_name""".stripMargin) { (s, dir) =>
      load(s, dir, "nation")
        .join(load(s, dir, "region"), col("n_regionkey") < col("r_regionkey"))
        .select("n_name", "r_name")
        .orderBy("n_name", "r_name")
    },

    Q("q_join_cross",
      """SELECT n_name, r_name FROM nation CROSS JOIN region
        |ORDER BY n_name, r_name""".stripMargin) { (s, dir) =>
      load(s, dir, "nation").crossJoin(load(s, dir, "region"))
        .select("n_name", "r_name")
        .orderBy("n_name", "r_name")
    },

    // Broadcast the dimension side explicitly — at 100 TB the fact side
    // must never shuffle for a small-dim join.
    Q("q_join_broadcast",
      """SELECT n_name, count(*) AS n_suppliers,
        | CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      load(s, dir, "supplier")
        .join(broadcast(load(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_suppliers"),
          dsum(col("s_acctbal"), 2).as("total_bal"))
        .orderBy("n_name")
    },

    // ---- aggregation -------------------------------------------------
    Q("q_agg",
      """SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        | min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      load(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("total"),
          min("o_totalprice").as("min_price"), max("o_totalprice").as("max_price"))
        .orderBy("o_orderstatus")
    },

    Q("q_agg_distinct",
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        | count(DISTINCT l_partkey) AS n_part
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"))
        .orderBy("l_returnflag")
    },

    Q("q_agg_filtered",
      """SELECT o_orderstatus,
        | count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      load(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          count(when(col("o_totalprice") > 100000, 1)).as("n_big"),
          sum(when(col("o_orderpriority") === "1-URGENT",
            dec(col("o_totalprice"), 2))).cast(DoubleType).as("urgent_total"))
        .orderBy("o_orderstatus")
    },

    Q("q_rollup",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin) { (s, dir) =>
      load(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("qty"))
        .orderBy(asc_nulls_last("l_returnflag"), asc_nulls_last("l_linestatus"))
    },

    Q("q_cube",
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin) { (s, dir) =>
      load(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_last("l_returnflag"), asc_nulls_last("l_linestatus"))
    },

    Q("q_grouping_sets",
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin) { (s, dir) =>
      load(s, dir, "lineitem").createOrReplaceTempView("gs_lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n
          |FROM gs_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin)
    },

    // sketch-based aggregates (HLL ndv + approximate percentile): the
    // raw sketch values differ across engines by construction, so the
    // CHECKED surface is a tolerance band — Spark computes both the
    // sketch and the exact value and emits whether the sketch landed
    // within ±5% of truth; the oracle restates the exact values (DuckDB
    // recomputes them) and TRUE for the bands. The exact-hash gate then
    // verifies the sketch's accuracy contract deterministically (HLL and
    // KLL are deterministic for a fixed input set). Exact companions:
    // q_agg_distinct, q_percentile.
    Q("q_approx_distinct",
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS exact_parts,
        | TRUE AS ndv_within_5pct,
        | TRUE AS p50_within_5pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          expr("percentile_approx(l_extendedprice, 0.5, 1000)")
            .cast(DoubleType).as("p50_approx"),
          expr("percentile(l_extendedprice, 0.5)")
            .cast(DoubleType).as("p50_exact"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("ndv_within_5pct"),
          (abs(col("p50_approx") - col("p50_exact")) <=
            abs(col("p50_exact")) * 0.05).as("p50_within_5pct"))
        .orderBy("l_returnflag")
    },

    // ---- windows -----------------------------------------------------
    Q("q_window_rank",
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        | row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag
        |             ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
        |ORDER BY l_returnflag, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("l_returnflag")
        .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
      load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          row_number().over(w).as("rn"), rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"))
        .orderBy("l_returnflag", "rn")
    },

    Q("q_window_lag",
      """SELECT o_custkey, o_orderkey,
        | lag(o_totalprice) OVER w AS prev_price,
        | lead(o_totalprice) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag("o_totalprice", 1).over(w).as("prev_price"),
          lead("o_totalprice", 1).over(w).as("next_price"))
        .orderBy("o_custkey", "o_orderkey")
    },

    Q("q_window_frame",
      """SELECT o_custkey, o_orderkey,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice"), 2)).over(w).cast(DoubleType)
            .as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    },

    Q("q_window_firstlast",
      """SELECT o_custkey, o_orderkey,
        | first_value(o_orderkey) OVER w AS first_order,
        | last_value(o_orderkey) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first("o_orderkey").over(w).as("first_order"),
          last("o_orderkey").over(wFull).as("last_order"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Skew-aware aggregation: two-phase salted sum over a low-cardinality
    // hot key (5 event types, 32 cores). Phase 1 spreads each hot key
    // over 16 salt buckets (map-side + 16-way parallel reduce); phase 2
    // merges the 80 partials. Exact decimal arithmetic keeps the result
    // identical to the plain GROUP BY oracle.
    Q("q_skew_salted",
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      T.events(s, dir)
        .withColumn("salt", pmod(col("event_id"), lit(16)))
        .groupBy("event_type", "salt")
        .agg(count(lit(1)).as("pn"),
          sum(T.dec(col("value"), 2)).as("pt"))
        .groupBy("event_type")
        .agg(sum("pn").as("n"), sum("pt").cast(DoubleType).as("total"))
        .orderBy("event_type")
    },

    // exact percentile: Spark `percentile` and DuckDB `quantile_cont`
    // share the linear-interpolation definition (pos = p*(n-1), lower +
    // frac*(upper-lower)), so the quartiles oracle exactly. The
    // approximate sketch variant lives with q_approx_distinct (sketches
    // differ per engine, rows-only by design).
    Q("q_percentile",
      """SELECT o_orderstatus,
        | quantile_cont(o_totalprice, 0.5) AS p50,
        | quantile_cont(o_totalprice, 0.25) AS p25,
        | quantile_cont(o_totalprice, 0.75) AS p75
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      load(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, array(0.25, 0.75))").as("iqr"))
        .select(col("o_orderstatus"), col("p50"),
          element_at(col("iqr"), 1).as("p25"),
          element_at(col("iqr"), 2).as("p75"))
        .orderBy("o_orderstatus")
    },

    // second-moment aggregates made engine-exact: variance/stddev from
    // EXACT decimal sums (Σx, Σx² carry no float error, and decimal
    // addition is order-independent), then ONE identical double
    // expression on both sides — deterministic where the built-in
    // var_samp/stddev (running double accumulation, partial-agg order)
    // is not.
    // NB: the decimal->double conversion must be CORRECTLY ROUNDED on
    // both sides. Spark's BigDecimal.doubleValue is; DuckDB's direct
    // decimal cast drifts 1 ULP at int128 magnitudes (seen at sf0.1 on
    // sum(x^2)), so the oracle routes the conversion through VARCHAR —
    // exact digits, then a correctly-rounded parse.
    Q("q_stats_agg",
      """WITH m AS (
        |  SELECT o_orderstatus, count(*) AS n,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |         AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) *
        |                  CAST(o_totalprice AS DECIMAL(18,2)))
        |         AS VARCHAR) AS DOUBLE) AS sxx
        |  FROM orders GROUP BY o_orderstatus
        |)
        |SELECT o_orderstatus, n,
        |  (sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)
        |    AS var_samp,
        |  sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
        |    AS stddev_samp
        |FROM m ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val x = T.dec(col("o_totalprice"), 2)
      val sx = sum(x).cast(DoubleType)
      val sxx = sum(x * x).cast(DoubleType)
      val n = count(lit(1)).cast(DoubleType)
      val varExpr = (sxx - sx * sx / n) / (count(lit(1)) - 1).cast(DoubleType)
      load(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), varExpr.as("var_samp"),
          sqrt(varExpr).as("stddev_samp"))
        .orderBy("o_orderstatus")
    },

    Q("q_window_ntile",
      """SELECT o_orderkey, ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.orderBy("o_totalprice", "o_orderkey")
      load(s, dir, "orders")
        .select(col("o_orderkey"), ntile(4).over(w).as("quartile"))
        .orderBy("o_orderkey")
    },

    Q("q_window_range",
      """SELECT o_orderstatus, o_orderkey, count(*) OVER (
        |   PARTITION BY o_orderstatus ORDER BY o_custkey
        |   RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS near_count
        |FROM orders ORDER BY o_orderstatus, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_orderstatus").orderBy("o_custkey")
        .rangeBetween(-10, Window.currentRow)
      load(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"),
          count(lit(1)).over(w).as("near_count"))
        .orderBy("o_orderstatus", "o_orderkey")
    },

    // ---- sort / top-k / limit / distinct ----------------------------
    Q("q_sort",
      """SELECT c_custkey, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC NULLS LAST, c_custkey""".stripMargin) { (s, dir) =>
      load(s, dir, "customer")
        .select("c_custkey", "c_acctbal")
        .orderBy(desc_nulls_last("c_acctbal"), asc("c_custkey"))
    },

    Q("q_topk",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10)
    },

    Q("q_topk_per_group",
      """SELECT o_orderstatus, o_orderkey, o_totalprice FROM (
        | SELECT *, row_number() OVER (PARTITION BY o_orderstatus
        |   ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) t
        |WHERE rn <= 3 ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      load(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_orderstatus", "o_orderkey", "o_totalprice")
        .orderBy(asc("o_orderstatus"), desc("o_totalprice"), asc("o_orderkey"))
    },

    Q("q_limit",
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin) { (s, dir) =>
      load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    },

    Q("q_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      load(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- set operations ---------------------------------------------
    Q("q_union",
      """SELECT o_custkey FROM orders WHERE o_totalprice > 250000
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val o = load(s, dir, "orders")
      o.filter(col("o_totalprice") > 250000).select("o_custkey")
        .union(o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"))
        .distinct()
        .orderBy("o_custkey")
    },

    Q("q_union_all",
      """SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 300000
        |UNION ALL
        |SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY k""".stripMargin) { (s, dir) =>
      val o = load(s, dir, "orders")
      o.filter(col("o_totalprice") > 300000).select(col("o_orderkey").as("k"))
        .union(o.filter(col("o_orderstatus") === "P").select(col("o_orderkey").as("k")))
        .orderBy("k")
    },

    Q("q_intersect",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val o = load(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    },

    Q("q_except",
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 350000
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      load(s, dir, "customer").select("c_custkey")
        .except(load(s, dir, "orders").filter(col("o_totalprice") > 350000)
          .select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey")
    },

    Q("q_pivot",
      """SELECT l_linestatus,
        | CAST(sum(CAST(CASE WHEN l_returnflag = 'A' THEN l_quantity END AS DECIMAL(18,2))) AS DOUBLE) AS qty_A,
        | CAST(sum(CAST(CASE WHEN l_returnflag = 'N' THEN l_quantity END AS DECIMAL(18,2))) AS DOUBLE) AS qty_N,
        | CAST(sum(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity END AS DECIMAL(18,2))) AS DOUBLE) AS qty_R
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (s, dir) =>
      load(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(T.dec(col("l_quantity"), 2)).cast(DoubleType))
        .withColumnsRenamed(Map("A" -> "qty_A", "N" -> "qty_N", "R" -> "qty_R"))
        .orderBy("l_linestatus")
    },

    Q("q_unpivot",
      """SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
        |UNION ALL
        |SELECT c_custkey, 'custkey_x2' AS metric, CAST(c_custkey * 2 AS DOUBLE) AS value FROM customer
        |ORDER BY c_custkey, metric""".stripMargin) { (s, dir) =>
      load(s, dir, "customer")
        .withColumn("custkey_x2", (col("c_custkey") * 2).cast(DoubleType))
        .withColumnRenamed("c_acctbal", "acctbal")
        .unpivot(Array(col("c_custkey")),
          Array(col("acctbal"), col("custkey_x2")), "metric", "value")
        .orderBy("c_custkey", "metric")
    },

    Q("q_intersect_all",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val o = load(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .intersectAll(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    },

    Q("q_except_all",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val o = load(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .exceptAll(o.filter(col("o_orderstatus") === "P").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // ---- subqueries (run through Spark SQL to exercise decorrelation)
    Q("q_subquery_in",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      load(s, dir, "customer").createOrReplaceTempView("sq_customer")
      load(s, dir, "orders").createOrReplaceTempView("sq_orders")
      s.sql(
        """SELECT c_custkey, c_name FROM sq_customer
          |WHERE c_custkey IN (SELECT o_custkey FROM sq_orders WHERE o_totalprice > 300000)
          |ORDER BY c_custkey""".stripMargin)
    },

    Q("q_subquery_scalar",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 2 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |                                 / CAST(count(*) AS DOUBLE) FROM orders)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      load(s, dir, "orders").createOrReplaceTempView("sqs_orders")
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM sqs_orders
          |WHERE o_totalprice > 2 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |                                 / CAST(count(*) AS DOUBLE) FROM sqs_orders)
          |ORDER BY o_orderkey""".stripMargin)
    },

    Q("q_subquery_exists",
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_suppkey = s_suppkey AND l_quantity > 49)
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      load(s, dir, "supplier").createOrReplaceTempView("sqe_supplier")
      load(s, dir, "lineitem").createOrReplaceTempView("sqe_lineitem")
      s.sql(
        """SELECT s_suppkey, s_name FROM sqe_supplier
          |WHERE EXISTS (SELECT 1 FROM sqe_lineitem
          |              WHERE l_suppkey = s_suppkey AND l_quantity > 49)
          |ORDER BY s_suppkey""".stripMargin)
    })
}
