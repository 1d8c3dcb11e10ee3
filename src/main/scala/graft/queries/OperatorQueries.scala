package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin}

/** Custom composed operators (SURVEY.md custom-operator guidance:
  * compose built-ins before reaching for Catalyst nodes). */
object OperatorQueries {

  val all: Seq[Q] = Seq(

    // as-of join: each purchase event picks up the most recent earlier
    // (or simultaneous) error value of the same user. Oracle = DuckDB's
    // native ASOF LEFT JOIN.
    Q("q_asof_join",
      """WITH purchases AS (
        |  SELECT event_id, user_id, epoch_ns(ts) AS t
        |  FROM events WHERE event_type = 'purchase'
        |), signals AS (
        |  SELECT user_id, epoch_ns(ts) AS t, value
        |  FROM events WHERE event_type = 'error'
        |)
        |SELECT p.event_id, p.user_id, s.value AS last_error_value
        |FROM purchases p ASOF LEFT JOIN signals s
        |  ON p.user_id = s.user_id AND p.t >= s.t
        |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      val ev = T.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val signals = ev.where(col("event_type") === "error")
        .select("user_id", "ts", "value")
      AsOfJoin.leftAsOf(purchases, signals,
        keyCols = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        rightVals = Seq("value"))
        .select(col("event_id"), col("user_id"),
          col("value").as("last_error_value"))
        .orderBy("event_id")
    },

    // range (interval) join: purchases pick up the error events of the
    // same user within ±6h. A raw |Δt| <= tol predicate plans as a
    // nested-loop join; RangeJoin.bandJoin bins time into tol-wide
    // buckets so it runs as an equi-join on (user, bin) — linear, one
    // shuffle. ts is raw epoch-ns on both sides (events fixture is
    // TIMESTAMP(NANOS); oracle uses epoch_ns).
    Q("q_range_join",
      s"""WITH purchases AS (
         |  SELECT event_id, user_id, epoch_ns(ts) AS t
         |  FROM events WHERE event_type = 'purchase'
         |), errors AS (
         |  SELECT user_id, epoch_ns(ts) AS t, value
         |  FROM events WHERE event_type = 'error'
         |)
         |SELECT p.event_id, p.user_id, count(*) AS n_errors,
         |  CAST(sum(CAST(s.value AS DECIMAL(18,6))) AS DOUBLE)
         |    AS sum_error_value
         |FROM purchases p JOIN errors s
         |  ON p.user_id = s.user_id AND abs(p.t - s.t) <= $RangeTolNs
         |GROUP BY p.event_id, p.user_id
         |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      val ev = T.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val errors = ev.where(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("err_ts"), col("value"))
      RangeJoin.bandJoin(purchases, errors,
          keyCols = Seq("user_id"), leftTime = "ts", rightTime = "err_ts",
          tolerance = RangeTolNs)
        .groupBy("event_id", "user_id")
        .agg(count(lit(1)).as("n_errors"),
          T.dsum(col("value"), 6).as("sum_error_value"))
        .orderBy("event_id")
    })

  /** ±6 hours in nanoseconds (events carry epoch-ns timestamps). */
  private final val RangeTolNs = 21600000000000L
}
