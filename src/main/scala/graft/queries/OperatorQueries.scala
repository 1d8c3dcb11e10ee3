package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

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
    })
}
