package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One declared query: Spark implementation + optional DuckDB oracle SQL.
  *
  * Determinism contract (driver hash-compares Spark parquet output vs the
  * DuckDB oracle result):
  *  - aggregate arithmetic over doubles goes through DECIMAL casts so the
  *    result is independent of Spark's partial/final aggregation order;
  *  - every query is totally ordered (unique tie-break keys) with NULLS
  *    LAST spelled out on both sides;
  *  - column names are aliased identically on both sides.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}

/** Table loading helpers shared by all query groups. */
object T {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; read `ts` as raw nanosecond longs instead (oracle side uses
    * DuckDB epoch_ns(ts)). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
  }

  /** Exact decimal view of a double column (for order-independent sums). */
  def dec(c: Column, scale: Int): Column = c.cast(DecimalType(18, scale))

  /** sum(decimal) rendered as DOUBLE — deterministic across engines. */
  def dsum(c: Column, scale: Int): Column =
    sum(dec(c, scale)).cast(DoubleType)

  /** Deterministic average: exact decimal sum divided by count, in
    * doubles (one IEEE division — identical on both engines). */
  def davg(c: Column, scale: Int): Column =
    sum(dec(c, scale)).cast(DoubleType) / count(c).cast(DoubleType)
}
