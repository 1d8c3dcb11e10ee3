package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Banded range join: pair left and right rows sharing an equi-key whose
  * numeric "time" values lie within `tolerance` of each other.
  *
  * Spark plans a raw `|lt - rt| <= tol` predicate as a
  * BroadcastNestedLoopJoin (or a cartesian shuffle join) — O(n·m) row
  * comparisons per key, a scale-killer the moment keys are hot. The
  * scalable composition bins time into `tolerance`-wide buckets: two
  * values within `tol` always land in the same or adjacent bins, so
  * replicating ONE side into its bin and both neighbors turns the range
  * predicate into a plain equi-join on (key, bin) followed by the exact
  * band filter. Cost is 3×|right| replicated rows + true pairs — linear,
  * shuffled once on (key, bin), AQE-skew-splittable like any equi-join.
  *
  * Each qualifying (l, r) pair emerges exactly once (the left row's bin
  * is a single value and the right row hits each bin at most once), so
  * no dedup pass is needed.
  */
object RangeJoin {

  /** @param left      probe side (kept 1×)
    * @param right     build side (replicated ×3 into adjacent bins)
    * @param keyCols   equi-join key column names (present on both sides)
    * @param leftTime  numeric (long-castable) column on `left`
    * @param rightTime numeric column on `right`
    * @param tolerance max |leftTime - rightTime| for a pair to qualify
    */
  def bandJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, tolerance: Long): DataFrame = {
    require(tolerance > 0, "tolerance must be positive")
    // the output is left.* ++ right's non-key columns; a shared non-key
    // name (including the time columns) would yield duplicate output
    // columns and ambiguous by-name selection downstream — fail fast
    // with the fix instead
    val clash = right.columns.filterNot(keyCols.contains)
      .filter(left.columns.contains)
    require(clash.isEmpty,
      s"bandJoin sides share non-key column(s) ${clash.mkString(", ")}; " +
        "rename or prefix them on one side before joining")
    // floor division in pure LONG arithmetic: Spark's `/` promotes to
    // double, whose 53-bit mantissa cannot represent epoch-ns longs
    // exactly — a near-boundary timestamp could round into a bin 2 away
    // from its true one and the ±1 replication would silently drop a
    // qualifying pair. Subtracting pmod first makes the dividend an
    // exact multiple of tolerance, so truncating DIV equals floor for
    // negatives too.
    def floorBin(c: Column): Column = {
      val x = c.cast(LongType)
      // decimal division of the exact multiple: double `/` would round
      // (2^53 < epoch-ns), and decimal division of a NON-multiple would
      // half-up-round at result scale — the pmod subtraction removes
      // the fraction so the quotient is exactly integral
      ((x - pmod(x, lit(tolerance)))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)) /
        lit(tolerance)).cast(LongType)
    }
    // explicit plan aliases: both sides often derive from the SAME scan
    // (self-range-joins), where dataset-handle column refs are ambiguous
    val l = left.withColumn("__bin", floorBin(col(leftTime))).alias("__rjl")
    val r = right
      .withColumn("__rbin", floorBin(col(rightTime)))
      .withColumn("__bin",
        explode(sequence(col("__rbin") - 1, col("__rbin") + 1)))
      .drop("__rbin")
      .alias("__rjr")
    val cond: Column = (keyCols.map(k =>
      col(s"__rjl.$k") === col(s"__rjr.$k")) :+
      (col("__rjl.__bin") === col("__rjr.__bin")) :+
      (abs(col(s"__rjl.$leftTime").cast(LongType) -
        col(s"__rjr.$rightTime").cast(LongType)) <= tolerance))
      .reduce(_ && _)
    val rightOnly = right.columns.filterNot(keyCols.contains).toSeq
    l.join(r, cond)
      .select(col("__rjl.*") +: rightOnly.map(c => col(s"__rjr.$c")): _*)
      .drop("__bin")
  }
}
