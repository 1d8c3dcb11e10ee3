package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row (by a
  * time column) with the same key and right.time <= left.time.
  *
  * Spark has no ASOF JOIN operator; a naive range join explodes into an
  * O(n·m) BroadcastNestedLoopJoin. This is the scalable composition:
  * tag + union both sides, one window pass ordered by (time, side) with
  * `last(..., ignoreNulls)` carrying the right side forward, then keep
  * the left rows. One shuffle on the key, linear work, and ties at
  * equal timestamps resolve right-before-left (the >= contract DuckDB's
  * native ASOF JOIN uses, which is the oracle for it).
  */
object AsOfJoin {

  /** @param left       rows to enrich
    * @param right      rows providing the as-of value
    * @param keyCols    equi-join key column names (present on both sides)
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param rightVals  value columns of `right` to carry (prefixed as-is)
    */
  def leftAsOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag + align: side 0 = right (sorts first on time ties), side 1 = left
    val rightTagged = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        rightVals.map(c => col(c).as(s"__r_$c")) ++
        leftCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftTagged = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"__r_$c")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightTagged.unionByName(leftTagged)
      .select(
        (keyCols ++ leftCols.filterNot(keyCols.contains))
          .map(col) ++ Seq(col("__t"), col("__side")) ++
          rightVals.map(c =>
            last(col(s"__r_$c"), ignoreNulls = true).over(w).as(c)): _*)

    carried.where(col("__side") === 1).drop("__t", "__side")
  }

  /** Predicate-style entry: plain composition for ad-hoc use. */
  def apply(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightVal: String): DataFrame =
    leftAsOf(left, right, Seq(key), leftTime, rightTime, Seq(rightVal))
}
