package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DistributedNtile

/** DistributedNtile must be bit-identical to Spark's own
  * `ntile(k) OVER (ORDER BY key, tie)` — including the remainder
  * semantics (first n % k buckets take the extra row) and heavy ties —
  * while planning no single-partition global window. */
class NtileSpec extends AnyFunSuite {
  import TestSpark._

  private def check(n: Int, buckets: Int, keyOf: Int => Int): Unit = {
    import spark.implicits._
    val df = (0 until n).map(i => (keyOf(i), i.toLong)).toDF("key", "tie")
    val expected = df.withColumn("bin",
        ntile(buckets).over(Window.orderBy(col("key"), col("tie"))))
      .select("tie", "bin").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = DistributedNtile(df, buckets, "key", "tie", "bin")
      .select("tie", "bin").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected, s"n=$n buckets=$buckets")
  }

  test("matches window ntile across sizes, buckets, and tie shapes") {
    val rnd = new scala.util.Random(42)
    // even split, remainder split, n < buckets, all-ties, random keys
    check(100, 10, _ % 7)
    check(103, 10, _ % 7)
    check(3, 10, _ % 2)
    check(50, 4, _ => 1)
    check(997, 13, _ => rnd.nextInt(19))
    check(64, 64, i => i / 2)
  }

  test("empty input yields null bins; invalid bucket count refuses") {
    import spark.implicits._
    val empty = Seq.empty[(Int, Long)].toDF("key", "tie")
    assert(DistributedNtile(empty, 5, "key", "tie", "bin").count() == 0)
    intercept[IllegalArgumentException] {
      DistributedNtile(empty, 0, "key", "tie", "bin")
    }
  }

  test("a high-cardinality (continuous) key refuses fast") {
    import spark.implicits._
    // 1000 distinct keys against a cap of 100: the operator must refuse
    // with pre-binning guidance, not collect an unbounded histogram
    val df = (0 until 1000).map(i => (i, i.toLong)).toDF("key", "tie")
    val e = intercept[IllegalArgumentException] {
      DistributedNtile(df, 10, "key", "tie", "bin", maxKeys = 100)
    }
    assert(e.getMessage.contains("Pre-bin"))
    // at-the-cap cardinality still works
    assert(DistributedNtile(df, 10, "key", "tie", "bin", maxKeys = 1000)
      .count() == 1000)
  }

  test("the plan contains no single-partition global-order window") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i % 5, i.toLong)).toDF("key", "tie")
    val plan = DistributedNtile(df, 10, "key", "tie", "bin")
      .queryExecution.executedPlan.toString
    // every Window in the plan must be partitioned (partitionBy key);
    // Spark renders an unpartitioned window's spec with an empty
    // partition list: "windowspecdefinition(tie#..., ..." — assert the
    // window carries our partition expression instead
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition"))
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.contains("windowspecdefinition(key#"),
      s"unpartitioned (driver-funnel) window in plan: $w"))
  }
}
