package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.CommitWriter
import graft.operators.HilbertCurve

class HilbertSpec extends AnyFunSuite {
  import TestSpark._

  test("hilbert index is a bijection and consecutive positions are " +
    "ADJACENT cells (the property z-order lacks)") {
    for ((n, bits) <- Seq((2, 5), (3, 3), (4, 2))) {
      val total = 1L << (n * bits)
      var prev: Array[Long] = null
      var d = 0L
      while (d < total) {
        val c = HilbertCurve.coords(d, bits, n)
        assert(c.forall(v => v >= 0 && v < (1L << bits)))
        assert(HilbertCurve.index(c, bits) == d,
          s"n=$n bits=$bits d=$d roundtrip")
        if (prev != null) {
          val l1 = c.zip(prev).map { case (a, b) => math.abs(a - b) }.sum
          assert(l1 == 1, s"n=$n bits=$bits step $d moved L1=$l1")
        }
        prev = c
        d += 1
      }
    }
  }

  test("HilbertIndexExpr matches the driver-side transform through " +
    "codegen and propagates nulls") {
    val df = spark.range(2048).select(
      (col("id") % 32).cast("int").as("a"),
      (col("id") / 32).cast("int").as("b"))
    val got = df.withColumn("h",
      graft.functions.HilbertFunctions.hilbertIndex(5, col("a"), col("b")))
      .collect()
    got.foreach { r =>
      val expect = HilbertCurve.index(
        Array(r.getInt(0).toLong, r.getInt(1).toLong), 5)
      assert(r.getLong(2) == expect)
    }
    val withNull = df.withColumn("a",
      when(col("a") === 3, lit(null)).otherwise(col("a")))
      .withColumn("h",
        graft.functions.HilbertFunctions.hilbertIndex(5, col("a"), col("b")))
    assert(withNull.where(col("h").isNull).count() ==
      df.where(col("a") === 3).count())
  }

  test("clustered OPTIMIZE under graft.clustering.curve=hilbert keeps " +
    "content identical and tiles TIGHTER per-file bounding boxes than " +
    "z-order") {
    val d = Files.createTempDirectory("graft_hilbert").toFile
    d.deleteOnExit()
    // a uniform 256x256 grid in scrambled order — deterministic, and
    // uniform occupancy makes bounding-box area an honest layout metric
    val grid = spark.range(65536).select(
      (col("id") % 256).cast("long").as("a"),
      (col("id") / 256).cast("long").as("b"),
      col("id").as("payload"))
      .orderBy(md5(col("id").cast("string")))

    def boxArea(p: String): Double = {
      val snap = DeltaTable.forPath(spark, p)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      snap.allFiles.select("stats").collect().map { r =>
        val s = mapper.readTree(r.getString(0))
        val w = s.get("maxValues").get("a").asDouble -
          s.get("minValues").get("a").asDouble + 1
        val h = s.get("maxValues").get("b").asDouble -
          s.get("minValues").get("b").asDouble + 1
        w * h
      }.sum
    }

    def cluster(name: String, curve: String): String = {
      val p = new java.io.File(d, name).getAbsolutePath
      CommitWriter.createTable(spark, grid.repartition(4), p,
        configuration = Map(
          graft.commands.OptimizeCommand.ClusteringCurveKey -> curve),
        clusterBy = Seq("a", "b"))
      graft.commands.OptimizeCommand.optimize(spark, p,
        targetFileSize = 64 * 1024)
      p
    }
    val hp = cluster("hil", "hilbert")
    val zp = cluster("zo", "zorder")
    val hsnap = DeltaTable.forPath(spark, hp)
    assert(hsnap.read.agg(sum("payload")).head.getLong(0) ==
      grid.agg(sum("payload")).head.getLong(0))
    assert(hsnap.read.count() == 65536)
    // both layouts produced a real multi-file clustering...
    val nFiles = hsnap.allFiles.count()
    assert(nFiles >= 4, s"expected a multi-file layout, got $nFiles")
    // ...and the skipping engine prunes 2-d ranges on the hilbert one
    assert(hsnap.readWhere(col("a") < 0).count() == 0)
    assert(hsnap.readWhere(col("a") < 16 && col("b") < 16).count() ==
      grid.where(col("a") < 16 && col("b") < 16).count())
    // the continuous curve must cover the space with tighter boxes
    val (ha, za) = (boxArea(hp), boxArea(zp))
    println(f"[hilbert] bbox area: hilbert=$ha%.0f zorder=$za%.0f " +
      f"ratio=${ha / za}%.3f over ${nFiles} files")
    assert(ha < za,
      s"hilbert bbox area $ha should beat z-order $za")
    // a bogus curve name refuses loudly
    val bad = new java.io.File(d, "bad").getAbsolutePath
    CommitWriter.createTable(spark, grid.limit(100).repartition(2), bad,
      configuration = Map(
        graft.commands.OptimizeCommand.ClusteringCurveKey -> "peano"),
      clusterBy = Seq("a", "b"))
    val e = intercept[IllegalArgumentException] {
      graft.commands.OptimizeCommand.optimize(spark, bad)
    }
    assert(e.getMessage.contains("zorder or hilbert"))
  }
}
