package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.GraftSession
import graft.delta.log.CommitWriter

/** Randomized (fixed-seed) equivalence properties for the maintenance
  * surface, over table histories the hand-written specs don't
  * enumerate: interleaved appends / deletes / optimizes / checkpoints.
  *
  *  - VACUUM LITE candidates must equal FULL candidates on a
  *    debris-free table at RETAIN 0 (both modes see exactly the
  *    removed-and-not-re-added files; LITE from tombstones, FULL from
  *    listing + live anti-join), and stay a SUBSET once untracked
  *    debris exists (LITE never sees it by design).
  *  - RESTORE to a random historical version must reproduce exactly
  *    the rows a time-travel read of that version serves.
  */
class MaintenancePropertySpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_mprop_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_totalprice")

  /** Build a random history; returns the table path. */
  private def randomHistory(rnd: scala.util.Random, name: String,
      steps: Int): String = {
    val p = tmp(name)
    CommitWriter.createTable(spark,
      orders.where(col("o_orderkey") % 7 === 0).repartition(2), p,
      configuration = Map("delta.checkpointInterval" -> "1000"))
    for (i <- 1 to steps) rnd.nextInt(4) match {
      case 0 =>
        CommitWriter.append(spark,
          orders.where(col("o_orderkey") % 7 === (i % 7).toLong)
            .repartition(1 + rnd.nextInt(2)), p)
      case 1 =>
        graft.commands.DmlCommands.delete(spark, p,
          col("o_custkey") % 11 === rnd.nextInt(11).toLong)
      case 2 =>
        graft.commands.OptimizeCommand.optimize(spark, p)
      case 3 =>
        CommitWriter.checkpoint(spark, p)
    }
    p
  }

  test("VACUUM LITE == FULL on debris-free randomized histories") {
    val rnd = new scala.util.Random(4711)
    val g = GraftSession(spark)
    for (trial <- 1 to 3) {
      val p = randomHistory(rnd, s"lite_eq_$trial", 6)
      def cands(mode: String): Set[String] =
        g.sql(s"VACUUM '$p' $mode RETAIN 0 HOURS DRY RUN")
          .select("path").collect().map(_.getString(0)).toSet
      val (lite, full) = (cands("LITE"), cands("FULL"))
      assert(lite == full,
        s"trial $trial: LITE ${lite.size} vs FULL ${full.size}; " +
          s"only-lite=${(lite -- full).take(3)} only-full=${(full -- lite).take(3)}")
      // drop debris: FULL widens, LITE must not follow
      val debris = new java.io.File(p, s"debris_$trial.bin")
      java.nio.file.Files.write(debris.toPath, Array[Byte](1))
      debris.setLastModified(System.currentTimeMillis() - 3600_000L)
      assert(cands("LITE") == lite, "LITE saw untracked debris")
      assert(cands("FULL") == full + s"file:${debris.getAbsolutePath}")
    }
  }

  test("RESTORE reproduces the exact time-travel content (randomized)") {
    val rnd = new scala.util.Random(2718)
    for (trial <- 1 to 3) {
      val p = randomHistory(rnd, s"restore_eq_$trial", 5)
      val tip = DeltaTable.forPath(spark, p).version
      val target = rnd.nextInt(tip.toInt).toLong
      val want = DeltaTable.forPath(spark, p, Some(target)).read
        .orderBy("o_orderkey").collect().toSeq
      GraftSession(spark).sql(s"RESTORE '$p' TO VERSION AS OF $target")
      val got = DeltaTable.forPath(spark, p).read
        .orderBy("o_orderkey").collect().toSeq
      assert(got == want, s"trial $trial: restore to v$target of $tip " +
        s"rows ${got.length} vs ${want.length}")
      // and the restore is itself time-travelable: the pre-restore tip
      // still reads as it did
      val tipRows = DeltaTable.forPath(spark, p, Some(tip)).read.count()
      assert(DeltaTable.forPath(spark, p).version == tip + 1)
      assert(tipRows >= 0)
    }
  }
}
