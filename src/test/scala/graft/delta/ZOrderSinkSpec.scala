package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.CommitWriter
import graft.queries.T

class ZOrderSinkSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_zs_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  test("OPTIMIZE ZORDER BY clusters values so skipping prunes") {
    val p = tmp("zorder")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    // write scrambled: 4 files each spanning the full o_custkey range
    CommitWriter.createTable(spark,
      orders.repartition(4, col("o_orderkey")), p)
    val before = DeltaTable.forPath(spark, p)
    val pred = Seq(col("o_custkey") <= 50)
    val prunedBefore =
      graft.delta.scan.DeltaScan.prunedFiles(before, pred).count()
    assert(prunedBefore == before.allFiles.count(),
      "scrambled files should all survive pruning")

    // rewrite z-ordered by o_custkey into 4 files
    graft.commands.OptimizeCommand.optimize(spark, p,
      targetFileSize = 16 * 1024, minFiles = 2,
      zorderBy = Seq("o_custkey"))
    val after = DeltaTable.forPath(spark, p)
    assert(after.read.count() == orders.count())
    val total = after.allFiles.count()
    val prunedAfter =
      graft.delta.scan.DeltaScan.prunedFiles(after, pred).count()
    assert(prunedAfter < total,
      s"z-ordered files should prune: $prunedAfter of $total kept")
    // and the filtered result is still exact
    assert(after.readWhere(pred: _*).count() ==
      orders.filter(pred.head).count())
  }

  test("ZORDER BY a string column clusters by order-preserving prefix") {
    val p = tmp("zstr")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    CommitWriter.createTable(spark,
      orders.repartition(4, col("o_orderkey")), p)
    graft.commands.OptimizeCommand.optimize(spark, p,
      targetFileSize = 16 * 1024, minFiles = 2, zorderBy = Seq("o_orderpriority"))
    val after = DeltaTable.forPath(spark, p)
    assert(after.read.count() == orders.count())
    val prios = orders.select("o_orderpriority").distinct()
      .orderBy("o_orderpriority").collect().map(_.getString(0))
    val cut = prios(prios.length / 4) // low boundary value
    val pred = Seq(col("o_orderpriority") <= cut)
    val total = after.allFiles.count()
    val pruned = graft.delta.scan.DeltaScan.prunedFiles(after, pred).count()
    assert(total > 1 && pruned < total,
      s"string z-order should prune: $pruned of $total kept")
    assert(after.readWhere(pred: _*).count() ==
      orders.filter(pred.head).count())
  }

  test("ZORDER BY on a partitioned table keeps partitions + prunes") {
    val p = tmp("zpart")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    CommitWriter.createTable(spark, orders, p,
      partitionColumns = Seq("o_orderstatus"))
    CommitWriter.append(spark, orders, p)
    graft.commands.OptimizeCommand.optimize(spark, p,
      targetFileSize = 16 * 1024, minFiles = 2, zorderBy = Seq("o_custkey"))
    val after = DeltaTable.forPath(spark, p)
    assert(after.read.count() == orders.count() * 2)
    // partition pruning still exact
    val pPred = Seq(col("o_orderstatus") === "F")
    assert(after.readWhere(pPred: _*).count() ==
      orders.filter(pPred.head).count() * 2)
    // z-clustering prunes within the scan on the z column
    val zPred = Seq(col("o_custkey") <= 50)
    val total = after.allFiles.count()
    val pruned = graft.delta.scan.DeltaScan.prunedFiles(after, zPred).count()
    assert(pruned < total,
      s"partitioned z-order should prune: $pruned of $total kept")
    assert(after.readWhere(zPred: _*).count() ==
      orders.filter(zPred.head).count() * 2)
  }

  test("OPTIMIZE ZORDER BY through SQL grammar") {
    val p = tmp("zsql")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    CommitWriter.createTable(spark, orders.repartition(3), p)
    val out = graft.GraftSession(spark)
      .sql(s"OPTIMIZE '$p' ZORDER BY (o_custkey, o_totalprice)")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("files_removed").toInt == 3)
    assert(DeltaTable.forPath(spark, p).read.count() == orders.count())
  }

  test("streaming sink: exactly-once appends via txn") {
    val p = tmp("sink")
    val ckpt = Files.createTempDirectory("graft_sink_ckpt").toString
    val events = graft.streaming.EventsStream.readEvents(spark, sf)
      .select("event_id", "user_id", "value")
    // create the table with the stream's schema (empty)
    CommitWriter.createTable(spark,
      T.events(spark, sf).select("event_id", "user_id", "value").limit(0), p)
    val q = graft.streaming.DeltaSink.writeStream(events, p,
      appId = "sink-test", checkpointDir = ckpt)
    q.awaitTermination(60000)
    val n = T.events(spark, sf).count()
    assert(DeltaTable.forPath(spark, p).read.count() == n)
    // replaying batch 0 manually is a no-op (txn recorded)
    val replay = CommitWriter.appendIfAbsent(spark,
      T.events(spark, sf).select("event_id", "user_id", "value"), p,
      appId = "sink-test", txnVersion = 0L)
    assert(replay.isEmpty)
    assert(DeltaTable.forPath(spark, p).read.count() == n)
  }

  test("streaming sink mergeSchema: restarted stream evolves the table") {
    val p = tmp("sink_ms")
    val ckpt = Files.createTempDirectory("graft_sinkms_ckpt").toString
    // sink table born with two columns
    CommitWriter.createTable(spark,
      T.events(spark, sf).select("event_id", "user_id").limit(0), p)
    // the producer restarted with an extra column; without the opt-in
    // the write gate stops the stream
    val wider = graft.streaming.EventsStream.readEvents(spark, sf)
      .select("event_id", "user_id", "value")
    val qFail = graft.streaming.DeltaSink.writeStream(wider, p,
      appId = "sink-ms", checkpointDir = ckpt + "_fail")
    val failed = intercept[Exception] { qFail.awaitTermination(60000) }
    assert(Iterator.iterate(failed: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("mergeSchema"))))
    // with it: schema evolves in the same commit as the first batch
    val q = graft.streaming.DeltaSink.writeStream(wider, p,
      appId = "sink-ms", checkpointDir = ckpt, mergeSchema = true)
    q.awaitTermination(60000)
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.schema.fieldNames.toSeq ==
      Seq("event_id", "user_id", "value"))
    assert(snap.read.count() == T.events(spark, sf).count())
    assert(snap.read.where(org.apache.spark.sql.functions.col("value")
      .isNotNull).count() > 0)
  }
}
