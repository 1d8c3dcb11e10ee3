package graft.delta

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.{Clustering, CommitWriter, LogSegment}

/** Clustered tables (the `clustering` writer feature — liquid
  * clustering's protocol surface): clustering columns recorded in the
  * `delta.clustering` domain at CREATE, honored by a bare OPTIMIZE,
  * surviving checkpoints, and invisible to readers. */
class ClusteringSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_cl_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")

  test("CREATE with clusterBy declares the feature and the domain") {
    val p = tmp("create")
    orders.limit(100).write.format("graftdelta")
      .option("clusterBy", "o_custkey").save(p)
    val snap = DeltaTable.forPath(spark, p)
    val wf = snap.protocol.writerFeatures.getOrElse(Nil)
    assert(wf.contains("clustering") && wf.contains("domainMetadata"))
    // writer-only: readers need no new capability
    assert(snap.protocol.readerFeatures.forall(
      !_.contains("clustering")))
    assert(Clustering.columnsOf(spark, snap.segment) == Seq("o_custkey"))
    assert(snap.read.count() == 100)
  }

  test("bare OPTIMIZE re-clusters by the recorded columns") {
    val p = tmp("opt")
    // scrambled: every file spans the full o_custkey range
    CommitWriter.createTable(spark,
      orders.repartition(4, col("o_orderkey")), p,
      clusterBy = Seq("o_custkey"))
    val before = DeltaTable.forPath(spark, p)
    val pred = Seq(col("o_custkey") <= 50)
    assert(graft.delta.scan.DeltaScan.prunedFiles(before, pred).count() ==
      before.allFiles.count(), "scrambled files should all survive pruning")

    // no ZORDER BY argument: the table's own clustering drives the job
    graft.commands.OptimizeCommand.optimize(spark, p,
      targetFileSize = 16 * 1024, minFiles = 2)
    val after = DeltaTable.forPath(spark, p)
    assert(after.read.count() == orders.count())
    val total = after.allFiles.count()
    val pruned = graft.delta.scan.DeltaScan.prunedFiles(after, pred).count()
    assert(pruned < total,
      s"clustered rewrite should prune: $pruned of $total kept")
    assert(after.readWhere(pred: _*).count() ==
      orders.filter(pred.head).count())

    // an explicit ZORDER BY now conflicts with the table policy
    val err = intercept[IllegalArgumentException] {
      graft.commands.OptimizeCommand.optimize(spark, p,
        zorderBy = Seq("o_totalprice"))
    }
    assert(err.getMessage.contains("clustered"))
  }

  test("clustering survives a checkpoint and stays advisory for DML") {
    val p = tmp("cp")
    CommitWriter.createTable(spark, orders.limit(200), p,
      clusterBy = Seq("o_custkey", "o_orderdate"))
    CommitWriter.append(spark, orders.limit(50), p)
    CommitWriter.checkpoint(spark, p)
    // domain must replay from the checkpoint alone
    val fs = LogSegment.fs(spark, new Path(p))
    (0L to 1L).foreach(i => fs.delete(
      new Path(new Path(p, "_delta_log"), f"$i%020d.json"), false))
    val snap = DeltaTable.forPath(spark, p)
    assert(Clustering.columnsOf(spark, snap.segment) ==
      Seq("o_custkey", "o_orderdate"))
    // appends to a clustered table need no clustering work (advisory)
    CommitWriter.append(spark, orders.limit(10), p)
    assert(DeltaTable.forPath(spark, p).read.count() == 260)
  }

  test("ALTER TABLE CLUSTER BY sets, changes, and drops the policy") {
    val p = tmp("alter")
    CommitWriter.createTable(spark, orders.limit(100), p)
    val g = new graft.GraftSession(spark)
    // a plain table becomes clustered mid-life, metadata-only; the
    // recorded name is CANONICALIZED to the schema's case so the
    // case-sensitive OPTIMIZE lookups always resolve
    g.sql(s"ALTER TABLE '$p' CLUSTER BY (O_CUSTKEY)")
    val snap1 = DeltaTable.forPath(spark, p)
    assert(snap1.protocol.writerFeatures.getOrElse(Nil)
      .contains("clustering"))
    assert(Clustering.columnsOf(spark, snap1.segment) == Seq("o_custkey"))
    // re-cluster by a different key: latest domain wins
    g.sql(s"ALTER TABLE '$p' CLUSTER BY (o_totalprice, o_orderdate)")
    assert(Clustering.columnsOf(spark,
      DeltaTable.forPath(spark, p).segment) ==
      Seq("o_totalprice", "o_orderdate"))
    // NONE drops the policy; OPTIMIZE goes back to plain compaction
    g.sql(s"ALTER TABLE '$p' CLUSTER BY NONE")
    assert(Clustering.columnsOf(spark,
      DeltaTable.forPath(spark, p).segment).isEmpty)
    intercept[IllegalArgumentException] {
      g.sql(s"ALTER TABLE '$p' CLUSTER BY NONE")
    }
    intercept[Exception] {
      g.sql(s"ALTER TABLE '$p' CLUSTER BY (no_such_col)")
    }
    // malformed: missing comma is a parse error, not two columns
    val eComma = intercept[Exception] {
      g.sql(s"ALTER TABLE '$p' CLUSTER BY (o_custkey o_orderdate)")
    }
    assert(eComma.getMessage.contains("CLUSTER BY"))
    // duplicates (incl. case-insensitive) are rejected
    val eDup = intercept[IllegalArgumentException] {
      g.sql(s"ALTER TABLE '$p' CLUSTER BY (o_custkey, O_CUSTKEY)")
    }
    assert(eDup.getMessage.contains("twice"))
    // a trailing comma is malformed too
    intercept[Exception] {
      g.sql(s"ALTER TABLE '$p' CLUSTER BY (o_custkey,)")
    }
  }

  test("clusterBy validation: partitioning, width, unknown columns") {
    val p = tmp("val")
    intercept[IllegalArgumentException] {
      CommitWriter.createTable(spark, orders.limit(10), p,
        partitionColumns = Seq("o_orderstatus"),
        clusterBy = Seq("o_custkey"))
    }
    intercept[IllegalArgumentException] {
      CommitWriter.createTable(spark, orders.limit(10), p,
        clusterBy = Seq("a", "b", "c", "d", "e"))
    }
    val err = intercept[IllegalArgumentException] {
      CommitWriter.createTable(spark, orders.limit(10), p,
        clusterBy = Seq("nope"))
    }
    assert(err.getMessage.contains("nope"))
  }
}
