package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.commands.MergeCommand
import graft.delta.log.CommitWriter

class MergeSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_merge_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")

  test("upsert updates matched rows, inserts new, rewrites only affected files") {
    val p = tmp("upsert")
    // 4 files split by orderkey quarters
    val n = orders.count()
    val keys = orders.select("o_orderkey").orderBy("o_orderkey")
      .collect().map(_.getLong(0))
    val q2 = keys((n / 2).toInt - 1)
    CommitWriter.createTable(spark,
      orders.filter(col("o_orderkey") <= q2).repartition(1), p)
    CommitWriter.append(spark,
      orders.filter(col("o_orderkey") > q2).repartition(1), p)

    // source: update 5 low keys (price +1), insert 3 brand-new keys
    val updates = orders.filter(col("o_orderkey") <= keys(4))
      .withColumn("o_totalprice", col("o_totalprice") + 1)
    val inserts = orders.limit(3)
      .withColumn("o_orderkey", col("o_orderkey") + 1000000)
    val source = updates.unionByName(inserts)

    val metrics = MergeCommand.upsert(spark, p, source, Seq("o_orderkey"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // only the low-keys file contains matches
    assert(metrics("files_rewritten").toInt == 1)

    val after = DeltaTable.forPath(spark, p)
    assert(after.read.count() == n + 3)
    // updated rows carry the new price
    val updated = after.read.where(col("o_orderkey") <= keys(4))
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey").collect()
    val expected = updates.select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey").collect()
    assert(updated.toSeq == expected.toSeq)
    // untouched rows identical; inserts present
    assert(after.read.where(col("o_orderkey") >= 1000000).count() == 3)
    // pre-merge version still reads
    assert(DeltaTable.forPath(spark, p, Some(1)).read.count() == n)
  }

  test("upsert with no matches only inserts (no files rewritten)") {
    val p = tmp("insert_only")
    CommitWriter.createTable(spark, orders.limit(100), p)
    val inserts = orders.limit(2)
      .withColumn("o_orderkey", col("o_orderkey") + 5000001)
    val metrics = MergeCommand.upsert(spark, p, inserts, Seq("o_orderkey"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(metrics("files_rewritten").toInt == 0)
    assert(DeltaTable.forPath(spark, p).read.count() == 102)
  }

  test("upsert on a DV table masks matches, rewrites nothing") {
    val p = tmp("dv_upsert")
    val med = orders.stat.approxQuantile("o_orderkey", Array(0.5), 0.0)(0)
    CommitWriter.createTable(spark,
      orders.filter(col("o_orderkey") <= med).repartition(1), p,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    CommitWriter.append(spark,
      orders.filter(col("o_orderkey") > med).repartition(1), p)
    val dataFiles = DeltaTable.forPath(spark, p).allFiles
      .select("path", "modificationTime")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val updates = orders.filter(col("o_orderkey") % 50 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1)
    val inserts = orders.limit(3)
      .withColumn("o_orderkey", col("o_orderkey") + 1000000)
    val metrics = MergeCommand.upsert(spark, p,
      updates.unionByName(inserts), Seq("o_orderkey"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(metrics("files_rewritten") == "0")
    assert(metrics("files_dv_masked").toInt >= 1)

    val after = DeltaTable.forPath(spark, p)
    // original data files intact by identity, matches masked via DV
    val afterData = after.allFiles
      .select("path", "modificationTime").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dataFiles.toSet.subsetOf(afterData.toSet))
    val want = orders
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 50 === 0, col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")))
      .unionByName(inserts)
    assert(after.read.orderBy("o_orderkey", "o_totalprice").collect().toSeq ==
      want.orderBy("o_orderkey", "o_totalprice").collect().toSeq)
  }

  test("duplicate source keys are refused") {
    val p = tmp("dupes")
    CommitWriter.createTable(spark, orders.limit(10), p)
    val dupSource = orders.limit(1).unionByName(orders.limit(1))
    intercept[IllegalArgumentException] {
      MergeCommand.upsert(spark, p, dupSource, Seq("o_orderkey"))
    }
  }

  test("MERGE WHEN MATCHED DELETE removes the key set (CoW)") {
    val p = tmp("mdel")
    CommitWriter.createTable(spark,
      orders.repartition(4, col("o_orderkey")), p)
    val forget = orders.where(col("o_orderkey") % 7 === 0)
      .select("o_orderkey")
    val metrics = MergeCommand.deleteMatched(spark, p, forget,
      Seq("o_orderkey"))
    val out = DeltaTable.forPath(spark, p).read
    assert(out.count() ==
      orders.where(col("o_orderkey") % 7 =!= 0).count())
    assert(out.where(col("o_orderkey") % 7 === 0).count() == 0)
    // only files holding matches were rewritten (here: all 4, keys are
    // spread), and history stays time-travelable
    assert(DeltaTable.forPath(spark, p, Some(0)).read.count() ==
      orders.count())
    val m = metrics.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("files_rewritten").toInt > 0)
    // a second pass with the same keys is a no-op commit
    MergeCommand.deleteMatched(spark, p, forget, Seq("o_orderkey"))
    assert(DeltaTable.forPath(spark, p).read.count() == out.count())
  }

  test("MERGE WHEN MATCHED DELETE on a DV table masks, moves nothing") {
    val p = tmp("mdel_dv")
    CommitWriter.createTable(spark,
      orders.repartition(2, col("o_orderkey")), p,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    val before = DeltaTable.forPath(spark, p).allFiles
      .select("path").collect().map(_.getString(0)).toSet
    val forget = orders.where(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey"))
    val metrics = MergeCommand.deleteMatched(spark, p, forget,
      Seq("o_orderkey"))
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.read.count() ==
      orders.where(col("o_orderkey") % 5 =!= 0).count())
    // merge-on-read: the data files never moved
    assert(snap.allFiles.select("path").collect()
      .map(_.getString(0)).toSet == before)
    val m = metrics.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("files_rewritten") == "0" && m("files_dv_masked").toInt > 0)
  }

  test("sync: unconditional BY SOURCE delete mirrors the source") {
    val p = tmp("sync_full")
    CommitWriter.createTable(spark,
      orders.repartition(4, col("o_orderkey")), p)
    val source = orders.where(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 7)
      .unionByName(orders.limit(3)
        .withColumn("o_orderkey", col("o_orderkey") + 9000000))
    MergeCommand.sync(spark, p, source, Seq("o_orderkey"))
    val after = DeltaTable.forPath(spark, p).read
    // full sync: the table IS the source now
    assert(after.orderBy("o_orderkey", "o_totalprice").collect().toSeq ==
      source.orderBy("o_orderkey", "o_totalprice").collect().toSeq)
    // history stays time-travelable
    assert(DeltaTable.forPath(spark, p, Some(0)).read.count() ==
      orders.count())
  }

  test("sync: conditional BY SOURCE delete keeps non-matching survivors") {
    val p = tmp("sync_cond")
    CommitWriter.createTable(spark,
      orders.repartition(3, col("o_orderkey")), p)
    val source = orders.where(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 7)
    MergeCommand.sync(spark, p, source, Seq("o_orderkey"),
      deleteCondition = Some(col("o_custkey") % 2 === 0))
    val after = DeltaTable.forPath(spark, p).read
    val want = source.unionByName(
      orders.where(col("o_orderkey") % 3 =!= 0 &&
        col("o_custkey") % 2 =!= 0))
    assert(after.orderBy("o_orderkey").collect().toSeq ==
      want.orderBy("o_orderkey").collect().toSeq)
  }

  test("sync on a DV table masks matched+deleted rows, moves nothing") {
    val p = tmp("sync_dv")
    CommitWriter.createTable(spark,
      orders.repartition(2, col("o_orderkey")), p,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    val before = DeltaTable.forPath(spark, p).allFiles
      .select("path").collect().map(_.getString(0)).toSet
    val source = orders.where(col("o_orderkey") % 4 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1)
    val metrics = MergeCommand.sync(spark, p, source, Seq("o_orderkey"),
      deleteCondition = Some(col("o_custkey") % 10 === 0))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(metrics("files_rewritten") == "0")
    assert(metrics("files_dv_masked").toInt > 0)
    val snap = DeltaTable.forPath(spark, p)
    // merge-on-read: the original data files never moved
    assert(before.subsetOf(snap.allFiles.select("path").collect()
      .map(_.getString(0)).toSet))
    val want = source.unionByName(
      orders.where(col("o_orderkey") % 4 =!= 0 &&
        col("o_custkey") % 10 =!= 0))
    assert(snap.read.orderBy("o_orderkey").collect().toSeq ==
      want.orderBy("o_orderkey").collect().toSeq)
  }

  test("sync through SQL emits update/insert/delete CDC labels") {
    val p = tmp("sync_sql")
    CommitWriter.createTable(spark, orders.limit(100), p,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val base = orders.limit(100).localCheckpoint()
    base.where(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 2)
      .unionByName(base.limit(2)
        .withColumn("o_orderkey", col("o_orderkey") + 7000000))
      .createOrReplaceTempView("graft_sync_spec_src")
    new graft.GraftSession(spark).sql(
      s"MERGE INTO '$p' USING graft_sync_spec_src " +
        "ON t.o_orderkey = s.o_orderkey " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT * " +
        // t.-qualified on purpose: the ON clause mandates the t/s
        // aliases, so the delete predicate must resolve them too
        "WHEN NOT MATCHED BY SOURCE AND t.o_custkey % 2 = 0 THEN DELETE")
    val matched = base.where(col("o_orderkey") % 3 === 0).count()
    val deleted = base.where(col("o_orderkey") % 3 =!= 0 &&
      col("o_custkey") % 2 === 0).count()
    val cdc = spark.read.format("graftdelta")
      .option("path", p).option("startingVersion", "1")
      .option("readChangeFeed", "true").load()
    val byType = cdc.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.getOrElse("update_preimage", 0L) == matched)
    assert(byType.getOrElse("update_postimage", 0L) == matched)
    assert(byType.getOrElse("insert", 0L) == 2)
    assert(byType.getOrElse("delete", 0L) == deleted)
    // end state: matched updated, inserts present, even-custkey
    // unmatched rows gone
    val after = DeltaTable.forPath(spark, p).read
    assert(after.count() == matched + 2 +
      base.where(col("o_orderkey") % 3 =!= 0 &&
        col("o_custkey") % 2 =!= 0).count())
  }

  test("BY SOURCE clause without the upsert head is refused") {
    val ex = intercept[Exception] {
      new graft.GraftSession(spark).sql(
        "MERGE INTO '/tmp/x' USING '/tmp/y' ON t.k = s.k " +
          "WHEN MATCHED THEN DELETE " +
          "WHEN NOT MATCHED BY SOURCE THEN DELETE")
    }
    assert(ex.getMessage.contains("supported MERGE shapes"))
  }

  test("MERGE WHEN MATCHED DELETE through SQL, with CDC labels") {
    val p = tmp("mdel_sql")
    CommitWriter.createTable(spark, orders.limit(100), p,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val srcPath = tmp("mdel_src").stripSuffix("/tbl") + "/src_parquet"
    orders.limit(100).where(col("o_orderkey") % 3 === 0)
      .select("o_orderkey")
      .write.mode("overwrite").parquet(srcPath)
    new graft.GraftSession(spark).sql(
      s"MERGE INTO '$p' USING '$srcPath' ON t.o_orderkey = s.o_orderkey " +
        "WHEN MATCHED THEN DELETE")
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.read.where(col("o_orderkey") % 3 === 0).count() == 0)
    // write-time CDC: the commit carries authoritative delete rows
    val cdc = spark.read.format("graftdelta")
      .option("path", p).option("startingVersion", "1")
      .option("readChangeFeed", "true").load()
    assert(cdc.where(col("_change_type") === "delete").count() ==
      orders.limit(100).where(col("o_orderkey") % 3 === 0).count())
    assert(cdc.where(col("_change_type") =!= "delete").count() == 0)
  }
}
