package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.commands.ReplaceWhereCommand.replaceWhere
import graft.delta.log.CommitWriter

class ReplaceWhereSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_rw_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val orders = spark.read
    .parquet(s"$sf/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_totalprice")

  /** commit JSON lines of version v */
  private def commitLines(p: String, v: Long): Seq[String] = {
    val f = new java.io.File(p, f"_delta_log/$v%020d.json")
    scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq
  }

  test("partition predicate replaces whole partitions in one commit, " +
    "metadata-only remove set") {
    val p = tmp("part")
    val base = orders.withColumn("bucket",
      (col("o_orderkey") % 4).cast("int"))
    CommitWriter.createTable(spark, base, p,
      partitionColumns = Seq("bucket"))
    val v0 = DeltaTable.forPath(spark, p).version

    val fresh = orders.limit(10)
      .withColumn("o_totalprice", lit(1.5))
      .withColumn("bucket", lit(1).cast("int"))
    val m = replaceWhere(spark, fresh, p, col("bucket") === 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("operation") == "REPLACE WHERE")

    val snap = DeltaTable.forPath(spark, p)
    // exactly ONE commit landed
    assert(snap.version == v0 + 1)
    // every removed file belonged to bucket=1 (metadata qualification)
    val lines = commitLines(p, v0 + 1)
    val removed = lines.filter(_.contains("\"remove\""))
    assert(removed.nonEmpty && removed.forall(_.contains("bucket=1")))
    // end state: untouched buckets intact, bucket 1 fully replaced
    assert(snap.read.where(col("bucket") =!= 1).count() ==
      base.where(col("bucket") =!= 1).count())
    val b1 = snap.read.where(col("bucket") === 1)
    assert(b1.count() == 10)
    assert(b1.select("o_totalprice").distinct().head.getDouble(0) == 1.5)
  }

  test("incoming row outside the predicate aborts before any commit") {
    val p = tmp("guard")
    val base = orders.withColumn("bucket",
      (col("o_orderkey") % 4).cast("int"))
    CommitWriter.createTable(spark, base, p,
      partitionColumns = Seq("bucket"))
    val v0 = DeltaTable.forPath(spark, p).version
    val rogue = orders.limit(5).withColumn("bucket", lit(2).cast("int"))
    val e = intercept[Exception] {
      replaceWhere(spark, rogue, p, col("bucket") === 1)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("does not satisfy")))
    assert(DeltaTable.forPath(spark, p).version == v0)
  }

  test("data-column predicate rewrites only matching files, keeps " +
    "survivors (copy-on-write)") {
    val p = tmp("cow")
    val n = orders.count()
    val keys = orders.select("o_orderkey").orderBy("o_orderkey")
      .collect().map(_.getLong(0))
    val mid = keys((n / 2).toInt - 1)
    // two files split at the median key
    CommitWriter.createTable(spark,
      orders.filter(col("o_orderkey") <= mid).repartition(1), p)
    CommitWriter.append(spark,
      orders.filter(col("o_orderkey") > mid).repartition(1), p)

    // replace the 5 lowest keys: only the low file is touched
    val cut = keys(4)
    val fresh = orders.filter(col("o_orderkey") <= cut)
      .withColumn("o_totalprice", lit(0.25))
    val m = replaceWhere(spark, fresh, p, col("o_orderkey") <= cut)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("files_removed").toInt == 1)

    val after = DeltaTable.forPath(spark, p).read
    assert(after.count() == n)
    assert(after.where(col("o_orderkey") <= cut)
      .select("o_totalprice").distinct().head.getDouble(0) == 0.25)
    // survivors of the rewritten file are intact
    val expect = orders.filter(col("o_orderkey") > cut)
      .agg(sum("o_totalprice")).head.getDouble(0)
    val got = after.where(col("o_orderkey") > cut)
      .agg(sum("o_totalprice")).head.getDouble(0)
    assert(math.abs(expect - got) < 1e-6)
  }

  test("data-column predicate on a column-mapped DV-less table rewrites " +
    "via physical names") {
    val p = tmp("mapped_cow")
    CommitWriter.createTableMapped(spark, orders.repartition(1), p)
    val cut = 100L
    val fresh = orders.filter(col("o_orderkey") <= cut)
      .withColumn("o_totalprice", lit(3.5))
    val m = replaceWhere(spark, fresh, p, col("o_orderkey") <= cut)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("operation") == "REPLACE WHERE")
    assert(m("files_removed").toInt == 1) // the single base file rewrote

    val snap = DeltaTable.forPath(spark, p)
    val after = snap.read
    assert(after.count() == orders.count())
    assert(after.where(col("o_orderkey") <= cut)
      .select("o_totalprice").distinct().head.getDouble(0) == 3.5)
    // survivors intact (values preserved through the physical rename)
    val expect = orders.filter(col("o_orderkey") > cut)
      .agg(sum("o_totalprice")).head.getDouble(0)
    val got = after.where(col("o_orderkey") > cut)
      .agg(sum("o_totalprice")).head.getDouble(0)
    assert(math.abs(expect - got) < 1e-6)
    // the rewritten parquet carries PHYSICAL col-N names, never logical
    val live = snap.allFiles.select("path").collect().map(_.getString(0))
    live.foreach { rel =>
      val cols = spark.read.parquet(s"$p/$rel").columns.toSet
      assert(cols == Set("col-1", "col-2", "col-3"),
        s"$rel has columns $cols")
    }
  }

  test("deletion-vector table masks matched rows instead of rewriting") {
    val p = tmp("dv")
    CommitWriter.createTable(spark, orders.repartition(1), p,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    val cut = 100L
    val fresh = orders.filter(col("o_orderkey") <= cut)
      .withColumn("o_totalprice", lit(9.75))
    replaceWhere(spark, fresh, p, col("o_orderkey") <= cut)

    val snap = DeltaTable.forPath(spark, p)
    // original file survives under a DV mask (no rewrite)
    val files = snap.allFiles.select("path", "deletionVector").collect()
    assert(files.exists(r => r.getAs[Any]("deletionVector") != null))
    val after = snap.read
    assert(after.where(col("o_orderkey") <= cut)
      .select("o_totalprice").distinct().head.getDouble(0) == 9.75)
    assert(after.count() == orders.count())
  }

  test("CDF table records authoritative delete + insert change rows") {
    val p = tmp("cdf")
    val base = orders.withColumn("bucket",
      (col("o_orderkey") % 2).cast("int"))
    CommitWriter.createTable(spark, base, p,
      partitionColumns = Seq("bucket"),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val fresh = orders.limit(3)
      .withColumn("o_totalprice", lit(7.0))
      .withColumn("bucket", lit(0).cast("int"))
    replaceWhere(spark, fresh, p, col("bucket") === 0)
    val v = DeltaTable.forPath(spark, p).version

    val feed = spark.read.format("graftdelta")
      .option("path", p)
      .option("startingVersion", v.toString)
      .option("readChangeFeed", "true")
      .load()
    val byType = feed.groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("delete") == base.where(col("bucket") === 0).count())
    assert(byType("insert") == 3)
  }

  test("empty match appends the new slice without removing anything") {
    val p = tmp("empty")
    val base = orders.withColumn("bucket",
      (col("o_orderkey") % 4).cast("int"))
    CommitWriter.createTable(spark, base, p,
      partitionColumns = Seq("bucket"))
    val fresh = orders.limit(4).withColumn("bucket", lit(7).cast("int"))
    val m = replaceWhere(spark, fresh, p, col("bucket") === 7)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("files_removed").toInt == 0)
    val after = DeltaTable.forPath(spark, p).read
    assert(after.count() == base.count() + 4)
  }
}
