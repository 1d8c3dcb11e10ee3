package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.CommitWriter
import graft.delta.scan.{ColumnMapping, DeltaScan}

/** Predicate-translation edge cases for file skipping (the A21-analogue
  * surface: reference engine/expressions/to_delta.rs tests). Each case
  * asserts BOTH pruning (fewer files) and result correctness. */
class SkippingSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")

  /** 4 single-file commits with disjoint o_orderkey quarters. */
  private lazy val table: String = {
    val d = Files.createTempDirectory("graft_skip").toFile
    d.deleteOnExit()
    val p = new java.io.File(d, "tbl").getAbsolutePath
    val n = orders.count()
    val keys = orders.select("o_orderkey").orderBy("o_orderkey")
      .collect().map(_.getLong(0))
    val qs = Seq(keys((n / 4).toInt - 1), keys((n / 2).toInt - 1),
      keys((3 * n / 4).toInt - 1))
    CommitWriter.createTable(spark,
      orders.filter(col("o_orderkey") <= qs(0)).repartition(1), p)
    CommitWriter.append(spark, orders.filter(
      col("o_orderkey") > qs(0) && col("o_orderkey") <= qs(1)).repartition(1), p)
    CommitWriter.append(spark, orders.filter(
      col("o_orderkey") > qs(1) && col("o_orderkey") <= qs(2)).repartition(1), p)
    CommitWriter.append(spark,
      orders.filter(col("o_orderkey") > qs(2)).repartition(1), p)
    p
  }

  private def check(filter: org.apache.spark.sql.Column,
      expectPrune: Boolean = true): Unit = {
    val snap = DeltaTable.forPath(spark, table)
    val total = snap.allFiles.count()
    val kept = DeltaScan.prunedFiles(snap, Seq(filter)).count()
    if (expectPrune) assert(kept < total, s"no pruning for $filter")
    val got = snap.readWhere(filter).count()
    val want = orders.filter(filter).count()
    assert(got == want, s"wrong result for $filter: $got != $want")
  }

  private val lo = 10L // inside first quarter at every sf

  test("equality prunes to one file")(check(col("o_orderkey") === lo))
  test("less-than prunes")(check(col("o_orderkey") < lo))
  test("greater-than prunes")(check(col("o_orderkey") > 14000,
    expectPrune = false)) // prunes only when 14000 is beyond a file's max
  test("literal-on-left flips")(check(lit(lo) >= col("o_orderkey")))
  test("IN prunes")(check(col("o_orderkey").isin(1, 2, 3)))
  test("NOT of range inverts")(check(!(col("o_orderkey") > lo)))
  test("NOT of equality keeps all files")(
    check(col("o_orderkey") =!= lo, expectPrune = false))
  test("AND combines: both sides prune")(
    check(col("o_orderkey") > lo && col("o_orderkey") < lo + 5))
  test("OR widens: union of kept files")(
    check(col("o_orderkey") === lo || col("o_orderkey") === lo + 1))
  test("unknown predicate shapes keep every file")(
    check(col("o_orderkey") % 7 === 3, expectPrune = false))
  test("isNotNull keeps files with values")(
    check(col("o_orderkey").isNotNull, expectPrune = false))
  test("string prefix prunes on min/max")(  // o_orderpriority has narrow
    check(col("o_orderpriority").startsWith("9"), expectPrune = false))

  test("nested column-mapping round trip") {
    val logical = StructType(Seq(
      StructField("id", LongType, nullable = true,
        new MetadataBuilder()
          .putString(ColumnMapping.PhysicalNameKey, "col-a").build()),
      StructField("info", StructType(Seq(
        StructField("status", StringType, nullable = true,
          new MetadataBuilder()
            .putString(ColumnMapping.PhysicalNameKey, "col-c").build()))),
        nullable = true,
        new MetadataBuilder()
          .putString(ColumnMapping.PhysicalNameKey, "col-b").build())))
    val phys = ColumnMapping.toPhysicalSchema(logical, "name")
    assert(phys.fieldNames.toSeq == Seq("col-a", "col-b"))
    assert(phys("col-b").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("col-c"))
    // physical->logical expression rebuilds nested names
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L,
        org.apache.spark.sql.Row("ok"))), phys)
    val out = df.select(
      ColumnMapping.toLogicalColumn(phys("col-a"), logical("id")),
      ColumnMapping.toLogicalColumn(phys("col-b"), logical("info")))
    assert(out.schema.fieldNames.toSeq == Seq("id", "info"))
    assert(out.select(col("info.status")).head().getString(0) == "ok")
  }

  test("unsupported reader protocol is rejected") {
    val d = Files.createTempDirectory("graft_proto").toFile
    d.deleteOnExit()
    val p = new java.io.File(d, "tbl").getAbsolutePath
    val region = spark.read.parquet(s"$sf/region.parquet")
    val adds = CommitWriter.writeFiles(spark, region, p, Seq.empty)
    val meta = graft.delta.log.Actions.Metadata(
      id = "x", name = None, description = None,
      format = graft.delta.log.Actions.Format(),
      schemaString = region.schema.json, partitionColumns = Seq.empty,
      configuration = Map.empty, createdTime = Some(0L))
    CommitWriter.commit(spark, p, 0L,
      Seq(CommitWriter.protocolJson(
        graft.delta.log.Actions.Protocol(99, 99)),
        CommitWriter.metadataJson(meta)) ++ adds.map(CommitWriter.addJson),
      "CREATE")
    intercept[IllegalArgumentException] {
      DeltaTable.forPath(spark, p)
    }
  }

  test("dataSkippingNumIndexedCols caps stats to the first N columns") {
    val d = Files.createTempDirectory("graft_nidx").toFile
    d.deleteOnExit()
    val p = new java.io.File(d, "tbl").getAbsolutePath
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    CommitWriter.createTable(spark,
      orders.repartition(3, col("o_orderkey")), p,
      configuration = Map(
        CommitWriter.DataSkippingNumIndexedColsKey -> "1"))
    val snap = DeltaTable.forPath(spark, p)
    val stats = snap.allFiles.select("stats").collect()
      .map(_.getString(0))
    assert(stats.nonEmpty && stats.forall(_ != null))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    stats.foreach { s =>
      val n = mapper.readTree(s)
      // numRecords always present; min/max only for the first column
      assert(n.get("numRecords").asLong() > 0)
      val mins = n.get("minValues")
      assert(mins.has("o_orderkey") && mins.size() == 1,
        s"expected stats on the first column only: $s")
    }
    // metadata count still answers from the log
    assert(snap.statsRowCount.contains(orders.count()))
    // filters on unindexed columns cannot prune (absent = keep), and
    // results stay exact through the scan
    val pred = Seq(col("o_custkey") <= 50)
    assert(graft.delta.scan.DeltaScan.prunedFiles(snap, pred).count() ==
      snap.allFiles.count())
    assert(snap.readWhere(pred: _*).count() ==
      orders.filter(pred.head).count())
  }

  test("dataSkippingStatsColumns indexes exactly the declared columns, " +
    "overriding the positional cap; bad names refuse at ALTER") {
    val d = Files.createTempDirectory("graft_statscols").toFile
    d.deleteOnExit()
    val p = new java.io.File(d, "tbl").getAbsolutePath
    val df = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    // declared at CREATE: only the LAST schema column is indexed —
    // under the positional rule it would have been all three
    CommitWriter.createTable(spark, df.repartition(1), p,
      configuration = Map(
        CommitWriter.DataSkippingStatsColumnsKey -> "o_totalprice"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def statKeys(path: String): Seq[Set[String]] =
      DeltaTable.forPath(spark, path).allFiles.select("stats").collect()
        .map { r =>
          val n = mapper.readTree(r.getString(0)).get("minValues")
          val it = n.fieldNames()
          val b = Set.newBuilder[String]
          while (it.hasNext) b += it.next()
          b.result()
        }.toSeq
    assert(statKeys(p).forall(_ == Set("o_totalprice")))
    // the skipping engine prunes on the indexed column...
    val snap = DeltaTable.forPath(spark, p)
    assert(snap.readWhere(col("o_totalprice") < -1).count() == 0)
    // ...and KEEPS files for the unindexed one (absent stats = keep)
    assert(snap.readWhere(col("o_orderkey") >= 0).count() == df.count())
    // typos and partition columns refuse at ALTER time, not write time
    val g = graft.GraftSession(spark)
    intercept[IllegalArgumentException] {
      g.sql(s"ALTER TABLE '$p' SET TBLPROPERTIES " +
        s"('${CommitWriter.DataSkippingStatsColumnsKey}' = 'no_such')")
    }
    val pp = new java.io.File(d, "tblp").getAbsolutePath
    CommitWriter.createTable(spark, orders.repartition(1), pp,
      partitionColumns = Seq("o_orderstatus"))
    intercept[IllegalArgumentException] {
      g.sql(s"ALTER TABLE '$pp' SET TBLPROPERTIES " +
        s"('${CommitWriter.DataSkippingStatsColumnsKey}' = 'o_orderstatus')")
    }
    // non-indexable types refuse too (a silently-unindexed declaration
    // is the failure mode this validation exists for)
    val pa = new java.io.File(d, "tbla").getAbsolutePath
    CommitWriter.createTable(spark,
      df.withColumn("vec", array(col("o_orderkey"))).repartition(1), pa)
    val te = intercept[IllegalArgumentException] {
      g.sql(s"ALTER TABLE '$pa' SET TBLPROPERTIES " +
        s"('${CommitWriter.DataSkippingStatsColumnsKey}' = 'vec')")
    }
    assert(te.getMessage.contains("cannot carry"))
    // RENAME/DROP of a declared stats column refuses instead of leaving
    // a dangling name that would silently stop indexing
    val pm = new java.io.File(d, "tblm").getAbsolutePath
    CommitWriter.createTableMapped(spark, df.repartition(1), pm)
    g.sql(s"ALTER TABLE '$pm' SET TBLPROPERTIES " +
      s"('${CommitWriter.DataSkippingStatsColumnsKey}' = 'o_custkey')")
    val re = intercept[IllegalArgumentException] {
      g.sql(s"ALTER TABLE '$pm' RENAME COLUMN o_custkey TO ck")
    }
    assert(re.getMessage.contains(CommitWriter.DataSkippingStatsColumnsKey))
    val de = intercept[IllegalArgumentException] {
      g.sql(s"ALTER TABLE '$pm' DROP COLUMN o_custkey")
    }
    assert(de.getMessage.contains("update that property first"))
    // a valid mid-life ALTER narrows stats for SUBSEQUENT writes
    g.sql(s"ALTER TABLE '$pp' SET TBLPROPERTIES " +
      s"('${CommitWriter.DataSkippingStatsColumnsKey}' = 'o_orderkey')")
    CommitWriter.append(spark, orders.repartition(1), pp)
    val keysAfter = statKeys(pp)
    assert(keysAfter.exists(_ == Set("o_orderkey")),
      s"expected a narrowed-stats add: $keysAfter")
  }

  test("numIndexedCols counts SCHEMA order on mapped tables, even when " +
    "the append frame arrives column-reordered") {
    val d = Files.createTempDirectory("graft_nidx_cm").toFile
    d.deleteOnExit()
    val p = new java.io.File(d, "tbl").getAbsolutePath
    val df = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    CommitWriter.createTableMapped(spark, df.repartition(1), p)
    graft.GraftSession(spark).sql(s"ALTER TABLE '$p' SET TBLPROPERTIES " +
      s"('${CommitWriter.DataSkippingNumIndexedColsKey}' = '1')")
    // frame order REVERSED vs schema order: "first 1 column" must still
    // mean o_orderkey (physical col-1), not the frame's leading column
    CommitWriter.append(spark,
      df.select("o_totalprice", "o_custkey", "o_orderkey").repartition(1), p)
    val snap = DeltaTable.forPath(spark, p)
    val lastAdd = snap.allFiles.orderBy(desc("modificationTime"))
      .select("stats").collect()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val postCap = lastAdd.map(r => mapper.readTree(r.getString(0)))
      .filter(n => n.get("minValues") != null && n.get("minValues").size() == 1)
    assert(postCap.nonEmpty, "expected a capped-stats add from the append")
    postCap.foreach { n =>
      assert(n.get("minValues").has("col-1"),
        s"expected stats on physical col-1 (schema-first o_orderkey): $n")
    }
    // and the skipping engine can use them: an o_orderkey bound prunes
    assert(snap.readWhere(col("o_orderkey") < 0).count() == 0)
    assert(snap.read.count() == df.count() * 2)
  }
}
