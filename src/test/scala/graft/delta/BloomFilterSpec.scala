package graft.delta

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.delta.log.CommitWriter

/** `graft.bloomFilter.columns`: the normal write path emits
  * parquet-level bloom filters for the declared columns, giving the
  * read side row-group pruning on equality probes over unsorted
  * high-cardinality columns (min/max stats can't serve those). */
class BloomFilterSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_bloom_$name").toFile
    d.deleteOnExit()
    new java.io.File(d, "tbl").getAbsolutePath
  }

  private lazy val orders = spark.read
    .parquet(s"$sf/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_totalprice")

  /** column name -> has a bloom filter, from the file footer */
  private def bloomByColumn(file: java.io.File): Map[String, Boolean] = {
    val conf = spark.sessionState.newHadoopConf()
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file.getAbsolutePath), conf))
    try {
      val block = reader.getFooter.getBlocks.get(0)
      import scala.jdk.CollectionConverters._
      block.getColumns.asScala.map(c =>
        c.getPath.toDotString -> (c.getBloomFilterOffset >= 0)).toMap
    } finally reader.close()
  }

  private def dataFiles(tablePath: String): Seq[java.io.File] =
    new java.io.File(tablePath).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .toSeq

  test("declared columns carry parquet bloom filters, others do not") {
    val p = tmp("write")
    // parquet-mr only materializes a bloom for chunks that FALL OUT of
    // dictionary encoding (a dictionary page is already an exact
    // row-group filter) — which is precisely the high-cardinality case
    // blooms exist for. 40k distinct md5 strings overflow the 1 MiB
    // dictionary page cap and force the fallback.
    val hi = spark.range(40000).select(col("id"),
      md5(col("id").cast("string")).as("h"))
    CommitWriter.createTable(spark, hi.repartition(1), p,
      configuration = Map(CommitWriter.BloomFilterColumnsKey -> "h"))
    val blooms = bloomByColumn(dataFiles(p).head)
    assert(blooms("h"), "declared column missing its bloom filter")
    assert(!blooms("id"), "undeclared column grew a bloom filter")
  }

  test("appends after SET TBLPROPERTIES pick the property up; reads " +
    "through the delta path stay exact") {
    val p = tmp("alter")
    CommitWriter.createTable(spark, orders.limit(10).repartition(1), p)
    assert(!bloomByColumn(dataFiles(p).head)("o_custkey"))
    new graft.GraftSession(spark).sql(
      s"ALTER TABLE '$p' SET TBLPROPERTIES (" +
        s"'${CommitWriter.BloomFilterColumnsKey}' = 'o_custkey')")
    CommitWriter.append(spark,
      orders.limit(40).where(col("o_orderkey") % 2 === 0).repartition(1), p)
    val files = dataFiles(p)
    assert(files.exists(f => bloomByColumn(f)("o_custkey")),
      "post-property append wrote no bloom filter")
    // equality probes through the full delta read path stay exact
    val snap = DeltaTable.forPath(spark, p)
    val key = orders.limit(1).head.getLong(1)
    val expect = orders.limit(10).where(col("o_custkey") === key).count() +
      orders.limit(40).where(col("o_orderkey") % 2 === 0 &&
        col("o_custkey") === key).count()
    assert(snap.readWhere(col("o_custkey") === key).count() == expect)
    assert(snap.readWhere(col("o_custkey") === -12345L).count() == 0)
  }
}
