package graft.delta

import java.io.File
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** DAT-style acceptance tests, mirroring the reference harness
  * assertions (crates/acceptance/src/meta.rs:78-116 + data.rs:20-154):
  * per-case metadata at latest and each recorded historical version
  * (version, properties, min reader/writer), and full-scan content vs
  * golden parquet with the DV mask applied, both sides lex-sorted on
  * every non-nested column. */
class AcceptanceSpec extends AnyFunSuite {
  import TestSpark._

  private val mapper = new ObjectMapper()
  private lazy val cases = DatHarness.generate(spark)

  private def sortAll(df: DataFrame): Seq[String] = {
    val sortCols = df.schema.fields.collect {
      case f if !f.dataType.isInstanceOf[StructType] &&
        !f.dataType.isInstanceOf[ArrayType] &&
        !f.dataType.isInstanceOf[MapType] => f.name
    }.toSeq
    df.orderBy(sortCols.map(org.apache.spark.sql.functions.asc_nulls_last): _*)
      .collect().map(_.toString).toSeq
  }

  private def assertContent(got: DataFrame, goldenDir: String): Unit = {
    val want = spark.read.parquet(goldenDir)
    assert(got.schema.fieldNames.toSeq == want.schema.fieldNames.toSeq,
      "field-name mismatch")
    assert(got.count() == want.count(), "row-count mismatch")
    assert(sortAll(got) == sortAll(want), "content mismatch")
  }

  private def meta(path: String) = mapper.readTree(
    java.nio.file.Files.readString(new File(path).toPath))

  for (name <- Seq("basic_append", "partitioned", "with_checkpoint",
    "schema_evolution", "column_mapping", "deletion_vectors",
    "time_travel", "type_widening",
    "composite_widen_cp_restore", "composite_mapping_dv",
    "composite_dv_checkpoint", "composite_full_history",
    "composite_props_protocol", "composite_mapping_evolve",
    "composite_dv_dml", "composite_cluster_widen",
    "composite_guards_restore", "composite_replacewhere_cdf")) {

    test(s"DAT case: $name") {
      val c = cases.find(_.name == name).get
      val expectedRoot = new File(s"${c.dir}/expected")

      for (label <- expectedRoot.list().toSeq.sorted) {
        val versionAsOf =
          if (label == "latest") None else Some(label.stripPrefix("v").toLong)
        val snap = DeltaTable.forPath(spark, c.tablePath, versionAsOf)
        val m = meta(s"${c.dir}/expected/$label/table_version_metadata.json")
        assert(snap.version == m.get("version").asLong(), s"$label version")
        assert(snap.protocol.minReaderVersion ==
          m.get("min_reader_version").asInt(), s"$label minReader")
        assert(snap.protocol.minWriterVersion ==
          m.get("min_writer_version").asInt(), s"$label minWriter")
        val props = m.get("properties")
        props.properties().forEach { e =>
          assert(snap.metadata.configuration.get(e.getKey)
            .contains(e.getValue.asText()), s"$label property ${e.getKey}")
        }
        val contentDir = new File(s"${c.dir}/expected/$label/table_content")
        if (contentDir.exists())
          assertContent(snap.read, contentDir.toString)
      }
    }
  }
}
