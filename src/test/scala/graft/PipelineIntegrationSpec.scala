package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.delta.DeltaTable
import graft.delta.log.CommitWriter

/** End-to-end training-data pipeline over the library's own surface —
  * the "switch your pipeline to this engine" story exercised as one
  * flow rather than per-operator gates:
  *
  *   raw docs -> delta corpus table -> exact dedup -> near-dup cluster
  *   canonicalization -> quality/lang filter -> split assignment ->
  *   delta output partitioned by split -> incremental (version-range)
  *   pickup of a late append.
  *
  * Every stage is the same DataFrame plan the declared queries gate; the
  * assertions here check the COMPOSITION: counts reconcile stage to
  * stage, no duplicate survives to the output, splits are exhaustive
  * and disjoint, and the incremental read picks up exactly the late
  * batch.
  */
class PipelineIntegrationSpec extends AnyFunSuite {
  import TestSpark._

  test("corpus pipeline: dedup -> canonicalize -> filter -> split -> incremental") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pipeline")
    dir.toFile.deleteOnExit()
    val corpusPath = s"$dir/corpus"
    val outPath = s"$dir/train_ready"

    // ingest: documents land in a delta corpus table
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    CommitWriter.createTable(spark, docs, corpusPath)
    val corpus = DeltaTable.forPath(spark, corpusPath).read
    assert(corpus.count() == docs.count())

    // stage 1 — exact dedup: keep the min doc_id per content hash
    val exactKeep = corpus
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")

    // stage 2 — near-dup canonicalization: LSH candidate pairs ->
    // connected components -> keep only cluster canonicals
    val clusters = SparkEntry.queries("q_dup_clusters")(spark, sf)
    val nonCanonical = clusters.where(!col("is_canonical")).select("doc_id")
    val deduped = corpus
      .join(exactKeep, "doc_id") // semi on exact keepers
      .join(nonCanonical, Seq("doc_id"), "left_anti")
    val dd = deduped.count()
    assert(dd > 0 && dd < docs.count()) // something was removed
    // no two surviving docs share a content hash
    assert(deduped.groupBy(md5(col("text").cast("binary"))).count()
      .where(col("count") > 1).count() == 0)

    // stage 3 — quality/lang gate: non-trivial docs only
    val filtered = deduped.where(col("n_chars") >= 50)
    // stage 4 — deterministic split assignment (pure function of id)
    val split = filtered.withColumn("bucket",
      expr(s"CAST(conv(substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 15), 16, 10) AS BIGINT) % 100"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val").otherwise("test"))
      .drop("bucket")
    // splits are exhaustive and disjoint by construction; check counts
    val bySplit = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == filtered.count())
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L))

    // stage 5 — write the training-ready table partitioned by split
    split.write.format("graftdelta").option("partitionBy", "split")
      .save(outPath)
    val out = DeltaTable.forPath(spark, outPath)
    assert(out.partitionColumns == Seq("split"))
    assert(out.statsRowCount.contains(split.count()))
    // partition pruning serves a split without reading the others
    val trainOnly = out.readWhere(col("split") === "train")
    assert(trainOnly.count() == bySplit("train"))

    // stage 6 — a late batch lands in the corpus; incremental pickup
    // reads exactly that batch, not the whole corpus
    val late = docs.limit(7)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val v = CommitWriter.append(spark, late, corpusPath)
    val picked = spark.read.format("graftdelta")
      .option("path", corpusPath)
      .option("startingVersion", v.toString).load()
    assert(picked.count() == 7)
    assert(picked.agg(min("doc_id")).head.getLong(0) >= 1000000L)
  }
}
