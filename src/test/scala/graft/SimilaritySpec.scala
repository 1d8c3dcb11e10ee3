package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.SimilarityQueries

class SimilaritySpec extends AnyFunSuite {
  import TestSpark._

  test("IVF ANN achieves useful recall vs brute force at reduced scan") {
    val k = 20
    val brute = SimilarityQueries.bruteTopK(spark, sf, probeId = 0, k = k)
      .collect().map(_.getLong(0)).toSet
    val ann = SimilarityQueries.annIvf(spark, sf, probeId = 0, k = k,
      nprobe = 8).collect().map(_.getLong(0)).toSet
    val recall = (brute intersect ann).size.toDouble / k
    // k-means-refined centroids, nprobe=8 of <=10 clusters: the probe's
    // true neighbors must land almost entirely in the probed partitions
    assert(recall >= 0.9, s"recall@$k = $recall")
  }

  test("embed near-dup band buckets are bounded (hot-bucket cap holds)") {
    import org.apache.spark.sql.functions._
    val emb = graft.queries.T.load(spark, sf, "embeddings")
    val hist = SimilarityQueries.embedBuckets(emb)
      .select(size(col("vs")).as("n"))
      .agg(max("n").as("mx"), count(lit(1)).as("buckets"))
      .collect()(0)
    assert(hist.getInt(0) <= SimilarityQueries.EmbedBucketMax,
      s"max bucket ${hist.getInt(0)} exceeds cap")
    // the cap bounds candidate pairs at bands * 2^bits * M^2/2 regardless
    // of corpus size; at fixture scale no bucket comes near the cap
    assert(hist.getInt(0) < 100, s"fixture bucket unexpectedly hot: $hist")
  }

  test("embed near-dup candidates are distinct pairs from capped buckets") {
    val emb = graft.queries.T.load(spark, sf, "embeddings")
    val cand = SimilarityQueries.embedCandidates(emb).collect()
    val pairs = cand.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == pairs.distinct.length, "duplicate candidate pairs")
    assert(pairs.forall { case (a, b) => a < b }, "unordered pair emitted")
    assert(pairs.nonEmpty)
  }

  test("ANN scans only the probed clusters (strict candidate subset)") {
    val ann = SimilarityQueries.annIvf(spark, sf, probeId = 0, k = 500,
      nprobe = 2).collect()
    // with nprobe=2 of the 10 seed centroids, the candidate set must be
    // a strict subset of the corpus
    assert(ann.length < 499, s"ANN scanned ${ann.length} of 499 vectors")
  }
}
