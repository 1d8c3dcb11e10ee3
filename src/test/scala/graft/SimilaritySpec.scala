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
    // nprobe=8 of 10 seed clusters scans ~80% here (tiny fixture);
    // recall must be clearly better than random (k/n ~ 4%)
    assert(recall >= 0.5, s"recall@$k = $recall")
  }

  test("ANN scans only the probed clusters (strict candidate subset)") {
    val ann = SimilarityQueries.annIvf(spark, sf, probeId = 0, k = 500,
      nprobe = 2).collect()
    // with nprobe=2 of the 10 seed centroids, the candidate set must be
    // a strict subset of the corpus
    assert(ann.length < 499, s"ANN scanned ${ann.length} of 499 vectors")
  }
}
