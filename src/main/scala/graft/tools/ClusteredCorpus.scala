package graft.tools

/** The ONE deterministic clustered corpus every high-dim PQ rehearsal
  * draws from (PqHighDim, PqHighDimJoin, PqResidualProbe): seeded
  * centers (Random(42), amplitude 10), per-row gaussian noise
  * (Random(1000 + i)), cluster id = i % nClusters. Shared by
  * construction — SCALE.md cites these probes against each other, and
  * a geometry tweak must move them together or the comparisons
  * silently desynchronize.
  */
object ClusteredCorpus {

  /** (vec_id, cluster, embedding) rows. */
  def rows(n: Int, nClusters: Int, dim: Int,
      sigma: Double): IndexedSeq[(Long, Long, Seq[Float])] = {
    val rng = new scala.util.Random(42)
    val centers = Array.fill(nClusters)(
      Array.fill(dim)(rng.nextGaussian() * 10.0))
    (0 until n).map { i =>
      val r = new scala.util.Random(1000L + i)
      val c = i % nClusters
      (i.toLong, c.toLong, Seq.tabulate(dim)(d =>
        (centers(c)(d) + r.nextGaussian() * sigma).toFloat))
    }
  }

  /** Driver-side cosine for the probes' exact-truth computations. */
  def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / (math.sqrt(a.map(x => x * x).sum) *
      math.sqrt(b.map(x => x * x).sum))
  }
}
