package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.queries.SimilarityQueries
import graft.queries.SimilarityQueries.PqShape

/** Residual-vs-raw PQ rehearsal (dev probe, results cited in SCALE.md).
  *
  * Why residual encoding (the full Jégou IVFADC) earns its complexity:
  * raw-vector codes spend the byte budget re-encoding each coarse
  * cell's POSITION — on a clustered corpus most of a vector's energy
  * is its cell center, so at small K the codewords chase centers and
  * the within-cell offsets (what actually ranks neighbors) vanish
  * below quantization noise. Residual codes quantize exactly those
  * offsets. This probe runs BOTH constructions at the SAME byte budget
  * over the same clustered dim-512 corpus (cid = true cluster) and
  * compares end-to-end recall through the production search paths
  * (`annPqSearch` / `annPqResidualSearch`), at the small-K regimes
  * where the round-14 rehearsal measured raw-vector PQ collapsing.
  *
  * Run: sbt "runMain graft.tools.PqResidualProbe [N] [nClusters] [k...]"
  */
object PqResidualProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val nClusters = args.drop(1).headOption.map(_.toInt).getOrElse(256)
    val ks = {
      val rest = args.drop(2).map(_.toInt)
      if (rest.nonEmpty) rest.toSeq else Seq(16, 64)
    }
    val dim = 512
    val sigma = 2.0
    val k = 20
    val nprobe = 4
    val cand = 128

    // the PqHighDimJoin corpus (ClusteredCorpus — shared by
    // construction): deterministic clustered, cid = cluster
    val rows = ClusteredCorpus.rows(n, nClusters, dim, sigma)
    val corpus = rows.toDF("vec_id", "label", "embedding")
      .repartition(32).localCheckpoint()
    val cids = corpus.select(col("vec_id"), col("label").as("cid"))

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"[pqresid] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }

    val byId = rows.map(t => t._1 -> t._3.map(_.toDouble)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double =
      ClusteredCorpus.cos(a, b)
    val probeIds = (0 until n by math.max(1, n / 20)).map(_.toLong)
    val truth = probeIds.map { pid =>
      val probe = byId(pid)
      pid -> rows.filter(_._1 != pid)
        .map { case (id, _, v) => (id, cos(v.map(_.toDouble), probe)) }
        .sortBy(t => (-t._2, t._1)).take(k).map(_._1).toSet
    }.toMap

    for (kCodes <- ks) {
      val shape = PqShape(dim = dim, m = 64, subDim = 8, k = kCodes)
      val dir = s"target/pq_residual_probe/${n}_${nClusters}_k$kCodes"
      val rawPath = s"$dir/raw"
      val resPath = s"$dir/residual"
      val centroidsPath = s"$dir/centroids"
      if (!new java.io.File(s"$resPath/_SUCCESS").exists()) {
        val f = new java.io.File(dir)
        if (f.exists()) scala.reflect.io.Directory(f).deleteRecursively()
        corpus.groupBy(col("label").as("cid"))
          .agg(array((1 to dim).map(i =>
            avg(element_at(col("embedding"), i).cast(DoubleType))): _*)
            .as("cv"))
          .coalesce(1).write.parquet(centroidsPath)
        val centroids = spark.read.parquet(centroidsPath)
        time(s"k=$kCodes RAW train+encode (packed)") {
          SimilarityQueries.pqTrainCodebooks(corpus, shape).coalesce(1)
            .write.parquet(SimilarityQueries.pqCodebooksPath(rawPath))
          SimilarityQueries.pqEncode(corpus,
            spark.read.parquet(SimilarityQueries.pqCodebooksPath(rawPath)),
            cids, shape, packed = true)
            .write.partitionBy("cid").parquet(rawPath)
        }
        time(s"k=$kCodes RESIDUAL train+encode (packed)") {
          val resid = SimilarityQueries
            .residualsAgainst(corpus, cids, centroids, shape.dim)
          SimilarityQueries.pqTrainCodebooks(resid, shape).coalesce(1)
            .write.parquet(SimilarityQueries.pqCodebooksPath(resPath))
          SimilarityQueries.pqEncode(resid,
            spark.read.parquet(SimilarityQueries.pqCodebooksPath(resPath)),
            cids, shape, packed = true, normOf = Some(corpus))
            .write.partitionBy("cid").parquet(resPath)
        }
      }
      def recallOf(search: Long => Set[Long]): Double = {
        val rs = probeIds.map(p => (truth(p) intersect search(p)).size
          .toDouble / k)
        rs.sum / rs.length
      }
      val rawRecall = time(s"k=$kCodes RAW search, ${probeIds.length} probes") {
        recallOf(pid => SimilarityQueries.annPqSearch(spark, corpus,
          rawPath, centroidsPath, pid, k, nprobe, cand,
          packedCodes = true, shape = shape)
          .collect().map(_.getLong(0)).toSet)
      }
      val resRecall = time(s"k=$kCodes RESIDUAL search, ${probeIds.length} probes") {
        recallOf(pid => SimilarityQueries.annPqResidualSearch(spark,
          corpus, resPath, centroidsPath, pid, k, nprobe, cand,
          shape = shape)
          .collect().map(_.getLong(0)).toSet)
      }
      println(f"[pqresid] n=$n dim=$dim m=64 k=$kCodes cand=$cand " +
        f"nprobe=$nprobe: recall@$k RAW ${rawRecall}%.3f vs " +
        f"RESIDUAL ${resRecall}%.3f")
    }
    spark.stop()
  }
}
