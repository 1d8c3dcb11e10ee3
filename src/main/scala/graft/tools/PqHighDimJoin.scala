package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.queries.SimilarityQueries
import graft.queries.SimilarityQueries.PqShape

/** High-dimension PQ k-NN JOIN rehearsal (dev probe, results cited in
  * SCALE.md).
  *
  * [[PqHighDim]] measured the SEARCH and raw pairwise stages at dim 512;
  * this probe drives the refactored M-independent join pipeline
  * ([[SimilarityQueries.knnJoinPqOver]]: two size-gated joins + one
  * packed per-probe LUT + the native PqAdc loop — the shape that
  * replaced per-(m, code) equi-joins, which would be M=64 joins here)
  * at the production width, packed codes, against the exact IVF join
  * at the same coarse geometry. Agreement is measured as pair recall
  * vs the exact join (both rank the same coarse candidate pool; only
  * ADC-vs-exact candidate selection differs).
  *
  * Run: sbt "runMain graft.tools.PqHighDimJoin [N] [nClusters] [k]".
  */
object PqHighDimJoin {
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
    val kCodes = args.drop(2).headOption.map(_.toInt).getOrElse(128)
    val shape = PqShape(dim = 512, m = 64, subDim = 8, k = kCodes)
    val sigma = 2.0
    val k = 5
    val nprobe = 4
    val cand = 128

    // the same deterministic clustered corpus as PqHighDim
    // (ClusteredCorpus — shared by construction); the cluster id
    // doubles as the coarse cell (cid = the TRUE cluster), so the
    // join exercises real cid partition pruning with a realistic
    // per-cell occupancy (n / nClusters)
    val rows = ClusteredCorpus.rows(n, nClusters, shape.dim, sigma)
    val corpus = rows.toDF("vec_id", "label", "embedding")
      .repartition(32).localCheckpoint()
    val cids = corpus.select(col("vec_id"), col("label").as("cid"))

    val dir = s"target/pq_highdim_join/${n}_${nClusters}_k$kCodes"
    val cbPath = SimilarityQueries.pqCodebooksPath(s"$dir/codes")
    val codesPath = s"$dir/codes"
    val centroidsPath = s"$dir/centroids"
    val indexPath = s"$dir/ivf"

    def time[A](label: String)(body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[pqjoin] $label%-34s $sec%.2f s")
      (a, sec)
    }

    if (!new java.io.File(s"$codesPath/_SUCCESS").exists()) {
      val f = new java.io.File(dir)
      if (f.exists()) scala.reflect.io.Directory(f).deleteRecursively()
      time(s"train m=${shape.m} k=${shape.k}") {
        SimilarityQueries.pqTrainCodebooks(corpus, shape)
          .coalesce(1).write.parquet(cbPath)
      }
      // centroids = per-cell means (the coarse set both joins rank)
      corpus.groupBy(col("label").as("cid"))
        .agg(array((1 to shape.dim).map(i =>
          avg(element_at(col("embedding"), i).cast(DoubleType))): _*)
          .as("cv"))
        .coalesce(1).write.parquet(centroidsPath)
      // exact side: the raw vectors partitioned by the same cells
      corpus.select(col("vec_id"), col("label"), col("embedding"),
        col("label").as("cid"))
        .write.partitionBy("cid").parquet(indexPath)
      time(s"encode $n x dim ${shape.dim} PACKED") {
        SimilarityQueries.pqEncode(corpus,
          spark.read.parquet(cbPath), cids, shape, packed = true)
          .write.partitionBy("cid").parquet(codesPath)
      }
    }

    def dot(a: Column, b: Column): Column =
      graft.functions.VectorExpressions.vectorDot(a, b)
    def norm(a: Column): Column = sqrt(dot(a, a))

    // exact IVF k-NN join at the same coarse geometry (knnJoin's plan
    // shape, inlined over the explicit relations)
    def exactJoin(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val index = spark.read.parquet(indexPath)
        .withColumn("cid", col("cid").cast("long"))
      val centroids = spark.read.parquet(centroidsPath)
      val probes = corpus.where(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
          norm(col("embedding")).as("pn"))
      val probed = probes.crossJoin(broadcast(centroids))
        .withColumn("sim", dot(col("cv"), col("pv")))
        .withColumn("crk", row_number().over(Window.partitionBy("probe_id")
          .orderBy(desc("sim"), asc("cid"))))
        .where(col("crk") <= nprobe)
        .select(col("probe_id"), col("cid"), col("pv"), col("pn"))
      val probedCids = probed.select("cid").distinct()
        .collect().map(_.getLong(0)).toSeq
      index.where(col("cid").isin(probedCids: _*))
        .join(probed.hint("merge"), Seq("cid"))
        .where(col("vec_id") =!= col("probe_id"))
        .withColumn("cosine", dot(col("embedding"), col("pv")) /
          (norm(col("embedding")) * col("pn")))
        .withColumn("rank", row_number().over(Window.partitionBy("probe_id")
          .orderBy(desc("cosine"), asc("vec_id"))))
        .where(col("rank") <= k)
        .select("probe_id", "vec_id")
    }

    def pqJoin(): DataFrame =
      SimilarityQueries.knnJoinPqOver(spark, corpus, codesPath,
        centroidsPath, k = k, nprobe = nprobe, cand = cand,
        packed = true, shape = shape)
        .select("probe_id", "vec_id")

    // warm both plans (codegen + page cache), then measure
    exactJoin().count(); pqJoin().count()
    val (exactPairs, exactWall) = time(s"exact join, ${n / 100} probes") {
      exactJoin().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val (pqPairs, pqWall) = time(s"PQ join PACKED m=${shape.m}") {
      pqJoin().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val recall = (exactPairs intersect pqPairs).size.toDouble /
      exactPairs.size
    println(f"[pqjoin] n=$n probes=${n / 100} nprobe=$nprobe cand=$cand " +
      f"k=$k m=${shape.m} kCodes=$kCodes: exact $exactWall%.2f s, " +
      f"packed PQ $pqWall%.2f s (${exactWall / pqWall}%.2fx), " +
      f"pair recall $recall%.3f")
    spark.stop()
  }
}
