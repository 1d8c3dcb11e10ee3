package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

import graft.queries.SimilarityQueries
import graft.queries.SimilarityQueries.PqShape

/** High-dimension PQ rehearsal (dev probe, results cited in SCALE.md).
  *
  * The suite fixture's dim 64 structurally UNDERSTATES ADC's advantage:
  * exact pair cost grows linearly with the embedding width (512-dim
  * production embeddings cost 8× the fixture per pair; 4096-dim, 64×)
  * while ADC stays `m` one-byte lookups per pair. This probe re-runs
  * the PqProbe recall calibration and the exact-vs-ADC pairwise walls
  * at dim 512 with the scaled shape (m=64, subDim=8, k=128) against a
  * deterministic clustered corpus — the SAME train/encode plan shapes
  * as the fixture index (`SimilarityQueries.pqTrainCodebooks` /
  * `pqEncode` parametrized by [[PqShape]]), so what is rehearsed is
  * the production code path, not a stand-in.
  *
  * Corpus: N vectors in `nClusters` gaussian clusters (seeded — run-to
  * -run identical). Clustered geometry is the honest choice: PQ recall
  * on an unclustered uniform-random corpus is bounded by quantization
  * noise alone (the fixture already measures that worst case at dim
  * 64); production embedding spaces are clustered, and the dim-512
  * question is whether scaled-M ADC preserves NEIGHBORHOOD ranking.
  *
  * Run: sbt "runMain graft.tools.PqHighDim [N]".
  */
object PqHighDim {
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
    // codewords per subspace: default 128; pass 256 for the FULL
    // one-byte regime (codes 128..255 store as their two's complement —
    // pqEncode wraps explicitly, PqAdc reads unsigned — so the whole
    // byte is usable; the fixture's k=16 exists for oracle tractability
    // at dim 64, not as a recall recommendation)
    val kCodes = args.drop(3).headOption.map(_.toInt).getOrElse(128)
    val shape = PqShape(dim = 512, m = 64, subDim = 8, k = kCodes)
    val nClusters = args.drop(1).headOption.map(_.toInt).getOrElse(256)
    val sigma = args.drop(2).headOption.map(_.toDouble).getOrElse(2.0)
    val k = 20

    // deterministic clustered corpus: center + gaussian noise. Cluster
    // occupancy (n/nClusters) is sized UNDER the rerank budget `cand`,
    // the same rule production IVF-PQ uses to pick cand: once ADC puts
    // a probe's whole neighborhood inside the candidate pool, the exact
    // rerank owns the final ranking and recall rides on cluster
    // separation, not on sub-quantization noise ordering.
    val rows = ClusteredCorpus.rows(n, nClusters, shape.dim, sigma)
    val corpus = rows.toDF("vec_id", "label", "embedding")
      .repartition(32).localCheckpoint()

    // the corpus is a deterministic function of (n, nClusters, sigma),
    // so an existing index for the same arguments is reused — stage
    // measurements then iterate without paying the one-time train
    val dir = s"target/pq_highdim/${n}_${nClusters}_${sigma}_k$kCodes"
    val cbPath = s"$dir/codebooks"
    val codesPath = s"$dir/codes"
    val corpusPath = s"$dir/corpus"

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"[pq512] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }

    val cids = corpus.select(col("vec_id"), lit(0L).as("cid"))
    if (!new java.io.File(s"$codesPath/_SUCCESS").exists()) {
      val f = new java.io.File(dir)
      if (f.exists()) scala.reflect.io.Directory(f).deleteRecursively()
      time(s"train m=${shape.m} k=${shape.k}") {
        SimilarityQueries.pqTrainCodebooks(corpus, shape)
          .coalesce(1).write.parquet(cbPath)
      }
      time(s"encode $n x dim ${shape.dim}") {
        SimilarityQueries.pqEncode(corpus,
          spark.read.parquet(cbPath), cids, shape)
          .write.parquet(codesPath)
      }
      corpus.write.parquet(corpusPath)
    } else if (!new java.io.File(s"$corpusPath/_SUCCESS").exists())
      // a prior run died between the codes write and the corpus write:
      // heal the cache instead of failing at the parquet-fed stage
      corpus.write.mode("overwrite").parquet(corpusPath)
    val codes = spark.read.parquet(codesPath).localCheckpoint()
    println(s"[pq512] codes rows = ${codes.count()} " +
      s"(${shape.m} B/vec vs ${shape.dim * 4} B raw = " +
      f"${shape.dim * 4.0 / shape.m}%.0fx compression)")

    // driver LUT base: the (m, code) -> codeword map (m*k rows — the
    // sanctioned bounded collect, 1024 rows here)
    val cbRows = spark.read.parquet(cbPath).collect()
      .map(r => ((r.getAs[Int]("m"), r.getAs[Int]("code")),
        r.getSeq[Double](r.fieldIndex("cv")))).toMap

    def dot(a: Column, b: Column): Column =
      graft.functions.VectorExpressions.vectorDot(a, b)
    def norm(a: Column): Column = sqrt(dot(a, a))

    val probeIds = (0 until n by math.max(1, n / 20)).map(_.toLong)
    val probeVecs = rows.filter(t => probeIds.contains(t._1))
      .map(t => t._1 -> t._3.map(_.toDouble)).toMap

    // exact full-scan top-k per probe (the pairwise cost ADC replaces:
    // 512 multiplies per pair) vs ADC scan (64 one-byte lookups per
    // pair) + exact rerank of `cand` rows. Recall measured on the
    // ADC+rerank result vs the exact scan.
    def exactTopK(pid: Long): Seq[Long] = {
      val pv = probeVecs(pid)
      val p = Seq((pv.map(_.toFloat), {
        var s = 0.0; pv.foreach(x => s += x * x); math.sqrt(s)
      })).toDF("pv", "pn")
      corpus.where(col("vec_id") =!= pid)
        .crossJoin(broadcast(p))
        .withColumn("cosine", dot(col("embedding"), col("pv")) /
          (norm(col("embedding")) * col("pn")))
        .orderBy(desc("cosine"), asc("vec_id"))
        .limit(k).select("vec_id").collect().map(_.getLong(0)).toSeq
    }
    // flat m-major LUT for a probe + the native one-loop ADC score
    // (functions.PqAdc) over the packed code array — O(1) codegen at
    // any M; the unrolled element_at alternative is kept in the stage
    // comparison below to show why it was replaced
    def flatLut(pid: Long): Seq[Double] = {
      val pv = probeVecs(pid)
      (0 until shape.m).flatMap { m =>
        (0 until shape.k).map { c =>
          val cv = cbRows((m, c))
          var s = 0.0
          var i = 0
          while (i < shape.subDim) { s += pv(m * shape.subDim + i) * cv(i); i += 1 }
          s
        }
      }
    }
    val codesArr = array((0 until shape.m).map(m => col(s"c$m")): _*)
    def adcTopK(pid: Long, cand: Int): Seq[Long] = {
      val pv = probeVecs(pid)
      val adc = graft.functions.VectorExpressions.pqAdc(
        codesArr, typedLit(flatLut(pid)), shape.k) / col("xnorm")
      val candDf = codes.where(col("vec_id") =!= pid)
        .withColumn("adc", adc)
        .orderBy(desc("adc"), asc("vec_id"))
        .limit(cand)
      val p = Seq((pv.map(_.toFloat), {
        var s = 0.0; pv.foreach(x => s += x * x); math.sqrt(s)
      })).toDF("pv", "pn")
      candDf.join(corpus.select("vec_id", "embedding"), Seq("vec_id"))
        .crossJoin(broadcast(p))
        .withColumn("cosine", dot(col("embedding"), col("pv")) /
          (norm(col("embedding")) * col("pn")))
        .orderBy(desc("cosine"), asc("vec_id"))
        .limit(k).select("vec_id").collect().map(_.getLong(0)).toSeq
    }

    // PAIRWISE-STAGE walls — the stage the PQ k-NN join accelerates:
    // score EVERY (probe, vector) pair and reduce, no rerank. Exact
    // reads dim floats and spends dim multiplies per pair; ADC reads m
    // one-byte codes and spends m table lookups per pair. (The full
    // top-k walls below include the exact rerank, whose corpus join
    // costs the same on both sides and masks the stage difference at
    // probe counts this small.)
    def exactStage(pid: Long): Double = {
      val pv = probeVecs(pid)
      val p = Seq(Tuple1(pv.map(_.toFloat))).toDF("pv")
      corpus.crossJoin(broadcast(p))
        .agg(max(dot(col("embedding"), col("pv")))).head.getDouble(0)
    }
    def adcStage(pid: Long): Double = {
      val adc = graft.functions.VectorExpressions.pqAdc(
        codesArr, typedLit(flatLut(pid)), shape.k) / col("xnorm")
      codes.agg(max(adc)).head.getDouble(0)
    }
    // the composed form PqAdc replaced: M unrolled element_at(lit)
    // terms — O(M*K) codegen nodes, recompiled per probe
    def adcStageUnrolled(pid: Long): Double = {
      val pv = probeVecs(pid)
      val lut = Array.tabulate(shape.m, shape.k) { (m, c) =>
        val cv = cbRows((m, c))
        var s = 0.0
        var i = 0
        while (i < shape.subDim) { s += pv(m * shape.subDim + i) * cv(i); i += 1 }
        s
      }
      // unsigned read: codes past 127 store as negative bytes, and a
      // NEGATIVE element_at index would silently read from the END
      val adc = (0 until shape.m).map(m =>
        element_at(typedLit(lut(m).toSeq),
          (col(s"c$m").cast(IntegerType) + 256) % 256 + 1))
        .reduce(_ + _) / col("xnorm")
      codes.agg(max(adc)).head.getDouble(0)
    }
    exactStage(probeIds.head); adcStage(probeIds.head)
    adcStageUnrolled(probeIds.head) // warm all three
    val tE = System.nanoTime()
    probeIds.foreach(exactStage)
    val exactStageWall = (System.nanoTime() - tE) / 1e9
    val tA = System.nanoTime()
    probeIds.foreach(adcStage)
    val adcStageWall = (System.nanoTime() - tA) / 1e9
    val tU = System.nanoTime()
    probeIds.foreach(adcStageUnrolled)
    val adcUnrolledWall = (System.nanoTime() - tU) / 1e9
    println(f"[pq512] pairwise stage (RAM), ${probeIds.length} probes x " +
      f"$n pairs: exact $exactStageWall%.2f s vs ADC(native) " +
      f"$adcStageWall%.2f s (${exactStageWall / adcStageWall}%.1fx) vs " +
      f"ADC(unrolled) $adcUnrolledWall%.2f s")

    // STORAGE-FED pairwise stage — the production regime the footprint
    // argument is about: each scan decodes its relation from parquet,
    // and the exact side must move/decode ${dim*4} B/vector where the
    // codes side moves m bytes + one double. At 100 TB the vectors
    // cannot be RAM-resident; the codes can.
    val corpusP = spark.read.parquet(corpusPath)
    val codesP = spark.read.parquet(codesPath)
    def exactStageP(pid: Long): Double = {
      val pv = probeVecs(pid)
      val p = Seq(Tuple1(pv.map(_.toFloat))).toDF("pv")
      corpusP.crossJoin(broadcast(p))
        .agg(max(dot(col("embedding"), col("pv")))).head.getDouble(0)
    }
    def adcStageP(pid: Long): Double = {
      val adc = graft.functions.VectorExpressions.pqAdc(
        codesArr, typedLit(flatLut(pid)), shape.k) / col("xnorm")
      codesP.agg(max(adc)).head.getDouble(0)
    }
    exactStageP(probeIds.head); adcStageP(probeIds.head) // warm
    val tEP = System.nanoTime()
    probeIds.foreach(exactStageP)
    val exactPWall = (System.nanoTime() - tEP) / 1e9
    val tAP = System.nanoTime()
    probeIds.foreach(adcStageP)
    val adcPWall = (System.nanoTime() - tAP) / 1e9
    println(f"[pq512] pairwise stage (parquet-fed), ${probeIds.length} " +
      f"probes x $n pairs: exact $exactPWall%.2f s vs ADC(native) " +
      f"$adcPWall%.2f s (${exactPWall / adcPWall}%.1fx)")

    // PACKED code storage: M separate byte columns cost M column-chunk
    // reads per file per scan — at M=64 the parquet-fed stage above is
    // column-chunk-overhead-bound, not data-bound. One array<byte>
    // column restores the footprint advantage; this is the wide-M
    // storage layout a production index would use (the fixture's M=8
    // keeps per-column storage for oracle-SQL readability).
    val packedPath = s"$dir/codes_packed"
    if (!new java.io.File(s"$packedPath/_SUCCESS").exists())
      codesP.select(col("vec_id"), col("xnorm"), codesArr.as("codes"))
        .write.parquet(packedPath)
    val packedP = spark.read.parquet(packedPath)
    def adcStagePacked(pid: Long): Double = {
      val adc = graft.functions.VectorExpressions.pqAdc(
        col("codes"), typedLit(flatLut(pid)), shape.k) / col("xnorm")
      packedP.agg(max(adc)).head.getDouble(0)
    }
    adcStagePacked(probeIds.head) // warm
    val tPP = System.nanoTime()
    probeIds.foreach(adcStagePacked)
    val packedWall = (System.nanoTime() - tPP) / 1e9
    println(f"[pq512] pairwise stage (parquet-fed, PACKED codes), " +
      f"${probeIds.length} probes x $n pairs: ADC(native) " +
      f"$packedWall%.2f s (${exactPWall / packedWall}%.1fx vs exact)")

    // warm both plans off the clock
    exactTopK(probeIds.head); adcTopK(probeIds.head, 128)

    val t0 = System.nanoTime()
    val truth = probeIds.map(p => p -> exactTopK(p).toSet).toMap
    val exactWall = (System.nanoTime() - t0) / 1e9
    println(f"[pq512] exact scan, ${probeIds.length} probes: $exactWall%.2f s")

    for (cand <- Seq(128, 256, 512)) {
      val t1 = System.nanoTime()
      val recalls = probeIds.map { p =>
        val got = adcTopK(p, cand).toSet
        (truth(p) intersect got).size.toDouble / k
      }
      val adcWall = (System.nanoTime() - t1) / 1e9
      val mean = recalls.sum / recalls.length
      println(f"[pq512] ADC cand=$cand%-4d recall@$k = $mean%.3f " +
        f"(min ${recalls.min}%.2f), ${probeIds.length} probes: " +
        f"$adcWall%.2f s (${exactWall / adcWall}%.1fx vs exact)")
    }
    spark.stop()
  }
}
