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

  test("two-level IVF: routed assignment agrees with flat, search recall " +
    "holds, and the route scores only the probed supers' children") {
    import org.apache.spark.sql.functions._
    val k = 20
    val path = SimilarityQueries.ivfTwoLevelIndexPath(spark, sf)
    val sup = graft.delta.IndexStore.superCentroidsAt(spark, path)
    val routed = graft.delta.IndexStore.routedCentroidsAt(spark, path)
    val k1 = sup.count()
    val nlist = routed.count()
    assert(k1 >= 2 && k1 < nlist,
      s"degenerate hierarchy: k1=$k1 over nlist=$nlist")
    // every centroid routes to a live super-cell (the child map is total)
    assert(routed.join(sup, Seq("scid"), "left_anti").count() == 0)
    // ...and every super has >= 1 child — a childless super winning a
    // stage-1 route would silently drop that vector (stage 2 is an
    // equi-join); training drops them, making assignment total at any w
    assert(sup.join(routed.select("scid").distinct(),
      Seq("scid"), "left_anti").count() == 0,
      "childless super survived training")
    // the two-level assignment is the flat assignment except where the
    // true cell's super falls outside the top-w routes — on the
    // clustered fixture that is a small boundary minority
    val emb = graft.queries.T.load(spark, sf, "embeddings")
    val flat = SimilarityQueries.assignTo(emb,
      routed.select("cid", "cv")).select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = graft.delta.IndexStore.data(spark, path)
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two.keySet == flat.keySet)
    val agree = two.count { case (v, c) => flat(v) == c }.toDouble / two.size
    assert(agree >= 0.9, s"two-level vs flat assignment agreement $agree")
    // search recall vs brute force through the hierarchical route
    val brute = SimilarityQueries.bruteTopK(spark, sf, probeId = 0, k = k)
      .collect().map(_.getLong(0)).toSet
    val ann = SimilarityQueries.annIvfTwoLevel(spark, sf, probeId = 0,
      k = k, nprobe = 8, superProbes = 4)
      .collect().map(_.getLong(0)).toSet
    val recall = (brute intersect ann).size.toDouble / k
    assert(recall >= 0.85, s"two-level recall@$k = $recall")
    // the arithmetic prune is real: a strict super-probe budget scores
    // a strict subset of the centroid set (on the tiny fixture k1=4,
    // so the query's s=4 legitimately covers every super — probe with
    // half the supers to observe the prune itself)
    val sProbes = math.max(1, (k1 / 2).toInt)
    val topSupers = sup
      .crossJoin(broadcast(emb.where(col("vec_id") === 0)
        .select(col("embedding").as("pv"))))
      .withColumn("ssim", graft.functions.VectorExpressions
        .vectorDot(col("cv"), col("pv")))
      .orderBy(desc("ssim"), asc("scid")).limit(sProbes)
      .select("scid").collect().map(_.getLong(0)).toSet
    val children = routed.where(col("scid").isInCollection(topSupers.toSeq))
      .count()
    assert(children < nlist,
      s"route prunes nothing: $children children of $nlist cells")
  }

  test("PQ ANN: ADC + exact rerank keeps recall; codes are 8 bytes/vector") {
    import org.apache.spark.sql.types.ByteType
    val k = 20
    val brute = SimilarityQueries.bruteTopK(spark, sf, probeId = 0, k = k)
      .collect().map(_.getLong(0)).toSet
    val pq = SimilarityQueries.annPq(spark, sf, probeId = 0, k = k,
      nprobe = 8, cand = SimilarityQueries.PqCand)
      .collect().map(_.getLong(0)).toSet
    val recall = (brute intersect pq).size.toDouble / k
    // quantization loss only affects CANDIDATE selection (the rerank is
    // exact); PqCand = 6.4x k absorbs the ADC ranking error even on
    // this worst-case fixture (random vectors, near-zero cosine
    // separation between neighbor ranks). Measured: PQ reaches the IVF
    // coarse-prune ceiling (0.95) at cand=128.
    assert(recall >= 0.9, s"PQ recall@$k = $recall")
    // the scan relation carries NO vector column — PqM one-byte codes
    // (the 32x memory compression that IS the PQ scale path)
    val codes = graft.delta.IndexStore.data(spark,
      SimilarityQueries.pqIndexPath(spark, sf))
    assert(!codes.schema.fieldNames.contains("embedding"))
    val codeFields = codes.schema.filter(_.name.matches("c\\d+"))
    assert(codeFields.size == SimilarityQueries.PqM)
    assert(codeFields.forall(_.dataType == ByteType))
    // on-disk: codes dir (all cid partitions) well under the raw
    // embeddings parquet despite per-file overhead at fixture scale
    def dirBytes(d: java.io.File): Long =
      Option(d.listFiles()).toSeq.flatten
        .map(f => if (f.isDirectory) dirBytes(f) else f.length()).sum
    val codesBytes = dirBytes(
      new java.io.File(SimilarityQueries.pqIndexPath(spark, sf)))
    val rawBytes = new java.io.File(s"$sf/embeddings.parquet").length()
    assert(codesBytes < rawBytes / 2,
      s"codes $codesBytes bytes vs raw $rawBytes")
    // every vector is encoded exactly once
    val emb = graft.queries.T.load(spark, sf, "embeddings")
    assert(codes.count() == emb.count())
  }

  test("PQ codebook training keeps empty codewords: full PqM x PqK " +
    "codebook, no NaN coordinates") {
    // duplicate seed vectors force duplicate codewords: assignment ties
    // go to the lower code, so the higher duplicate loses EVERY
    // assignment — the shape that silently shrank the codebook (and
    // left NaN LUT slots downstream) before retention
    import spark.implicits._
    def vec(i: Int): Array[Float] =
      Array.tabulate(64)(d => (((i * 31 + d * 7) % 13) - 6).toFloat)
    val corpus = (0 until 40)
      .map(i => (i.toLong, if (i == 1) vec(0) else vec(i)))
      .toDF("vec_id", "embedding")
    val cb = SimilarityQueries.pqTrainCodebooks(corpus).collect()
    val full = SimilarityQueries.PqM * SimilarityQueries.PqK
    assert(cb.length == full, s"codebook shrank to ${cb.length}/$full")
    val keys = cb.map(r => (r.getAs[Int]("m"), r.getAs[Int]("code")))
    assert(keys.distinct.length == keys.length, "duplicate (m, code) slots")
    assert(cb.forall(r =>
      r.getSeq[Double](r.fieldIndex("cv")).forall(v => !v.isNaN)),
      "NaN codeword coordinate")
  }

  test("packed-codes PQ ANN returns row-identical results to the " +
    "per-column layout") {
    // same codes, same LUTs, same search — only the storage layout
    // differs, so the result sets must match VALUE-FOR-VALUE (adc and
    // cosine included: PqAdc accumulates in the same m-order either way)
    val perCol = SparkEntry.queries("q_sim_ann_pq")(spark, sf)
      .collect().map(_.toSeq)
    val packed = SparkEntry.queries("q_sim_ann_pq_packed")(spark, sf)
      .collect().map(_.toSeq)
    assert(perCol.nonEmpty && packed.toSeq == perCol.toSeq)
    // and the packed relation really is packed: one array column, no
    // c0..c7 byte columns
    val schema = graft.delta.IndexStore.data(spark,
      SimilarityQueries.pqPackedIndexWithIvf(spark, sf)._1).schema
    assert(schema.fieldNames.contains("codes"))
    assert(!schema.fieldNames.exists(_.matches("c\\d+")))
  }

  test("packed PQ variants are value-identical to their per-column " +
    "twins (filtered, incremental, k-NN join)") {
    import org.apache.spark.sql.functions.{array, col}
    import org.apache.spark.sql.types.{ArrayType, ByteType}
    // same codes, same LUTs, same searches — only the storage layout
    // differs, so each variant must match its twin VALUE-FOR-VALUE
    for ((a, b) <- Seq(
      ("q_sim_ann_pq_filtered", "q_sim_ann_pq_filtered_packed"),
      ("q_sim_ann_pq_incremental", "q_sim_ann_pq_incr_packed"),
      ("q_knn_join_pq", "q_knn_join_pq_packed"))) {
      val perCol = SparkEntry.queries(a)(spark, sf).collect().map(_.toSeq)
      val packed = SparkEntry.queries(b)(spark, sf).collect().map(_.toSeq)
      assert(perCol.nonEmpty && packed.toSeq == perCol.toSeq,
        s"$b diverges from $a")
    }
    // the incremental packed relation really is packed (one array<byte>
    // column, no per-column bytes) ...
    val (path, _) = graft.queries.SimilarityQueries
      .pqIncrementalPackedIndexWithIvf(spark, sf)
    val schema = graft.delta.IndexStore.data(spark, path).schema
    assert(schema.fieldNames.contains("codes"))
    assert(schema("codes").dataType.asInstanceOf[ArrayType]
      .elementType == ByteType)
    assert(!schema.fieldNames.exists(_.matches("c\\d+")))
    // ... and the packed APPEND encoded every row identically to the
    // per-column append: full-relation parity, residents and batch both
    val (colPath, _) = graft.queries.SimilarityQueries
      .pqIncrementalIndexWithIvf(spark, sf)
    def rows(p: String, codes: org.apache.spark.sql.Column) =
      graft.delta.IndexStore.data(spark, p)
        .select(col("vec_id"), codes.as("codes"), col("xnorm"),
          col("label"), col("cid"))
        .orderBy("vec_id").collect().map(_.toSeq)
    val fromCols = rows(colPath, array((0 until
      graft.queries.SimilarityQueries.PqM).map(m => col(s"c$m")): _*))
    val fromPacked = rows(path, col("codes"))
    assert(fromCols.nonEmpty && fromPacked.toSeq == fromCols.toSeq,
      "packed incremental index diverges from the per-column append")
  }

  test("packed streaming PQ ingest stores one codes array per row and " +
    "matches the per-column stream row-for-row") {
    import org.apache.spark.sql.types.{ArrayType, ByteType}
    val perCol = SparkEntry.queries("q_stream_pq_ingest")(spark, sf)
      .collect().map(_.toSeq)
    val packed = SparkEntry.queries("q_stream_pq_ingest_packed")(spark, sf)
      .collect().map(_.toSeq)
    assert(perCol.nonEmpty && packed.toSeq == perCol.toSeq,
      "packed stream ingest diverges from the per-column stream")
    // the packed SINK really stores the production layout: one
    // array<byte> codes column, never per-column bytes (the query
    // unpacks only for the oracle compare)
    val tag = sf.replaceAll("[^a-zA-Z0-9]", "_")
    val schema = spark.read
      .parquet(s"target/stream_pq_packed_sink_$tag").schema
    assert(schema.fieldNames.contains("codes"))
    assert(schema("codes").dataType.asInstanceOf[ArrayType]
      .elementType == ByteType)
    assert(!schema.fieldNames.exists(_.matches("c\\d+")))
  }

  test("PQ at production width: dim 512 (m=64) recall@20 >= 0.9 " +
    "through train/encode parametrized by PqShape") {
    // the fixture's dim 64 understates ADC (exact pair cost grows with
    // width, codes stay one byte per subspace); this pins the scaled
    // shape on a clustered dim-512 corpus — the same train/encode plan
    // shapes, parametrized, per the round-13 verdict's rehearsal ask.
    // Geometry: cluster occupancy sits under the rerank budget (the
    // production rule for picking cand), codewords at the one-byte
    // regime (k=64 here; the calibration sweep in SCALE.md ran k=128).
    import graft.queries.SimilarityQueries.PqShape
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val shape = PqShape(dim = 512, m = 64, subDim = 8, k = 64)
    val nClusters = 32
    val n = 2000
    val k = 20
    val cand = 128
    val rng = new scala.util.Random(7)
    val centers = Array.fill(nClusters)(
      Array.fill(shape.dim)(rng.nextGaussian() * 10.0))
    val rows = (0 until n).map { i =>
      val r = new scala.util.Random(5000L + i)
      val v = Seq.tabulate(shape.dim)(d =>
        (centers(i % nClusters)(d) + r.nextGaussian() * 2.0).toFloat)
      (i.toLong, (i % nClusters).toLong, v)
    }
    val corpus = rows.toDF("vec_id", "label", "embedding")
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_pq512_${
      System.nanoTime()}"
    SimilarityQueries.pqTrainCodebooks(corpus, shape)
      .coalesce(1).write.parquet(s"$dir/cb")
    SimilarityQueries.pqEncode(corpus, spark.read.parquet(s"$dir/cb"),
      corpus.select(col("vec_id"), lit(0L).as("cid")), shape)
      .write.parquet(s"$dir/codes")
    val cb = spark.read.parquet(s"$dir/cb").collect()
      .map(r => ((r.getAs[Int]("m"), r.getAs[Int]("code")),
        r.getSeq[Double](r.fieldIndex("cv")))).toMap
    assert(cb.size == shape.m * shape.k, s"codebook size ${cb.size}")
    val codes = spark.read.parquet(s"$dir/codes").collect()
    val byId = rows.map(t => t._1 -> t._3.map(_.toDouble)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val recalls = Seq(0L, 501L, 1003L).map { pid =>
      val probe = byId(pid)
      val trueTop = rows.filter(_._1 != pid)
        .map { case (id, _, v) => (id, cos(v.map(_.toDouble), probe)) }
        .sortBy(t => (-t._2, t._1)).take(k).map(_._1).toSet
      val pool = codes.filter(_.getAs[Long]("vec_id") != pid).map { r =>
        val adc = (0 until shape.m).map { m =>
          val cv = cb((m, r.getAs[Byte](s"c$m").toInt))
          (0 until shape.subDim)
            .map(i => probe(m * shape.subDim + i) * cv(i)).sum
        }.sum / r.getAs[Double]("xnorm")
        (r.getAs[Long]("vec_id"), adc)
      }.sortBy(t => (-t._2, t._1)).take(cand).map(_._1)
      val got = pool.map(id => (id, cos(byId(id), probe)))
        .sortBy(t => (-t._2, t._1)).take(k).map(_._1).toSet
      (trueTop intersect got).size.toDouble / k
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"dim-512 recall@$k = $mean ($recalls)")
  }

  test("post-split IVF index: the largest cell is gone, rows preserved, " +
    "assignments follow the patched centroids, recall holds") {
    import org.apache.spark.sql.functions.col
    import graft.queries.SimilarityQueries
    val k = 20
    val path = SimilarityQueries.ivfSplitIndexPath(spark, sf)
    val emb = graft.queries.T.load(spark, sf, "embeddings")
    val index = graft.delta.IndexStore.data(spark, path)
    // nothing lost, nothing duplicated by the split
    assert(index.count() == emb.count())
    assert(index.select("vec_id").distinct().count() == emb.count())
    // the index's cids and the patched centroid set agree exactly, and
    // the split really happened: MORE centroids than the base build's
    val cents = graft.delta.IndexStore.centroidsAt(spark, path)
      .select("cid").collect().map(_.getLong(0)).toSet
    val used = index.select("cid").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(used.subsetOf(cents), s"unknown cids: ${used -- cents}")
    val baseCents = graft.delta.IndexStore.centroidsAt(spark,
      SimilarityQueries.ivfIndexPath(spark, sf)).count()
    assert(cents.size == baseCents + 1,
      s"expected ${baseCents + 1} centroids post-split, got ${cents.size}")
    // the split is LOCAL: the fat cell's rows re-assign among the new
    // sub-centroids by the assignTo rule; every other row keeps the
    // assignment of the identically-built base index (a boundary row
    // of another cell may now be nearer a sub-centroid — the accepted
    // local-split trade, same class as incremental centroid drift)
    val baseAssign = graft.delta.IndexStore.data(spark,
      SimilarityQueries.ivfIndexPath(spark, sf))
      .select(col("vec_id"), col("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fatCid = baseAssign.groupBy(_._2).view.mapValues(_.size).toSeq
      .maxBy(t => (t._2, -t._1))._1
    val newCids = cents -- baseAssign.values.toSet
    assert(!used.contains(fatCid), "the split cell is still routable")
    assert(newCids.size == 2, s"expected 2 sub-cells, got $newCids")
    val stored = index.select("vec_id", "cid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // untouched rows kept their assignment
    val movedOutside = stored.count { case (id, cid) =>
      baseAssign(id) != fatCid && cid != baseAssign(id) }
    assert(movedOutside == 0, s"$movedOutside rows outside the fat cell moved")
    // fat-cell rows re-assigned by the nearest-sub-centroid rule
    val subCentroids = graft.delta.IndexStore.centroidsAt(spark, path)
      .where(col("cid").isin(newCids.toSeq: _*))
    val recomputed = SimilarityQueries.assignTo(
      index.where(col("cid").isin(newCids.toSeq: _*))
        .select("vec_id", "label", "embedding"), subCentroids)
      .select(col("vec_id"), col("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val divergingIn = recomputed.count { case (id, cid) =>
      stored(id) != cid }
    assert(divergingIn == 0,
      s"$divergingIn fat-cell rows not in their nearest sub-cell")
    // search over the split index holds recall
    val brute = SimilarityQueries.bruteTopK(spark, sf, probeId = 0, k = k)
      .collect().map(_.getLong(0)).toSet
    val got = SimilarityQueries.annIvfOver(spark, sf, path,
      probeId = 0, k = k, nprobe = 8)
      .collect().map(_.getLong(0)).toSet
    val recall = (brute intersect got).size.toDouble / k
    assert(recall >= 0.9, s"post-split recall@$k = $recall")
  }

  test("residual IVFADC: codes quantize x - centroid(x), stored packed, " +
    "search scores the exact decomposition, recall holds") {
    import graft.queries.SimilarityQueries
    import graft.queries.SimilarityQueries.{PqM, PqSubDim, PqK}
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{ArrayType, ByteType}
    val k = 20
    val brute = SimilarityQueries.bruteTopK(spark, sf, probeId = 0, k = k)
      .collect().map(_.getLong(0)).toSet
    val got = SparkEntry.queries("q_sim_ann_pq_residual")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val recall = (brute intersect got).size.toDouble / k
    assert(recall >= 0.9, s"residual IVFADC recall@$k = $recall")
    val (path, ivfPath) = SimilarityQueries.pqResidualIndexWithIvf(spark, sf)
    // born packed: one array<byte> codes column, original-vector norm
    val codes = graft.delta.IndexStore.data(spark, path)
    assert(codes.schema("codes").dataType.asInstanceOf[ArrayType]
      .elementType == ByteType)
    assert(!codes.schema.fieldNames.exists(_.matches("c\\d+")))
    // encode spot-check: recompute the residual quantization driver-side
    // for a handful of vectors — argmin of ||(x - centroid) - cw||^2 per
    // subspace, ties to the lower code — and compare to the STORED codes
    val cb = graft.delta.IndexStore.codebookAt(spark, path)
      .collect().map(r => ((r.getAs[Int]("m"), r.getAs[Int]("code")),
        r.getSeq[Double](r.fieldIndex("cv")))).toMap
    assert(cb.size == PqM * PqK)
    val ctr = graft.delta.IndexStore.centroidsAt(spark, ivfPath).collect()
      .map(r => r.getAs[Long]("cid") ->
        r.getSeq[Double](r.fieldIndex("cv"))).toMap
    val emb = graft.queries.T.load(spark, sf, "embeddings")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding"))).toMap
    val sample = codes.where(col("vec_id") % 97 === 0)
      .select(col("vec_id"), col("cid"), col("codes")).collect()
    assert(sample.nonEmpty)
    sample.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val cid = r.getAs[Long]("cid")
      val stored = r.getSeq[Byte](r.fieldIndex("codes"))
        .map(b => b & 0xFF)
      val resid = emb(id).zip(ctr(cid)).map { case (x, c) =>
        x.toDouble - c }
      val expect = (0 until PqM).map { m =>
        (0 until PqK).minBy { c =>
          val cw = cb((m, c))
          val d = (0 until PqSubDim).map { i =>
            val dd = resid(m * PqSubDim + i) - cw(i)
            dd * dd
          }.sum
          (d, c)
        }
      }
      assert(stored == expect, s"vec $id: stored $stored != $expect")
    }
  }

  test("full one-byte K=256 regime end-to-end over a PACKED index: " +
    "codes wrap the signed byte, recall@20 >= 0.9 through annPqSearch") {
    // the production-width, full-codebook regime: dim 512, M=64, K=256.
    // Codes 128..255 STORE as negative signed bytes (Spark has no
    // unsigned type); PqAdc's `& 0xFF` reads recover the full range —
    // this pins the whole loop (train -> packed encode -> production
    // search path) at the one-byte ceiling, which the per-column
    // fixture schema previously capped at K=128 (SCALE.md round-14
    // rehearsal note). Packed layout: the only production layout at
    // this M.
    import graft.queries.SimilarityQueries
    import graft.queries.SimilarityQueries.PqShape
    import org.apache.spark.sql.functions.{col, element_at, explode, lit, min}
    import spark.implicits._
    val shape = PqShape(dim = 512, m = 64, subDim = 8, k = 256)
    val nClusters = 32
    val n = 2000
    val k = 20
    val rng = new scala.util.Random(11)
    val centers = Array.fill(nClusters)(
      Array.fill(shape.dim)(rng.nextGaussian() * 10.0))
    val rows = (0 until n).map { i =>
      val r = new scala.util.Random(9000L + i)
      val v = Seq.tabulate(shape.dim)(d =>
        (centers(i % nClusters)(d) + r.nextGaussian() * 2.0).toFloat)
      (i.toLong, (i % nClusters).toLong, v)
    }
    val corpus = rows.toDF("vec_id", "label", "embedding")
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_pq256_${
      System.nanoTime()}"
    SimilarityQueries.pqTrainCodebooks(corpus, shape)
      .coalesce(1).write.parquet(s"$dir/codes_codebooks")
    assert(spark.read.parquet(s"$dir/codes_codebooks").count() ==
      shape.m * shape.k)
    SimilarityQueries.pqEncode(corpus,
      spark.read.parquet(s"$dir/codes_codebooks"),
      corpus.select(col("vec_id"), lit(0L).as("cid")), shape,
      packed = true)
      .write.partitionBy("cid").parquet(s"$dir/codes")
    // one trivial centroid: the coarse prune is not under test here
    Seq((0L, Seq.fill(shape.dim)(0.0)))
      .toDF("cid", "cv").coalesce(1).write.parquet(s"$dir/centroids")
    val codes = spark.read.parquet(s"$dir/codes")
    // the upper half of the byte range is genuinely exercised: some
    // stored code is negative (an unsigned value past 127)
    val minCode = codes.select(explode(col("codes")).as("c"))
      .agg(min(col("c"))).head.getByte(0)
    assert(minCode < 0,
      s"no code wrapped the signed byte (min stored byte $minCode) — " +
        "K=256 regime not actually exercised")
    // recall through the PRODUCTION search path (annPqSearch, packed)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val byId = rows.map(t => t._1 -> t._3.map(_.toDouble)).toMap
    val recalls = Seq(0L, 777L, 1503L).map { pid =>
      val probe = byId(pid)
      val trueTop = rows.filter(_._1 != pid)
        .map { case (id, _, v) => (id, cos(v.map(_.toDouble), probe)) }
        .sortBy(t => (-t._2, t._1)).take(k).map(_._1).toSet
      val got = SimilarityQueries.annPqSearch(spark, corpus,
        s"$dir/codes", s"$dir/centroids", probeId = pid, k = k,
        nprobe = 1, cand = 128, packedCodes = true, shape = shape)
        .collect().map(_.getLong(0)).toSet
      (trueTop intersect got).size.toDouble / k
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"K=256 packed recall@$k = $mean ($recalls)")
  }

  test("streaming PQ ingest encodes exactly like the batch index, bounded state") {
    import org.apache.spark.sql.functions._
    // ONE stream run supplies both halves: its sink rows for the
    // parity check and its progress for the bounded-state check
    val indexPath = SimilarityQueries.pqIndexPath(spark, sf)
    val feed = graft.streaming.VecsStream.feedDir(spark, sf)
    val sink = "target/stream_pq_sink_spec"
    val progress = SimilarityQueries.streamPqIngest(spark, feed,
      indexPath, SimilarityQueries.ivfIndexPath(spark, sf),
      sink, "stream_pq_spec")
    val cols = (df: org.apache.spark.sql.DataFrame) => {
      val codeCols = (0 until SimilarityQueries.PqM).map(m => col(s"c$m"))
      df.select((col("vec_id") +: col("cid").cast("long").as("cid") +:
        col("label") +: col("xnorm") +: codeCols): _*).orderBy("vec_id")
    }
    val streamed = cols(spark.read.parquet(sink)).collect()
    // parity: the streamed rows carry the FULL index shape and must
    // equal the batch build's rows for the same slice — same
    // centroids, same stored codebooks, same rules, same label/norm
    val batchRows = cols(graft.delta.IndexStore.data(spark, indexPath)
      .where(col("vec_id") % 10 === 7)).collect()
    assert(streamed.length == batchRows.length && streamed.nonEmpty)
    assert(streamed.sameElements(batchRows),
      s"stream/batch divergence, e.g. ${streamed.zip(batchRows)
        .find { case (a, b) => a != b }}")
    // bounded state: encode is per-row — no stateful operator may accrue
    val withData = progress.filter(_.numInputRows > 0)
    assert(withData.size >= 2, "expected at least two data micro-batches")
    assert(withData.forall(_.stateOperators.isEmpty),
      s"unexpected stateful operators: ${withData.flatMap(
        _.stateOperators.map(_.operatorName)).toSet}")
  }

  test("PQ knn join: code-scored candidates agree with the exact join") {
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    val exact = SimilarityQueries.knnJoin(spark, sf, k = 5, nprobe = 4)
      .collect().map(key).toSet
    val pq = SimilarityQueries.knnJoinPq(spark, sf, k = 5, nprobe = 4,
      cand = SimilarityQueries.PqJoinCand).collect()
    val pqSet = pq.map(key).toSet
    // both joins rank the SAME candidate pool (identical coarse cells);
    // only ADC-vs-exact candidate selection can differ
    val recall = (exact intersect pqSet).size.toDouble / exact.size
    assert(recall >= 0.8, s"PQ join recall vs exact = $recall")
    // shape: k rows per probe, no self matches, ranks 1..k
    val perProbe = pq.groupBy(_.getLong(0))
    assert(perProbe.values.forall(_.length == 5))
    assert(pq.forall(r => r.getLong(0) != r.getLong(1)))
    assert(perProbe.values.forall(
      _.map(_.getLong(4)).sorted.sameElements(1L to 5L)))
  }

  test("incremental PQ: batch encoded with STORED codebooks, appended in place, recall holds") {
    import org.apache.spark.sql.functions._
    val k = 20
    val (path, ivfPath) = SimilarityQueries.pqIncrementalIndexWithIvf(spark, sf)
    val emb = graft.queries.T.load(spark, sf, "embeddings")
    val codes = graft.delta.IndexStore.data(spark, path)
    // nothing lost, nothing duplicated by the append
    assert(codes.count() == emb.count())
    assert(codes.select("vec_id").distinct().count() == emb.count())
    // the batch slice is present and carries codes
    val batchRows = codes.where(col("vec_id") % 10 === 7)
    assert(batchRows.count() == emb.where(col("vec_id") % 10 === 7).count())
    // every stored code cites a codeword the STORED codebooks define —
    // the appended batch cannot have invented codes of its own
    val stored = graft.delta.IndexStore.codebookAt(spark, path)
      .select("m", "code").collect()
      .map(r => (r.getAs[Int]("m"), r.getAs[Int]("code"))).toSet
    val used = (0 until SimilarityQueries.PqM).flatMap { m =>
      codes.select(col(s"c$m").cast("int")).distinct()
        .collect().map(r => (m, r.getInt(0)))
    }.toSet
    assert(used.subsetOf(stored), s"unknown codes: ${used -- stored}")
    // recall of the base-trained codebooks over the full corpus
    val brute = SimilarityQueries.bruteTopK(spark, sf, probeId = 0, k = k)
      .collect().map(_.getLong(0)).toSet
    val ann = SimilarityQueries.annPqOver(spark, sf, path, ivfPath,
      probeId = 0, k = k, nprobe = 8, cand = SimilarityQueries.PqCand)
      .collect().map(_.getLong(0)).toSet
    val recall = (brute intersect ann).size.toDouble / k
    assert(recall >= 0.85, s"incremental PQ recall@$k = $recall")
  }

  test("incremental IVF: append lands in existing partitions, recall holds") {
    import org.apache.spark.sql.functions._
    val k = 20
    val path = SimilarityQueries.ivfIncrementalIndexPath(spark, sf)
    val emb = graft.queries.T.load(spark, sf, "embeddings")
    val index = graft.delta.IndexStore.data(spark, path)
    // nothing lost, nothing duplicated by the append
    assert(index.count() == emb.count())
    assert(index.select("vec_id").distinct().count() == emb.count())
    // every appended vector landed in a cid the stored centroids define
    val cids = graft.delta.IndexStore.centroidsAt(spark, path)
      .select("cid").collect().map(_.getLong(0)).toSet
    val usedCids = index.select(col("cid")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(usedCids.subsetOf(cids), s"unknown cids: ${usedCids -- cids}")
    // batch membership: the % 10 == 7 slice is present and assigned
    val batchRows = index.where(col("vec_id") % 10 === 7).count()
    assert(batchRows == emb.where(col("vec_id") % 10 === 7).count())
    assert(batchRows > 0)
    // recall of the drifted (base-trained) index stays useful
    val brute = SimilarityQueries.bruteTopK(spark, sf, probeId = 0, k = k)
      .collect().map(_.getLong(0)).toSet
    val ann = SimilarityQueries.annIvfOver(spark, sf, path, probeId = 0,
      k = k, nprobe = 8).collect().map(_.getLong(0)).toSet
    val recall = (brute intersect ann).size.toDouble / k
    assert(recall >= 0.9, s"incremental recall@$k = $recall")
  }

  test("streaming ANN ingest assigns exactly like the batch path") {
    import org.apache.spark.sql.functions._
    val streamed = SparkEntry.queries("q_stream_ann_ingest")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val indexPath = SimilarityQueries.ivfIndexPath(spark, sf)
    val cent = graft.delta.IndexStore.centroidsAt(spark, indexPath)
    val batch = SimilarityQueries.assignTo(
      graft.streaming.VecsStream.batchVecs(spark, sf)
        .withColumn("label", lit(0)), cent)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid"))
      .toMap
    assert(streamed.nonEmpty && streamed == batch,
      s"stream/batch assignment divergence: ${
        (streamed.toSet diff batch.toSet).take(3)} vs ${
        (batch.toSet diff streamed.toSet).take(3)}")
  }

  test("streaming ANN ingest holds bounded state: no stateful operator, " +
    "one sink append per micro-batch") {
    val indexPath = SimilarityQueries.ivfIndexPath(spark, sf)
    val feed = graft.streaming.VecsStream.feedDir(spark, sf)
    val sink = "target/stream_ann_sink_spec"
    val progress = SimilarityQueries.streamAnnIngest(
      spark, feed, indexPath, sink, "stream_ann_spec")
    val withData = progress.filter(_.numInputRows > 0)
    assert(withData.size >= 2, "expected at least two data micro-batches")
    // the plan must carry NO streaming state at all — assignment is
    // per-row, so nothing may accrue across triggers (the old
    // Complete-mode shape held and re-emitted every vector ever seen)
    assert(withData.forall(_.stateOperators.isEmpty),
      s"unexpected stateful operators: ${withData.flatMap(
        _.stateOperators.map(_.operatorName)).toSet}")
    // and the sink accrues by APPEND: total sink rows == streamed rows
    val emb = graft.queries.T.load(spark, sf, "embeddings")
    import org.apache.spark.sql.functions.col
    assert(spark.read.parquet(sink).count() ==
      emb.where(col("vec_id") % 10 === 7).count())
  }

  test("knn join: k rows per probe, no self-matches, agrees with single-probe ANN") {
    val k = 5
    val rows = SimilarityQueries.knnJoin(spark, sf, k = k, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val byProbe = rows.groupBy(_._1)
    assert(byProbe.nonEmpty)
    // every probe returns exactly k ranked neighbors, none itself
    byProbe.foreach { case (p, ns) =>
      assert(ns.length == k, s"probe $p returned ${ns.length}")
      assert(ns.map(_._3).sorted.toSeq == (1L to k), s"probe $p ranks")
      assert(!ns.exists(_._2 == p), s"probe $p matched itself")
    }
    // probe 0 is in the probe set (0 % 100 == 0): its top-k must agree
    // with the single-probe ANN at the same nprobe
    val single = SimilarityQueries.annIvf(spark, sf, probeId = 0, k = k,
      nprobe = 4).collect().map(_.getLong(0)).toSeq
    val joined = rows.filter(_._1 == 0L).sortBy(_._3).map(_._2).toSeq
    assert(joined == single)
  }

  test("two-level knn join: k ranked rows per probe, no self-matches, " +
    "agrees with the single-probe two-level ANN on a shared probe") {
    val k = 5
    val rows = SimilarityQueries.knnJoinTwoLevel(spark, sf, k = k,
      nprobe = 4, superProbes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val byProbe = rows.groupBy(_._1)
    assert(byProbe.nonEmpty)
    byProbe.foreach { case (p, ns) =>
      assert(ns.length == k, s"probe $p returned ${ns.length}")
      assert(ns.map(_._3).sorted.toSeq == (1L to k), s"probe $p ranks")
      assert(!ns.exists(_._2 == p), s"probe $p matched itself")
    }
    // the join's per-probe route must equal the single-probe route —
    // same supers, same children, same rerank rule
    val single = SimilarityQueries.annIvfTwoLevel(spark, sf, probeId = 0,
      k = k, nprobe = 4, superProbes = 4)
      .collect().map(_.getLong(0)).toSeq
    val joined = rows.filter(_._1 == 0L).sortBy(_._3).map(_._2).toSeq
    assert(joined == single,
      s"join route diverged from single-probe route: $joined vs $single")
  }

  test("filtered ANN: every hit satisfies the predicate, recall vs filtered brute force") {
    import org.apache.spark.sql.functions._
    val k = 10
    val hits = SimilarityQueries.annIvfFiltered(spark, sf, probeId = 0,
      k = k, nprobe = 8, predicate = col("label") % 3 === 1)
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue()))
    assert(hits.length == k)
    assert(hits.forall(_._2 % 3 == 1), "predicate leaked")
    // filtered brute force as truth; generous probing (8 of ~10
    // clusters) keeps recall high despite the selective predicate
    val emb = graft.queries.T.load(spark, sf, "embeddings")
    val probe = emb.where(col("vec_id") === 0)
      .select(col("embedding").as("pv"))
    def dotC(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.VectorExpressions.vectorDot(a, b)
    val brute = emb.where(col("vec_id") =!= 0 && col("label") % 3 === 1)
      .crossJoin(broadcast(probe))
      .withColumn("cosine", dotC(col("embedding"), col("pv")) /
        (sqrt(dotC(col("embedding"), col("embedding"))) *
          sqrt(dotC(col("pv"), col("pv")))))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k).collect().map(_.getLong(0)).toSet
    val recall = (brute intersect hits.map(_._1).toSet).size.toDouble / k
    assert(recall >= 0.8, s"filtered recall@$k = $recall")
    // the PQ variant of the same filtered search: predicate evaluates
    // on the codes relation (no vector read), exact rerank after
    val (path, ivfPath) = SimilarityQueries.pqIndexWithIvf(spark, sf)
    val pqHits = SimilarityQueries.annPqOver(spark, sf, path, ivfPath,
      probeId = 0, k = k, nprobe = 8, cand = SimilarityQueries.PqCand,
      predicate = col("label") % 3 === 1)
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue()))
    assert(pqHits.length == k)
    assert(pqHits.forall(_._2 % 3 == 1), "PQ predicate leaked")
    val pqRecall =
      (brute intersect pqHits.map(_._1).toSet).size.toDouble / k
    assert(pqRecall >= 0.8, s"filtered PQ recall@$k = $pqRecall")
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

  test("semdedup marks a real subset and keep-rule is lowest-id") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_semdedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    val n = out.length
    val dups = out.count(_._3)
    assert(dups > 0 && dups < n, s"degenerate dedup: $dups of $n marked")
    // the lowest vec_id of every cluster can never be marked: no lower
    // id exists in its cluster to dominate it
    val clusterMin = out.groupBy(_._2).map { case (_, vs) =>
      vs.minBy(_._1) }
    assert(clusterMin.forall(!_._3),
      "a cluster's lowest vec_id was marked as a duplicate")
    // every marked dup must have a qualifying LOWER-id neighbor in its
    // own cluster (spot-check the dup set against a direct recompute)
    val index = graft.delta.IndexStore.data(spark,
      SimilarityQueries.ivfIndexPath(spark, sf))
    val a = index.select(col("cid"), col("vec_id").as("va"),
      col("embedding").as("ea"))
    val b = index.select(col("cid"), col("vec_id").as("vb"),
      col("embedding").as("eb"))
    val dotc = graft.functions.VectorExpressions
      .vectorDot(col("ea"), col("eb"))
    val na = sqrt(graft.functions.VectorExpressions
      .vectorDot(col("ea"), col("ea")))
    val nb = sqrt(graft.functions.VectorExpressions
      .vectorDot(col("eb"), col("eb")))
    val recomputed = a.join(b, "cid").where(col("va") < col("vb"))
      .where(dotc / (na * nb) >= SimilarityQueries.SemTau)
      .select(col("vb")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(out.filter(_._3).map(_._1).toSet == recomputed,
      "dup set diverges from direct within-cluster recompute")
  }
}
