package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.delta.IndexStore
import graft.operators.IvfMaintenance

/** Index auto-compaction rehearsal (dev probe, results cited in
  * SCALE.md).
  *
  * The fixture queries exercise maybeCompactData at a handful of
  * files; a production streamed index fragments for real — one file
  * per touched cell per micro-batch, hundreds of commits — and the
  * claim that matters at that scale is threefold:
  *
  *  1. the steady-state pass is FREE (metadata-only qualification —
  *     one aggregation over the log's file inventory, no commit);
  *  2. the heal is one bounded OPTIMIZE whose cost tracks the data
  *     rewritten, not the commit history that fragmented it;
  *  3. fragmentation is WORTH healing: the probe-side read pays the
  *     per-file open/seek cost, so search latency degrades with file
  *     count and recovers after compaction.
  *
  * This probe builds a synthetic index (nlist cells, dim-64 float
  * vectors), fragments it with `appends` micro-batch-sized append
  * commits spread over every cell, and MEASURES: file counts from the
  * log, a pruned nprobe=8 top-20 cosine probe (median of 3) on the
  * fragmented layout, the compaction wall, the same probe after, and
  * the steady-state qualification wall. Assignment uses a synthetic
  * id-hash cid — the file-layout physics under test does not care how
  * rows were routed.
  *
  * Run: sbt "runMain graft.tools.CompactionRehearsal [nlist] [appends]".
  */
object CompactionRehearsal {
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

    val nlist = args.headOption.map(_.toInt).getOrElse(200)
    val appends = args.drop(1).headOption.map(_.toInt).getOrElse(30)
    val dim = 64
    val baseRows = nlist * 200L
    val batchRows = 2000L

    val path = "target/compaction_rehearsal/index"
    val dir = new java.io.File(path)
    if (dir.getParentFile.exists())
      scala.reflect.io.Directory(dir.getParentFile).deleteRecursively()

    def vecs(ids: org.apache.spark.sql.DataFrame) = ids
      .withColumn("embedding",
        expr(s"transform(sequence(1, $dim), " +
          "d -> cast(sin(vec_id * d) as float))"))
      .withColumn("cid", pmod(col("vec_id"), lit(nlist.toLong)))
      .withColumn("label", lit(0L))
      .select("vec_id", "label", "embedding", "cid")

    val base = vecs(spark.range(baseRows).select(col("id").as("vec_id")))
    val centroids = spark.range(nlist.toLong)
      .select(col("id").as("cid"))
      .withColumn("cv",
        expr(s"transform(sequence(1, $dim), " +
          "d -> cast(sin(cid * d) as double))"))
    IndexStore.create(spark, path, Seq(
      IndexStore.DataRel -> base,
      IndexStore.CentroidRel -> centroids,
      IndexStore.CountRel -> base.groupBy("cid").count()
        .select(lit("base").as("kind"), col("cid"),
          col("count").as("rows"))))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // the fragmenting firehose: each append commit scatters one
    // micro-batch over every cell -> one small file per cell per commit
    val (_, fragWall) = time {
      for (b <- 0 until appends) {
        val batch = vecs(spark
          .range(baseRows + b * batchRows, baseRows + (b + 1) * batchRows)
          .select(col("id").as("vec_id")))
          .localCheckpoint()
        IvfMaintenance.appendBatch(spark, path, batch,
          batch.groupBy("cid").count().withColumnRenamed("count", "rows"))
      }
    }

    def fileStats(): (Long, Double) = {
      val r = graft.delta.DeltaTable.forPath(spark, path).allFiles
        .where(element_at(col("partitionValues"), IndexStore.RelCol)
          === IndexStore.DataRel)
        .agg(count(lit(1)), avg(col("size"))).head
      (r.getLong(0), r.getDouble(1))
    }

    val probeVec = base.where(col("vec_id") === 0)
      .select(col("embedding").as("pv"))
    def probe(): Double = {
      val runs = (1 to 3).map { _ =>
        val (_, w) = time {
          IndexStore.data(spark, path, Some((0L until 8L).toSeq))
            .crossJoin(broadcast(probeVec))
            .select(col("vec_id"),
              graft.functions.VectorExpressions
                .vectorDot(col("embedding"), col("pv")).as("dot"))
            .orderBy(desc("dot"), col("vec_id")).limit(20)
            .collect()
        }
        w
      }
      runs.sorted.apply(1) // median of 3
    }

    val (filesBefore, avgBefore) = fileStats()
    val probeFrag = probe()
    val policy = IvfMaintenance.CompactPolicy(maxFiles = 4)
    val (compacted, healWall) = time {
      IvfMaintenance.maybeCompactData(spark, path, policy)
    }
    val (filesAfter, avgAfter) = fileStats()
    val probeCompact = probe()
    val (steady, steadyWall) = time {
      IvfMaintenance.maybeCompactData(spark, path, policy)
    }
    require(steady.isEmpty, "steady state re-qualified?")

    val total = baseRows + appends * batchRows
    println(f"[rehearsal] nlist=$nlist appends=$appends rows=$total " +
      f"(frag build $fragWall%.1f s)")
    println(f"[rehearsal] files before: $filesBefore (avg " +
      f"${avgBefore / 1024}%.1f KB) -> after: $filesAfter (avg " +
      f"${avgAfter / 1024}%.1f KB); cells compacted: ${compacted.size}")
    println(f"[rehearsal] probe (nprobe=8 top-20, median of 3): " +
      f"fragmented $probeFrag%.2f s -> compacted $probeCompact%.2f s")
    println(f"[rehearsal] heal wall: $healWall%.1f s; steady-state " +
      f"qualification: $steadyWall%.2f s (no commit)")
    spark.stop()
  }
}
