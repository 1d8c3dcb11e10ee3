package graft.queries

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Multimodal pipeline queries over REAL codecs (pure-JVM PNG / WAV /
  * framed-PNG video — graft.ops.Multimodal).
  *
  * Oracle design: payloads are generated from closed-form formulas of
  * the media id, and the fixture build writes a SIDECAR parquet holding
  * the expected dimensions / frame sums computed from those formulas
  * WITHOUT decoding (plus byte length and md5 recorded at encode time).
  * The queries decode the actual payload bytes on the executors; DuckDB
  * reads the sidecar. Equality proves the encode→decode roundtrip on
  * every row — a full content oracle for a codec DuckDB cannot run.
  */
object MultimodalQueries {

  /** Stable alias the oracle SQL reads through (re-pointed at the
    * current sf's fixture when the query runs — same pattern as the
    * delta fixture aliases). */
  final val MediaOracleAlias =
    "/root/repo/target/multimodal_fixtures/media_current"

  private def fixtureDir(sfDir: String): String =
    s"/root/repo/target/multimodal_fixtures/${new File(sfDir).getName}/media"

  /** Downsample factor for q_multimodal_resize (nearest-neighbor
    * stride; audio = sample decimation at the same stride). */
  final val ResizeFactor = 2

  /** Build-once media fixture: media.parquet (id, kind, REAL encoded
    * payload bytes), sidecar.parquet (expected features), and
    * sidecar_frames.parquet (expected per-frame sums). Media ids come
    * from the documents table — fixture contents derive from the
    * testdata drop and restamp with it. */
  def mediaFixture(spark: SparkSession, sfDir: String): String = {
    val path = fixtureDir(sfDir)
    this.synchronized {
      if (!new File(path, "media.parquet").exists() ||
          !new File(path, "sidecar_resized.parquet").exists() ||
          DeltaQueries.stale(path, sfDir)) {
        val dir = new File(path)
        if (dir.exists()) scala.reflect.io.Directory(dir).deleteRecursively()
        import spark.implicits._
        val ids = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id").cast("long")).as[Long]
          // the encode pass is row-expensive over byte-tiny input —
          // same spread rationale as decodeSpread below
          .repartition(spark.sparkContext.defaultParallelism)
        // one encode pass, on the executors
        ids.mapPartitions(_.map(Multimodal.encode))
          .write.parquet(s"$path/media.parquet")
        // sidecar: dims/sums from the closed-form formulas (NO decode);
        // n_bytes/fingerprint are byte-level facts of the written
        // payload (md5 over the re-read bytes — parquet binary
        // roundtrip included in the contract)
        spark.read.parquet(s"$path/media.parquet")
          .select(col("media_id"), col("kind"),
            length(col("payload")).cast("long").as("n_bytes"),
            md5(col("payload")).as("fingerprint"))
          .as[(Long, String, Long, String)]
          .map { case (id, kind, nb, fp) =>
            val e = Multimodal.expected(id)
            (id, kind, nb, fp, e.width, e.height,
              e.frameSums.length, e.frameSums.sum)
          }
          .toDF("media_id", "kind", "n_bytes", "fingerprint",
            "width", "height", "n_frames", "value_sum")
          .write.parquet(s"$path/sidecar.parquet")
        ids.flatMap { id =>
          Multimodal.expected(id).frameSums.zipWithIndex.map {
            case (s, i) => (id, Multimodal.kindOf(id), i, s)
          }
        }.toDF("media_id", "kind", "frame_idx", "frame_sum")
          .write.parquet(s"$path/sidecar_frames.parquet")
        // resized sidecar: the generation formulas restated at the
        // nearest-neighbor stride — still NO codec involved
        ids.map { id =>
          val e = Multimodal.expectedResized(id, ResizeFactor)
          (id, Multimodal.kindOf(id), e.width, e.height,
            e.frameSums.length, e.frameSums.sum)
        }.toDF("media_id", "kind", "width", "height",
            "n_frames", "value_sum")
          .write.parquet(s"$path/sidecar_resized.parquet")
        DeltaQueries.writeStamp(path, sfDir)
      }
    }
    path
  }

  /** The media table is tiny in BYTES but expensive per ROW (codec
    * work): Spark's byte-based parquet splits would hand the WHOLE
    * decode to one task (a 10 MB file is one split), so spread rows
    * across the cluster first — decode parallelism must track row
    * count, not file size. Measured at 10× scale: 11.4 s single-split
    * → per-core once spread (the shuffle moves only the tiny payload
    * bytes). */
  private def decodeSpread(s: SparkSession, fixturePath: String) = {
    import s.implicits._
    s.read.parquet(s"$fixturePath/media.parquet")
      .repartition(s.sparkContext.defaultParallelism)
      .as[Multimodal.MediaRow]
  }

  val all: Seq[Q] = Seq(

    // Feature extraction with a REAL decode in the task path: PNG and
    // WAV payloads (and framed-PNG video) are decoded per partition;
    // width/height/n_frames/value_sum come out of the codec, the
    // oracle's sidecar states them from the generation formulas.
    Q("q_multimodal_features",
      s"""SELECT media_id, kind, n_bytes, fingerprint,
         | width, height, n_frames, value_sum
         |FROM read_parquet('$MediaOracleAlias/sidecar.parquet/*.parquet')
         |ORDER BY media_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val p = mediaFixture(s, dir)
      DeltaQueries.refreshAlias(MediaOracleAlias, p)
      Multimodal.extractFeatures(decodeSpread(s, p))
        .toDF()
        .select("media_id", "kind", "n_bytes", "fingerprint",
          "width", "height", "n_frames", "value_sum")
        .orderBy("media_id")
    },

    // Frame sampling: video payloads demux into per-frame PNG decodes
    // (image = 1 frame, audio = 1 "frame" of sample sum) — one output
    // row per decoded frame, content-checked against the formula
    // sidecar.
    Q("q_multimodal_frames",
      s"""SELECT media_id, kind, CAST(frame_idx AS INTEGER) AS frame_idx,
         | frame_sum
         |FROM read_parquet('$MediaOracleAlias/sidecar_frames.parquet/*.parquet')
         |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      import s.implicits._
      val p = mediaFixture(s, dir)
      DeltaQueries.refreshAlias(MediaOracleAlias, p)
      Multimodal.sampleFrames(decodeSpread(s, p))
        .orderBy("media_id", "frame_idx")
    },

    // Resize: decode → nearest-neighbor downsample (audio: sample
    // decimation) → RE-ENCODE with the same codec → decode AGAIN. The
    // output features come from decoding the resized payload, so the
    // oracle (formula sums restated at the resize stride) proves the
    // full decode→transform→encode→decode roundtrip on every row —
    // the image/audio preprocessing stage of a training pipeline.
    Q("q_multimodal_resize",
      s"""SELECT media_id, kind, width, height, n_frames, value_sum
         |FROM read_parquet('$MediaOracleAlias/sidecar_resized.parquet/*.parquet')
         |ORDER BY media_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val p = mediaFixture(s, dir)
      DeltaQueries.refreshAlias(MediaOracleAlias, p)
      Multimodal.resizeFeatures(decodeSpread(s, p), ResizeFactor)
        .toDF()
        .select("media_id", "kind", "width", "height",
          "n_frames", "value_sum")
        .orderBy("media_id")
    })
}
