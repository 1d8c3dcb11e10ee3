package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Multimodal pipeline queries: binary payload columns + per-partition
  * decode/feature-extract (stubbed codec, real plumbing — see
  * graft.ops.Multimodal). The deterministic parts (byte length, md5
  * fingerprint, first-byte-derived dimensions) are oracle-checked
  * against DuckDB over the source text.
  */
object MultimodalQueries {

  val all: Seq[Q] = Seq(

    Q("q_multimodal_features",
      """SELECT doc_id AS media_id,
        | octet_length(CAST(text AS BLOB)) AS n_bytes,
        | md5(text) AS fingerprint,
        | CAST(64 + ascii(substr(text, 1, 1)) AS INTEGER) AS width,
        | CAST(64 + ascii(substr(text, 2, 1)) AS INTEGER) AS height
        |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      Multimodal.extractFeatures(Multimodal.mediaTable(s, dir))
        .select("media_id", "n_bytes", "fingerprint", "width", "height")
        .orderBy("media_id")
    },

    Q.noOracle("q_multimodal_frames") { (s, dir) =>
      Multimodal.sampleFrames(Multimodal.mediaTable(s, dir))
        .orderBy("media_id", "frame_idx")
    })
}
