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

    // Frame sampling through the stub codec (every-32nd payload byte,
    // max 8). The fixture text is pure ASCII, so DuckDB can replay the
    // byte arithmetic exactly over the source text — a full content
    // oracle for the mapPartitions/flatMap plumbing, not a rows-only
    // smoke.
    Q("q_multimodal_frames",
      """SELECT doc_id AS media_id,
        | (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
        | CAST(i AS INTEGER) AS frame_idx,
        | CAST(ascii(substr(text, CAST(i * 32 + 1 AS INTEGER), 1)) AS BIGINT)
        |   AS sample
        |FROM documents, range(8) t(i)
        |WHERE i * 32 < octet_length(CAST(text AS BLOB))
        |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      Multimodal.sampleFrames(Multimodal.mediaTable(s, dir))
        .orderBy("media_id", "frame_idx")
    })
}
