package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.util.Tables

/** Multimodal-column pack: binary payloads with typed metadata. The
  * decode itself is a deterministic stub (see operators.Multimodal);
  * everything the oracle checks (byte counts, checksums, derived fake
  * dims, frame sampling arithmetic) is real Spark plumbing.
  */
object MultimodalQueries {

  val qs: Seq[Q] = Seq(
    Q("q34_multimodal_meta",
      (s, d) => {
        val media = Multimodal.withPayload(
          Tables(s, d, "documents").select("doc_id", "text", "n_chars"), "text")
        media.select(
          col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("checksum"),
          ((ascii(substring(col("text"), 1, 1)) % 64 + 1) * 16).as("fake_width"),
          ((ascii(substring(col("text"), 2, 1)) % 48 + 1) * 16).as("fake_height"),
          (floor(col("n_chars") / 1000) + 1).cast("long").as("n_frames"),
          Multimodal.sampledFrameCount(floor(col("n_chars") / 1000) + 1, 10)
            .cast("long").as("n_sampled_frames")
        ).orderBy("doc_id")
      },
      Some("""SELECT doc_id,
        |  CAST(octet_length(text::BLOB) AS INTEGER) AS n_bytes,
        |  md5(text) AS checksum,
        |  CAST((ascii(substring(text, 1, 1)) % 64 + 1) * 16 AS INTEGER) AS fake_width,
        |  CAST((ascii(substring(text, 2, 1)) % 48 + 1) * 16 AS INTEGER) AS fake_height,
        |  CAST(floor(n_chars / 1000) + 1 AS BIGINT) AS n_frames,
        |  CAST(floor((floor(n_chars / 1000) + 1 - 1) / 10) + 1 AS BIGINT) AS n_sampled_frames
        |FROM documents ORDER BY doc_id""".stripMargin),
      "binary payload + typed metadata + frame-sampling arithmetic")
  )
}
