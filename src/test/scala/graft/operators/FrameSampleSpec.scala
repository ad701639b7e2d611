package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FrameSampleSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("sampleFrames: frame boundaries, stride, and the short tail") {
    // 25 chars at frameChars=10 -> frames 0..2 (last is 5 chars);
    // stride 2 keeps frames 0 and 2
    val text = "abcdefghijklmnopqrstuvwxy"
    val rows = Multimodal.sampleFrames(docs(1L -> text), col("doc_id"),
        col("text"), frameChars = 10, stride = 2)
      .orderBy("frame_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq === Seq(0, 2))
    assert(rows.map(_.getInt(2)).toSeq === Seq(3, 3))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rows(0).getString(3) === h("abcdefghij"))
    assert(rows(1).getString(3) === h("uvwxy")) // remainder frame hashed as is
  }

  test("sampleFrames: doc shorter than one frame emits a single frame") {
    val rows = Multimodal.sampleFrames(docs(1L -> "abc"), col("doc_id"),
      col("text"), frameChars = 10, stride = 3).collect()
    assert(rows.length === 1 && rows(0).getInt(1) === 0 && rows(0).getInt(2) === 1)
  }

  test("semDedup: lower-id in-cluster near-dup marks the higher id") {
    import spark.implicits._
    // two identical vectors (cos = 1) + one orthogonal; labels give two
    // clusters, the identical pair lands together
    val e = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Dedup.semDedup(e, col("vec_id"), col("embedding"),
        col("label"), thr = 0.9, maxBucket = 10)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> true))
  }
}
