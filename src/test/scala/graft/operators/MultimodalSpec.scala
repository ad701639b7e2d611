package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The mapPartitions decode seam must agree with the expression-only
  * metadata path (q34) on everything both can compute — this is the
  * contract that lets production swap `decodeStub` for a real codec
  * without touching the Spark plumbing (schema, batching, pruning).
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.withPayload(
    graft.util.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text"), "text")

  test("decodeMeta (mapPartitions seam) == the expression path, row for row") {
    val seam = Multimodal.decodeMeta(spark, media).toDF()
      .orderBy("doc_id").collect()
    val expr = media.select(
      col("doc_id"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("checksum"),
      ((ascii(substring(col("text"), 1, 1)) % 64 + 1) * 16).as("width"),
      ((ascii(substring(col("text"), 2, 1)) % 48 + 1) * 16).as("height"),
      (floor(octet_length(col("payload")) / 1000) + 1).cast("long").as("n_frames")
    ).orderBy("doc_id").collect()
    assert(seam.length === expr.length)
    seam.zip(expr).foreach { case (s, e) =>
      assert(s.getLong(0) === e.getLong(0))       // doc_id
      assert(s.getLong(1) === e.getLong(1))       // n_bytes
      assert(s.getString(2) === e.getString(2))   // md5 checksum
      assert(s.getInt(3) === e.getInt(3))         // width
      assert(s.getInt(4) === e.getInt(4))         // height
      assert(s.getLong(5) === e.getLong(5))       // n_frames
    }
  }

  test("decodeMeta output prunes the payload column (metadata only)") {
    val out = Multimodal.decodeMeta(spark, media).toDF()
    assert(!out.columns.contains("payload"))
    assert(out.columns.toSeq === Seq("doc_id", "n_bytes", "checksum",
      "width", "height", "n_frames"))
  }

  test("resizeStub clamps to the target box and reports pixel count") {
    import spark.implicits._
    val r = Seq((800, 600), (100, 50)).toDF("w", "h")
      .select(Multimodal.resizeStub(col("w"), col("h"), 640, 480).as("r"))
      .select("r.out_w", "r.out_h", "r.out_pixels").collect()
    assert((r(0).getInt(0), r(0).getInt(1), r(0).getInt(2)) === ((640, 480, 640 * 480)))
    assert((r(1).getInt(0), r(1).getInt(1), r(1).getInt(2)) === ((100, 50, 5000)))
  }

  test("featureStub: deterministic unit-free vectors in [-1, 1]") {
    val f = media.select(Multimodal.featureStub(col("payload"), 8).as("f"))
      .select(explode(col("f"))).collect().map(_.getDouble(0))
    assert(f.forall(x => x >= -1.0 && x <= 1.0))
    val again = media.select(Multimodal.featureStub(col("payload"), 8).as("f"))
      .select(explode(col("f"))).collect().map(_.getDouble(0))
    assert(f.toSeq === again.toSeq)
  }

  test("perceptualHash: dHash bit arithmetic against a Scala reference") {
    import spark.implicits._
    val rows = Seq("abcabcabc" * 8, "zyxzyxzyx" * 8, "aaaa" * 20)
    val got = rows.toDF("s")
      .select(Multimodal.perceptualHash(col("s")).as("ph"))
      .collect().map(_.getLong(0)).toSeq
    val want = rows.map { s =>
      (0 until 60).map { i =>
        if (s.charAt(i) > s.charAt(i + 1)) 1L << i else 0L
      }.sum
    }
    assert(got === want)
    // a monotone scanline has no descending neighbor: fingerprint 0
    assert(got(2) === 0L)
  }

  test("perceptualHash survives the binary payload round-trip unchanged") {
    val viaPayload = media.filter(length(col("text")) >= 61)
      .select(col("doc_id"),
        Multimodal.perceptualHash(col("payload").cast("string")).as("ph"))
      .orderBy("doc_id").collect()
    val viaText = media.filter(length(col("text")) >= 61)
      .select(col("doc_id"), Multimodal.perceptualHash(col("text")).as("ph"))
      .orderBy("doc_id").collect()
    assert(viaPayload.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      viaText.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // 60-bit contract: fits the 4x15-bit chunk machinery
    assert(viaPayload.forall(r => r.getLong(1) >= 0 && r.getLong(1) < (1L << 60)))
  }

  test("sampledFrameCount: every stride-th frame, at least one") {
    import spark.implicits._
    val got = Seq(1L, 9L, 10L, 11L, 95L).toDF("f")
      .select(Multimodal.sampledFrameCount(col("f"), 10).cast("long"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 1L, 1L, 2L, 10L))
  }

  test("energySegments: silence splits runs; partial tail frame scores its own energy") {
    import spark.implicits._
    // frames of 4: "abcd"(4) "    "(0) "efgh"(4) "ij"(2 — partial tail)
    val d = Seq((1L, "abcd    efghij")).toDF("doc_id", "payload")
    val got = Multimodal.energySegments(d, col("doc_id"), col("payload"),
        frameChars = 4, minEnergy = 2)
      .orderBy("seg_idx").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4),
        r.getLong(5))).toSeq
    // minEnergy 2: frame 1 (all blanks) is silence -> two segments;
    // the tail frame "ij" (energy 2) extends the second run
    assert(got === Seq((1L, 0, 0, 1L, 4L), (2L, 2, 3, 2L, 6L)))
  }

  test("energySegments: an all-silence payload yields no segments") {
    import spark.implicits._
    val d = Seq((1L, "        ")).toDF("doc_id", "payload")
    assert(Multimodal.energySegments(d, col("doc_id"), col("payload"),
      frameChars = 4, minEnergy = 1).collect().isEmpty)
  }
}
