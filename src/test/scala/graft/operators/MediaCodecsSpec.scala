package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** A REAL codec through the multimodal decode seam: WavPcmDecoder
  * parses actual RIFF/WAVE bytes (built here sample-by-sample), and
  * decodeMeta carries them through the same mapPartitions batch loop
  * the stub uses — proving the seam's schema/batching/pruning plumbing
  * decodes real media, while q34/q81/q104/q207 stay on the
  * oracle-replayable stub.
  */
class MediaCodecsSpec extends SparkSpec {

  /** Canonical 44-byte-header PCM WAV: rate Hz, ch channels, 16-bit,
    * nFrames frames of silence (+ optional trailing junk chunk).
    */
  private def wav(rate: Int, ch: Int, nFrames: Int,
                  trailingChunk: Boolean = false): Array[Byte] = {
    val blockAlign = ch * 2
    val dataBytes = nFrames * blockAlign
    val extra = if (trailingChunk) 8 + 4 else 0
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes + extra)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes + extra)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(ch.toShort).putInt(rate).putInt(rate * blockAlign)
      .putShort(blockAlign.toShort).putShort(16.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
      .put(new Array[Byte](dataBytes))
    if (trailingChunk) // an unknown chunk the walker must skip
      bb.put("LIST".getBytes("US-ASCII")).putInt(4)
        .put("INFO".getBytes("US-ASCII"))
    bb.array()
  }

  test("WavPcmDecoder: exact rate/channels/frame-count from real header bytes") {
    assert(WavPcmDecoder.decode(wav(8000, 2, 32)) === ((8000, 2, 32L)))
    assert(WavPcmDecoder.decode(wav(44100, 1, 7)) === ((44100, 1, 7L)))
    // unknown trailing chunk is skipped, not misparsed
    assert(WavPcmDecoder.decode(wav(16000, 2, 5, trailingChunk = true))
      === ((16000, 2, 5L)))
  }

  test("WavPcmDecoder: malformed payloads refuse loudly") {
    val short = intercept[IllegalArgumentException] {
      WavPcmDecoder.decode("tiny".getBytes("UTF-8"))
    }
    assert(short.getMessage.contains("too short"))
    val notRiff = intercept[IllegalArgumentException] {
      WavPcmDecoder.decode(new Array[Byte](64))
    }
    assert(notRiff.getMessage.contains("not a RIFF/WAVE"))
    // a compressed (non-PCM) format code must refuse, not fake dims
    val w = wav(8000, 1, 4)
    w(20) = 3 // fmt.audioFormat = 3 (IEEE float)
    val nonPcm = intercept[IllegalArgumentException] {
      WavPcmDecoder.decode(w)
    }
    assert(nonPcm.getMessage.contains("not PCM"))
    // an unknown chunk BEFORE fmt whose unsigned-32 size is 0xFFFFFFF8
    // (advance of exactly 0 under the old `sz.toInt` arithmetic) must
    // throw, not spin the walker forever — the executor-task-stall
    // regression the round-13 ADVICE flagged
    val loop = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(36)
      .put("WAVE".getBytes("US-ASCII"))
      .put("JUNK".getBytes("US-ASCII")).putInt(0xFFFFFFF8)
      .put(new Array[Byte](24))
      .array()
    val corrupt = intercept[IllegalArgumentException] {
      WavPcmDecoder.decode(loop)
    }
    assert(corrupt.getMessage.contains("larger than the whole"))
  }

  test("decodeMeta carries real WAV bytes through the batch seam") {
    import spark.implicits._
    val rows = Seq(
      (1L, wav(8000, 1, 100)),
      (2L, wav(44100, 2, 441)),
      (3L, wav(16000, 2, 50, trailingChunk = true)))
    val media = rows.toDF("doc_id", "payload").repartition(2)
    val got = Multimodal.decodeMeta(spark, media, WavPcmDecoder)
      .collect().map(m => m.doc_id -> ((m.width, m.height, m.n_frames)))
      .toMap
    assert(got === Map(1L -> ((8000, 1, 100L)), 2L -> ((44100, 2, 441L)),
      3L -> ((16000, 2, 50L))))
    // byte-level provenance still rides along (n_bytes, checksum)
    val m1 = Multimodal.decodeMeta(spark, media, WavPcmDecoder)
      .filter(_.doc_id == 1L).head()
    assert(m1.n_bytes === rows.head._2.length.toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(m1.checksum ===
      md.digest(rows.head._2).map("%02x".format(_)).mkString)
  }

  test("default seam is the stub: q34-family results bit-unchanged") {
    import spark.implicits._
    val media = Seq((1L, "hello world payload".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val viaDefault = Multimodal.decodeMeta(spark, media).collect().head
    val viaStub = Multimodal.decodeMeta(spark, media, StubMediaDecoder)
      .collect().head
    assert(viaDefault === viaStub)
    val (w, h, f) = Multimodal.decodeStub("hello world payload".getBytes("UTF-8"))
    assert((viaDefault.width, viaDefault.height, viaDefault.n_frames) === ((w, h, f)))
  }
}
