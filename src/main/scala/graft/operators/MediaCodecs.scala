package graft.operators

/** The decoder seam behind [[Multimodal.decodeMeta]]: one codec call
  * per payload, executed inside the per-partition batch loop (the
  * mapInPandas-shaped seam — `Multimodal.scala`'s mapPartitions).
  *
  * Two implementations ship:
  *  - [[StubMediaDecoder]] — the deterministic fake the oracle replays
  *    (this container has no image/audio codec libraries; the stub
  *    keeps every multimodal query cross-engine verifiable);
  *  - [[WavPcmDecoder]] — a REAL dependency-free codec (RIFF/WAVE PCM
  *    header parser), proving the seam carries real media bytes: a
  *    production deployment swaps in its codec behind the same
  *    single-method interface and the Spark plumbing (schema, batch
  *    iteration, payload pruning) is untouched.
  *
  * The triple is the [[Multimodal.MediaMeta]] dims contract
  * (width, height, n_frames); each decoder documents its mapping.
  */
trait MediaDecoder extends Serializable {
  /** Decode one payload to (width, height, n_frames). MUST throw
    * `IllegalArgumentException` on malformed payloads — a corrupt
    * media file fails loudly per-record, never silently fabricates
    * dimensions (callers quarantine via try/filter when a corpus is
    * known dirty).
    */
  def decode(payload: Array[Byte]): (Int, Int, Long)
}

/** The oracle-replayable default: deterministic fake dims from the
  * first payload bytes (delegates to [[Multimodal.decodeStub]] so the
  * historical queries q34/q81/q104/q207 are bit-for-bit unchanged).
  */
object StubMediaDecoder extends MediaDecoder {
  override def decode(payload: Array[Byte]): (Int, Int, Long) =
    Multimodal.decodeStub(payload)
}

/** RIFF/WAVE PCM header decoder — a real codec with zero dependencies
  * (format reference: the public RIFF/WAVE spec; little-endian chunk
  * stream `RIFF<size>WAVE` then `fmt ` / `data` chunks).
  *
  * Dims mapping for audio: width = sample rate (Hz), height = channel
  * count, n_frames = PCM frame count (data bytes / block align) — the
  * numbers an audio curation pipeline filters on (duration = n_frames
  * / width). Non-PCM (compressed) WAV refuses loudly: this decoder's
  * contract is PCM, anything else needs a real codec library.
  */
object WavPcmDecoder extends MediaDecoder {

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  override def decode(payload: Array[Byte]): (Int, Int, Long) = {
    require(payload.length >= 44,
      s"WavPcmDecoder: payload too short for a WAV header (${payload.length} bytes)")
    require(fourcc(payload, 0) == "RIFF" && fourcc(payload, 8) == "WAVE",
      "WavPcmDecoder: not a RIFF/WAVE stream")
    // walk the chunk list: fmt must precede data per spec, but accept
    // any order; ignore unknown chunks (LIST, fact, ...)
    var off = 12
    var rate = -1L; var channels = -1; var blockAlign = -1
    var dataBytes = -1L
    while (off + 8 <= payload.length && (rate < 0 || dataBytes < 0)) {
      val id = fourcc(payload, off)
      val sz = u32(payload, off + 4)
      val body = off + 8
      id match {
        case "fmt " =>
          require(sz >= 16 && body + 16 <= payload.length,
            "WavPcmDecoder: truncated fmt chunk")
          val audioFormat = u16(payload, body)
          require(audioFormat == 1,
            s"WavPcmDecoder: audio format $audioFormat is not PCM (1) — " +
              "compressed WAV needs a real codec library")
          channels = u16(payload, body + 2)
          rate = u32(payload, body + 4)
          blockAlign = u16(payload, body + 12)
          require(channels >= 1 && rate >= 1 && blockAlign >= 1,
            "WavPcmDecoder: degenerate fmt chunk")
        case "data" =>
          dataBytes = math.min(sz, (payload.length - body).toLong)
        case _ => // skip unknown chunk
      }
      // chunks are word-aligned: odd sizes carry a pad byte. Advance
      // in Long: sz is an unsigned 32-bit value, so `sz.toInt` wraps
      // negative for sz >= 2^31 and a crafted chunk size (e.g.
      // 0xFFFFFFF8 → advance of 0) would stall the walker forever —
      // the loud-per-record contract demands a throw, not a hung task.
      require(sz <= payload.length,
        s"WavPcmDecoder: chunk '$id' at offset $off claims $sz bytes — " +
          s"larger than the whole ${payload.length}-byte payload")
      // a truncated final chunk (next past EOF) just ends the walk
      off = math.min(body.toLong + sz + (sz & 1L), payload.length.toLong).toInt
    }
    require(rate > 0, "WavPcmDecoder: missing fmt chunk")
    require(dataBytes >= 0, "WavPcmDecoder: missing data chunk")
    (rate.toInt, channels, dataBytes / blockAlign)
  }
}
