package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media treated as opaque `binary` payload
  * columns plus a typed metadata struct, processed in partition-sized
  * batches (the Scala analogue of `mapInPandas`: `Dataset.mapPartitions`
  * over a typed row, so each task touches a stream of records without
  * materializing the partition).
  *
  * The DEFAULT media decode is a STUB (this container has no image/audio
  * codec libraries): `decodeStub` derives deterministic fake dimensions /
  * frame counts from the payload bytes, keeping every multimodal query
  * oracle-replayable. The Spark-side contract — schema, batch iteration,
  * partitioning, column pruning of heavy payloads — is real and tested,
  * and the seam itself is proven on real bytes: [[decodeMeta]] takes a
  * [[MediaDecoder]], and [[WavPcmDecoder]] (a dependency-free RIFF/WAVE
  * PCM parser, `MediaCodecs.scala`) decodes actual WAV headers through
  * the identical mapPartitions path (MediaCodecsSpec). Production swaps
  * in its codec behind the same one-method interface.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, checksum: String,
                       width: Int, height: Int, n_frames: Long)

  /** ??? in production: real codec. Here: deterministic fake decode from
    * the first payload bytes, so tests are reproducible.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Long) = {
    val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
    val b1 = if (payload.length > 1) payload(1) & 0xff else 0
    ((b0 % 64 + 1) * 16, (b1 % 48 + 1) * 16, payload.length / 1000L + 1L)
  }

  /** Attach a binary payload column (here: utf-8 of a text column, since
    * testdata has no media) — at scale this is the parquet binary column
    * itself and never passes through strings.
    */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))

  /** Batch "decode": mapPartitions over typed records — one task per
    * input split, payloads streamed, only metadata comes back (payload
    * column pruned from the output, as a real pipeline would do before
    * any shuffle).
    *
    * `decoder` is the codec seam ([[MediaDecoder]]): the default
    * [[StubMediaDecoder]] keeps every oracle query replayable;
    * [[WavPcmDecoder]] proves the same seam decodes REAL media bytes
    * (MediaCodecsSpec) — a production deployment drops its codec in
    * here and the batching/schema/pruning plumbing is untouched.
    */
  def decodeMeta(spark: SparkSession, media: DataFrame,
                 decoder: MediaDecoder = StubMediaDecoder): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          val (w, h, f) = decoder.decode(r.payload)
          md.reset()
          val sum = md.digest(r.payload).map("%02x".format(_)).mkString
          MediaMeta(r.doc_id, r.payload.length.toLong, sum, w, h, f)
        }
      }
  }

  /** Frame sampling plan: every `stride`-th frame index, kept as a lazy
    * expression (no driver materialization).
    */
  def sampledFrameCount(nFrames: org.apache.spark.sql.Column, stride: Int) =
    floor((nFrames - 1) / stride) + 1

  /** Resize stub: target dims clamped to the decoded (fake) source dims,
    * aspect preserved by the caller's choice of box — the metadata
    * contract a real resize kernel would fill. Deterministic, no codec.
    */
  def resizeStub(width: org.apache.spark.sql.Column,
                 height: org.apache.spark.sql.Column,
                 boxW: Int, boxH: Int): org.apache.spark.sql.Column =
    struct(
      least(width, lit(boxW)).as("out_w"),
      least(height, lit(boxH)).as("out_h"),
      (least(width, lit(boxW)) * least(height, lit(boxH))).as("out_pixels"))

  /** Difference-hash-style 60-bit perceptual fingerprint over the
    * decoded payload seam: bit i is set iff "pixel" i is brighter than
    * "pixel" i+1 — the dHash construction (compare adjacent downsampled
    * pixels; robust to uniform brightness/contrast shifts because only
    * the gradient SIGN survives). Here the "decoded scanline" is the
    * stub decode of the payload — its utf-8 bytes read back as
    * characters, pixel value = the character code — so the hash
    * arithmetic (adjacent-compare, bit packing) is real and
    * oracle-replayable while the codec is stubbed like the rest of the
    * multimodal family; a production swap feeds real grayscale rows
    * through the identical expression. 60 bits (not 64) so fingerprints
    * flow straight into the 4x15-bit chunk machinery of
    * `Dedup.hammingPairs`. Callers must guarantee the decoded column
    * has at least `nBits + 1` pixels (filter on length) — comparing
    * past the end would read ascii('') = 0 and fabricate dark pixels.
    *
    * Per-row expression only — no shuffle, no UDF; 2·nBits codegen'd
    * substring/ascii calls per row.
    */
  def perceptualHash(decoded: org.apache.spark.sql.Column,
                     nBits: Int = 60): org.apache.spark.sql.Column =
    (0 until nBits).map { i =>
      when(ascii(substring(decoded, i + 1, 1)) >
          ascii(substring(decoded, i + 2, 1)), lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** FRAME SAMPLING — the video-ingest step that turns one media row
    * into sampled per-frame rows: the payload stream is cut into
    * fixed-size frames (the stub "codec": `frameChars` characters of
    * the decoded stream per frame, the same decoded-column seam as
    * `perceptualHash`), and every `stride`-th frame explodes into its
    * own row carrying a content fingerprint — the unit a vision encoder
    * or frame-level dedup consumes downstream. A production swap
    * replaces the substring slicing with codec frame extraction and
    * keeps the identical plan: per-row `sequence` + `explode`, no
    * shuffle, payload pruned after the fingerprint so frames never ride
    * through later exchanges.
    *
    * Output: (doc_id, frame_idx, n_frames, frame_hash) per sampled
    * frame; the last frame may be short (stream remainder), hashed as
    * is.
    */
  def sampleFrames(df: DataFrame, id: org.apache.spark.sql.Column,
                   decoded: org.apache.spark.sql.Column,
                   frameChars: Int, stride: Int): DataFrame = {
    require(frameChars > 0 && stride > 0, "frameChars and stride must be positive")
    val len = length(decoded).cast("long")
    val nFrames = graft.functions.IntMath.intDiv(
      len + (frameChars - 1).toLong, lit(frameChars.toLong))
    df.select(id.as("doc_id"), decoded.as("s"), nFrames.as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("s"), col("n_frames").cast("int").as("n_frames"),
        explode(sequence(lit(0), col("n_frames").cast("int") - 1,
          lit(stride))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"), col("n_frames"),
        md5(substring_index_safe(col("s"), col("frame_idx"), frameChars))
          .as("frame_hash"))
  }

  // substring with a column start (functions.substring takes literal
  // ints only): expression form, 1-based start = idx*frameChars + 1
  private def substring_index_safe(s: org.apache.spark.sql.Column,
                                   idx: org.apache.spark.sql.Column,
                                   frameChars: Int): org.apache.spark.sql.Column =
    s.substr(idx * frameChars + 1, lit(frameChars))

  /** ENERGY-BASED SEGMENTATION over the decoded payload — the
    * voice-activity-detection / silence-trim shape of an audio ingest
    * pipeline, with the Spark plumbing real and the "energy" a
    * deterministic function of the payload (non-blank characters per
    * frame — the stub for per-frame RMS, same bargain as
    * [[featureStub]]): frames below `minEnergy` are silence; maximal
    * runs of active frames become segments (gaps-and-islands on the
    * frame index), each reported with its span and total energy — the
    * unit a downstream ASR/encoder consumes instead of raw payloads.
    *
    * Scale shape: frame explode is bounded by payload length; both
    * windows (run grouping, segment numbering) partition per doc —
    * payload-bounded partitions, never corpus-wide; the segment
    * aggregate is algebraic.
    */
  def energySegments(df: DataFrame, id: org.apache.spark.sql.Column,
                     decoded: org.apache.spark.sql.Column,
                     frameChars: Int, minEnergy: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(frameChars > 0, "frameChars must be positive")
    val len = length(decoded).cast("long")
    val nFrames = graft.functions.IntMath.intDiv(
      len + (frameChars - 1).toLong, lit(frameChars.toLong))
    val frames = df.select(id.as("doc_id"), decoded.as("s"),
        nFrames.cast("int").as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"),
        col("s"))
      .select(col("doc_id"), col("frame_idx"),
        length(translate(substring_index_safe(col("s"), col("frame_idx"),
          frameChars), " ", "")).cast("long").as("energy"))
    val active = frames.filter(col("energy") >= minEnergy)
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy("frame_idx")))
      .withColumn("island", col("frame_idx") - col("rn"))
    active.groupBy("doc_id", "island")
      .agg(min("frame_idx").as("start_frame"),
        max("frame_idx").as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum("energy").as("energy"))
      .withColumn("seg_idx", row_number().over(
        Window.partitionBy("doc_id").orderBy("start_frame")).cast("long"))
      .select(col("doc_id"), col("seg_idx"), col("start_frame"),
        col("end_frame"), col("n_frames"), col("energy"))
  }

  /** Feature-extraction stub: a deterministic `dim`-dimensional float
    * vector derived from the payload's md5 — the embedding a real
    * vision/audio encoder would produce, with the exact Spark plumbing
    * (binary in, array<double> out, per-row expression, no UDF) that a
    * production encoder swap would keep. Values in [-1, 1]; replayable
    * bit-for-bit in the DuckDB oracle.
    */
  def featureStub(payload: org.apache.spark.sql.Column, dim: Int): org.apache.spark.sql.Column = {
    import graft.functions.TextFunctions.hash60
    array((0 until dim).map { i =>
      ((hash60(md5(payload), i) % 2001L) - 1000L).cast("double") / 1000.0
    }: _*)
  }
}
