package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Training-data deduplication operators, designed for the 100 TB case:
  *
  *  - `exact`: one hash-shuffle on the dedup key (map-side partial agg
  *    applies since the agg is min/count).
  *  - `minhashLsh`: per-row signature computation (no shuffle), then a
  *    shuffle keyed on (band, bandSig) whose fan-in is bounded by the
  *    LSH bucket sizes — never the O(n²) pair space. Candidates are
  *    verified with exact Jaccard before being reported.
  *  - `simhash`: per-row 60-bit fingerprint; candidate pairs via the
  *    pigeonhole chunk trick (hamming ≤ k ⟹ one of k+1 chunks equal),
  *    again bounded by bucket sizes.
  *  - `ngramJaccard`: the exact quadratic baseline — correct, but the
  *    gram self-join explodes on high-frequency shingles; at scale use
  *    `minhashLsh` (this one exists as the correctness anchor and for
  *    small/blocked inputs).
  *  - `embeddingNearDup`: exact cosine over all pairs (broadcast nested
  *    loop — only for candidate sets that fit a broadcast); the scale
  *    path is sign-LSH bucketing first (see Similarity.signLshTopK).
  */
object Dedup {

  /** Exact duplicate groups by `key`: representative = min(id). */
  def exact(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** (doc_id, grams) pairs with non-empty distinct gram sets. */
  def gramSets(df: DataFrame, id: Column, text: Column, n: Int): DataFrame =
    df.select(id.as("doc_id"), distinctGrams(text, n).as("grams"))
      .filter(size(col("grams")) > 0)

  /** Exact n-gram Jaccard similar pairs (doc_a < doc_b, jaccard >= thr).
    * Output: doc_a, doc_b, jaccard (rounded 4dp; threshold applied to the
    * rounded value so engine float drift cannot flip boundary pairs).
    */
  def ngramJaccard(df: DataFrame, id: Column, text: Column,
                   n: Int, thr: Double): DataFrame = {
    val d = gramSets(df, id, text, n).cache()
    val g = d.select(col("doc_id"), explode(col("grams")).as("gram"))
    val pairs = g.as("a").join(g.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    val sz = d.select(col("doc_id"), size(col("grams")).as("n_grams"))
    pairs
      .join(sz.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sz.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("shared").cast("double") /
          (col("sa.n_grams") + col("sb.n_grams") - col("shared")), 4).as("jaccard"))
      .filter(col("jaccard") >= thr)
  }

  /** MinHash + LSH near-dup pairs, verified by exact Jaccard.
    * numPerm hashes split into `bands` bands of numPerm/bands rows.
    */
  def minhashLsh(df: DataFrame, id: Column, text: Column, n: Int,
                 numPerm: Int, bands: Int, thr: Double): DataFrame = {
    val bandSize = numPerm / bands
    val d = gramSets(df, id, text, n).cache()
    val sig = d.select(col("doc_id"),
      minhashSignature(col("grams"), numPerm).as("sig"))
    val bandCols = (0 until bands).map(b => bandSignature(col("sig"), b, bandSize))
    val banded = sig.select(col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("band_id", "band_sig")))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_sig") === col("b.band_sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(d.select(col("doc_id").as("doc_a"), col("grams").as("ga")), "doc_a")
      .join(d.select(col("doc_id").as("doc_b"), col("grams").as("gb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(jaccard(col("ga"), col("gb")), 4).as("jaccard"))
      .filter(col("jaccard") >= thr)
  }

  /** 60-bit SimHash fingerprint per document (word-level features). */
  def simhashFingerprints(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tok = df.select(id.as("doc_id"), explode(words(text)).as("word"))
      .filter(length(col("word")) > 0)
      .select(col("doc_id"), hash60(col("word"), 0).as("h"))
    val bits = tok.select(col("doc_id"), col("h"),
      explode(sequence(lit(0), lit(59))).as("i"))
    val perBit = bits.groupBy("doc_id", "i")
      .agg(sum(expr("(shiftright(h, i) & 1) * 2 - 1")).as("s"))
    perBit.groupBy("doc_id")
      .agg(sum(when(col("s") > 0,
        expr("shiftleft(cast(1 as bigint), i)")).otherwise(lit(0L))).as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxDist (pigeonhole:
    * 4 chunks of 15 bits; hamming<=3 implies at least one chunk equal).
    */
  def simhashPairs(df: DataFrame, id: Column, text: Column,
                   maxDist: Int): DataFrame = {
    require(maxDist <= 3, "chunking is sized for hamming <= 3")
    val fp = simhashFingerprints(df, id, text).cache()
    val chunks = fp.select(col("doc_id"), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("c"))
      .withColumn("chunk", expr("shiftright(simhash, c * 15) & 32767"))
    val cand = chunks.as("a").join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sim_a"), col("b.simhash").as("sim_b"))
      .distinct()
    cand.select(col("doc_a"), col("doc_b"),
        expr("bit_count(sim_a ^ sim_b)").cast("int").as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** Exact embedding cosine near-dup pairs (id_a < id_b, rounded sim >=
    * thr). Quadratic: the smaller side must be broadcastable. This is the
    * correctness anchor; the scale default is `embeddingNearDupLsh`.
    */
  def embeddingNearDup(df: DataFrame, id: Column, vec: Column,
                       thr: Double): DataFrame = {
    graft.functions.ArrayDot.register(df.sparkSession)
    import graft.functions.ArrayDot.{dot => adot}
    // Norms precomputed once per vector (O(n)), so the O(pairs) join only
    // pays one fused codegen'd dot per pair.
    val e = df.select(id.as("vec_id"), toDouble(vec).as("v"))
      .withColumn("nrm", sqrt(adot(col("v"), col("v"))))
    e.as("a").join(broadcast(e.as("b")), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(adot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= thr)
  }

  /** Banded sign-LSH embedding near-dup — the 100 TB default. Band b is
    * the sign pattern of dims [b·r, (b+1)·r); a pair is a candidate iff
    * it collides in ≥1 band; candidates are verified with exact cosine.
    *
    * Plan shape: per-row signature projection (no shuffle) → explode to
    * (band, sig) → self-join SHUFFLED ON THE BAND KEYS (never a full
    * broadcast, never the global O(n²) pair space) → distinct → two
    * vec_id joins for the verify stage. Candidate volume per band-bucket
    * is |bucket|², bounded by choosing r so 2^r buckets keep buckets
    * small; recall for a pair with per-bit agreement p is 1-(1-p^r)^B
    * (documented <1: this operator trades recall for a 10-100x pair-space
    * cut; raise `bands` for higher recall).
    */
  def embeddingNearDupLsh(df: DataFrame, id: Column, vec: Column,
                          thr: Double, bands: Int, bitsPerBand: Int): DataFrame = {
    graft.functions.ArrayDot.register(df.sparkSession)
    import graft.functions.ArrayDot.{dot => adot}
    val e = df.select(id.as("vec_id"), toDouble(vec).as("v"))
      .withColumn("nrm", sqrt(adot(col("v"), col("v"))))
    val sigCols = (0 until bands).map(b =>
      signBucket(col("v"), bitsPerBand, b * bitsPerBand))
    val banded = e.select(col("vec_id"),
      posexplode(array(sigCols: _*)).as(Seq("band", "sig")))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    cand
      .join(e.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na")), "id_a")
      .join(e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(adot(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= thr)
  }
}
