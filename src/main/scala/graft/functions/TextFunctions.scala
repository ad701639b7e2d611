package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the dedup / text-analysis operators. Everything is
  * built from codegen'd `org.apache.spark.sql.functions` (no UDFs) so it
  * stays inside whole-stage codegen and scales per-row with zero driver
  * involvement.
  *
  * Cross-engine determinism: the DuckDB oracles replay the same logic, so
  * the only hash primitive used is MD5 (identical bytes on any engine).
  * `hash60` derives a 60-bit integer from the first 15 hex chars of
  * md5("<seed>#<input>") — representable exactly in both Spark LongType
  * and DuckDB BIGINT, monotonic-free but uniform, which is all MinHash /
  * SimHash need.
  */
object TextFunctions {

  /** lower + trim + collapse internal whitespace to single spaces. */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** whitespace tokenization: one regex pass (split on \s+ of the
    * trimmed text ≡ normText-then-split-on-space, minus a full-string
    * rewrite — higher-order pipelines downstream are interpreted, so
    * per-row constant factors matter).
    */
  def words(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** Sliding word n-grams joined by single spaces; empty array when the
    * doc has fewer than n words (guards Spark's descending `sequence`).
    *
    * Built from n shifted slices zip_with-folded into concatenated
    * strings: O(n) array allocations per DOCUMENT instead of one
    * slice+array_join allocation per GRAM — ~3x cheaper in the
    * interpreted higher-order evaluator that dominates gramSets.
    */
  def wordGrams(ws: Column, n: Int): Column = {
    val m = size(ws) - (n - 1) // number of grams
    val shifted = (0 until n).map(i => slice(ws, lit(i + 1), m))
    val joined = shifted.reduce((acc, s) =>
      zip_with(acc, s, (a, b) => concat(a, lit(" "), b)))
    when(size(ws) >= n, joined).otherwise(array().cast("array<string>"))
  }

  /** Gram arrays route through the native one-pass kernel
    * (WordGramsNative — bit-identical to `wordGrams`, property-tested);
    * the composed `wordGrams` remains as the cross-check reference.
    */
  def distinctGrams(text: Column, n: Int): Column =
    array_distinct(WordGramsNative.gramsCol(words(text), n))

  /** 60-bit uniform hash: first 15 hex chars of md5("<seed>#<v>"), as a
    * non-negative LongType. DuckDB equivalent:
    * `('0x' || substring(md5(seed || '#' || v), 1, 15))::BIGINT`.
    */
  def hash60(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(seed.toString), lit("#"), c)), 1, 15), 16, 10)
      .cast("long")

  /** Deterministic permutation constants for the one-md5 MinHash scheme
    * (splitmix64-style mixing, reduced mod 2^31-1). Public so the DuckDB
    * oracle SQL can inline the identical values.
    */
  def permConst(s: Int): (Long, Long, Long) = {
    def mix(x: Long): Long = {
      var h = x * 0x9E3779B97F4A7C15L
      h ^= (h >>> 32)
      ((h & 0x7FFFFFFFL) % 2147483647L) | 1L
    }
    (mix(3L * s + 1), mix(3L * s + 2), mix(3L * s + 3))
  }

  /** The s-th universal-hash permutation of a 60-bit hash h:
    * (a_s·h₁ + b_s·h₂ + c_s) mod 2^31-1 with h₁/h₂ the low/high 30 bits
    * — all terms < 2^61, no overflow, identical arithmetic in DuckDB
    * BIGINT. One md5 + numPerm of these is ~16x cheaper than the
    * md5-per-(gram,seed) scheme at equal replayability.
    */
  def permHash(h: Column, s: Int): Column = {
    val (a, b, c) = permConst(s)
    (lit(a) * (h % lit(1073741824L)) + lit(b) * shiftright(h, 30) + lit(c)) %
      lit(2147483647L)
  }

  /** LSH band signature: md5 of the comma-joined signature slice for band
    * b (rows `bandSize*b .. bandSize*b+bandSize-1`).
    */
  def bandSignature(sig: Column, band: Int, bandSize: Int): Column =
    md5(concat_ws(",",
      transform(slice(sig, band * bandSize + 1, bandSize),
        x => x.cast("string"))))

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    * MOSS algorithm): hash every POSITIONAL word n-gram (rolling
    * shingles), slide a window of `w` consecutive hashes, keep the min
    * of each window, dedupe. Guarantees any shared run of n+w-1 words
    * between two documents shares ≥1 fingerprint, at ~1/w the storage
    * of full shingling. Per-row expressions only (the window mins use
    * the same shifted-slice zip_with fold as wordGrams — O(w) array ops
    * per document).
    */
  def winnowFingerprints(text: Column, n: Int, w: Int): Column = {
    // The gram-hash array is BOUND once via the inner lambda (interpreted
    // higher-order exprs do no common-subexpression elimination — naming
    // it directly would re-run grams+md5 for each of the w slices).
    val hsExpr = transform(wordGrams(words(text), n), g => hash60(g, 0))
    element_at(transform(array(hsExpr), hs => {
      val m = size(hs) - (w - 1)
      val mins = (0 until w).map(i => slice(hs, lit(i + 1), m))
        .reduce((a, b) => zip_with(a, b, (x, y) => least(x, y)))
      when(size(hs) >= w, array_distinct(mins))
        .otherwise(array().cast("array<bigint>"))
    }), 1)
  }

  /** Jaccard over two pre-distinct gram arrays: |A∩B| / (|A|+|B|-|A∩B|).
    * The intersection (the inner loop of the LSH verify stage) is computed
    * once and shared via a lambda binding, not twice.
    */
  def jaccard(a: Column, b: Column): Column =
    aggregate(array(size(array_intersect(a, b)).cast("double")), lit(0.0),
      (_, shared) => shared / (size(a) + size(b) - shared))
}
