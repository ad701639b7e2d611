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

  /** whitespace tokenization of the normalized text. */
  def words(c: Column): Column = split(normText(c), " ")

  /** Sliding word n-grams joined by single spaces; empty array when the
    * doc has fewer than n words (guards Spark's descending `sequence`).
    */
  def wordGrams(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => array_join(slice(ws, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  def distinctGrams(text: Column, n: Int): Column =
    array_distinct(wordGrams(words(text), n))

  /** 60-bit uniform hash: first 15 hex chars of md5("<seed>#<v>"), as a
    * non-negative LongType. DuckDB equivalent:
    * `('0x' || substring(md5(seed || '#' || v), 1, 15))::BIGINT`.
    */
  def hash60(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(seed.toString), lit("#"), c)), 1, 15), 16, 10)
      .cast("long")

  /** MinHash signature: for each seed, the minimum hash60 over the gram
    * set. Computed entirely per-row with higher-order functions — no
    * shuffle, no UDF; the expensive part (numPerm md5s per gram) is
    * embarrassingly parallel across executors.
    */
  def minhashSignature(grams: Column, numPerm: Int): Column =
    array((0 until numPerm).map(s =>
      array_min(transform(grams, g => hash60(g, s)))): _*)

  /** LSH band signature: md5 of the comma-joined signature slice for band
    * b (rows `bandSize*b .. bandSize*b+bandSize-1`).
    */
  def bandSignature(sig: Column, band: Int, bandSize: Int): Column =
    md5(concat_ws(",",
      transform(slice(sig, band * bandSize + 1, bandSize),
        x => x.cast("string"))))

  /** Jaccard over two pre-distinct gram arrays: |A∩B| / (|A|+|B|-|A∩B|).
    * The intersection (the inner loop of the LSH verify stage) is computed
    * once and shared via a lambda binding, not twice.
    */
  def jaccard(a: Column, b: Column): Column =
    aggregate(array(size(array_intersect(a, b)).cast("double")), lit(0.0),
      (_, shared) => shared / (size(a) + size(b) - shared))
}
