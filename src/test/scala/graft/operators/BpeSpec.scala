package graft.operators

import graft.SparkSpec

/** Pins BPE merge-application semantics on hand-computed vocabularies —
  * above all the doubled-separator encoding's guarantee that string
  * replace() IS greedy left-to-right merge application (the oracle gate
  * covers q213 end-to-end; these verify the algorithm is the INTENDED
  * one, the run-of-four case included).
  */
class BpeSpec extends SparkSpec {

  private def vocab(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("wd", "f")
  }

  private def merges(v: org.apache.spark.sql.DataFrame, rounds: Int) =
    Bpe.learnMerges(v, rounds).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))

  test("run of four: round 2 sees [aa, aa], not [aa, a, a]") {
    // "aaaa" -> round 1 pair (a,a) appears 3x positionally; greedy
    // left-to-right merge gives [aa, aa], so round 2's top pair must be
    // (aa, aa) with count 1 — the single-space encoding would leave
    // [aa, a, a] and report (a, a) or (aa, a) instead.
    val got = merges(vocab("aaaa" -> 1L), 2)
    assert(got === Seq((1, "a a", 3L), (2, "aa aa", 1L)))
  }

  test("run of three merges greedily to [aa, a]") {
    val got = merges(vocab("aaa" -> 2L), 2)
    assert(got(0) === ((1, "a a", 4L))) // 2 positional pairs x f=2
    assert(got(1) === ((2, "aa a", 2L)))
  }

  test("frequency weighting and lexicographic tiebreak") {
    // "ab" f=5 -> pair "a b" n=5 wins round 1; "ba" f=3 survives as
    // "b a" and wins round 2. Then "ab"/"ba" are single symbols: round
    // 3's only pairs come from "abba": after ab and ba merge inside it
    // it is [ab, ba] -> pair "ab ba".
    val got = merges(vocab("ab" -> 5L, "ba" -> 3L, "abba" -> 1L), 3)
    assert(got === Seq((1, "a b", 6L), (2, "b a", 4L), (3, "ab ba", 1L)))
  }

  test("ties break by pair ascending") {
    val got = merges(vocab("xy" -> 2L, "ab" -> 2L), 1)
    assert(got === Seq((1, "a b", 2L)))
  }

  test("single-char words contribute no pairs") {
    val got = merges(vocab("a" -> 100L, "bc" -> 1L), 1)
    assert(got === Seq((1, "b c", 1L)))
  }

  test("fertilityAfterMerges: merged run halves its token count, weighted totals exact") {
    // vocab: aaaa (f=2), ab (f=1). Round 1 winner is (a,a) with
    // weighted count 6; applying it greedily: aaaa -> [aa, aa] (2
    // tokens), ab stays [a, b]. total_words = 3,
    // total_tokens = 2·2 + 1·2 = 6 -> fertility 20000 bp; symbol
    // inventory after merging = {aa, a, b}.
    val got = Bpe.fertilityAfterMerges(
      vocab("aaaa" -> 2L, "ab" -> 1L), rounds = 1).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3)) === ((3L, 6L, 20000L, 3L)))
  }
}
