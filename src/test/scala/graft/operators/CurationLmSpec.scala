package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hand-checkable corpora for the round-7 curation additions (the
  * oracle gate covers them at sf0.01; these pin the arithmetic on
  * inputs small enough to verify by hand).
  */
class CurationLmSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bigramLmScore: deterministic bigram 'a b' always followed -> prob 1") {
    // corpus: "a b" twice and nothing else starting with 'a'
    // P(b|a) = 1.0 for both docs; every other bigram unique after its prefix
    val d = docs(1L -> "a b", 2L -> "a b")
    val rows = Curation.bigramLmScore(d, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getInt(1) === 1)          // one bigram occurrence per doc
      assert(r.getDouble(2) === 1.0)     // P(b|a) = 2/2
      assert(r.getDouble(3) === 1.0)
    }
  }

  test("bigramLmScore: split prefix halves the conditional probability") {
    // 'a' continues to b once and c once -> P(b|a) = P(c|a) = 0.5
    val d = docs(1L -> "a b", 2L -> "a c")
    val rows = Curation.bigramLmScore(d, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    rows.foreach(r => assert(r.getDouble(2) === 0.5))
  }

  test("bigramLmScore: docs under 2 tokens are absent") {
    val rows = Curation.bigramLmScore(docs(1L -> "solo", 2L -> "a b"),
      col("doc_id"), col("text")).collect()
    assert(rows.map(_.getLong(0)).toSet === Set(2L))
  }

  test("trainValTestSplit: disjoint, exhaustive, deterministic") {
    import spark.implicits._
    val d = (1L to 1000L).toDF("doc_id")
    val s1 = Curation.trainValTestSplit(d, col("doc_id"), 800, 100, seed = 7)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = Curation.trainValTestSplit(d, col("doc_id"), 800, 100, seed = 7)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 === s2)                       // rerun-stable
    assert(s1.size === 1000)                // exhaustive, one label each
    val counts = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    // uniform hash: roughly 80/10/10 (loose bounds, deterministic data)
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("test") > 50)
  }
}
