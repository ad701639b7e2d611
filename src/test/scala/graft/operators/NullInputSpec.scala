package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the NULL-text / NULL-id behavior of the corpus operators — at
  * 100 TB, null payloads are routine, and an operator that throws (or
  * silently invents data) on them is broken. The contracts asserted
  * here are the documented ones: null text never reaches gram/token
  * paths; null quality signals propagate as NULL keep (caller decides);
  * chunkers emit nothing for a null doc.
  */
class NullInputSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val mixed = docs(
    1L -> "alpha beta gamma delta epsilon",
    2L -> (null: String),
    3L -> "alpha beta gamma delta epsilon")

  test("gramSets drops null-text docs instead of throwing") {
    val g = Dedup.gramSets(mixed, col("doc_id"), col("text"), 3)
    assert(g.select("doc_id").collect().map(_.getLong(0)).sorted === Array(1L, 3L))
  }

  test("ngramJaccard still pairs the surviving docs") {
    val p = Dedup.ngramJaccard(mixed, col("doc_id"), col("text"),
      n = 3, thr = 0.5, maxDf = 100).collect()
    assert(p.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 3L)))
  }

  test("qualitySignals yields NULL keep for null text (caller decides)") {
    val q = Curation.qualitySignals(mixed, col("doc_id"), col("text"),
        Seq("the"), 1, 100, 0.0, 100.0, 0.0, 0)
      .collect().map(r => r.getLong(0) -> r.isNullAt(5)).toMap
    assert(q === Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("chunkTokens emits no windows for a null doc") {
    val c = Curation.chunkTokens(mixed, col("doc_id"), col("text"), 4, 1)
    assert(!c.select("doc_id").collect().map(_.getLong(0)).contains(2L))
  }

  test("repetitionSignals omits null-text docs") {
    val r = Curation.repetitionSignals(mixed, col("doc_id"), col("text"), 1.0, 1.0)
    assert(r.select("doc_id").collect().map(_.getLong(0)).sorted === Array(1L, 3L))
  }

  test("decontaminate ignores null text on both sides") {
    val out = Curation.decontaminate(mixed, col("doc_id"), col("text"),
      docs(100L -> (null: String), 101L -> "alpha beta gamma"), col("text"), 3)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted === Array(1L, 3L))
  }

  test("exact dedup groups null keys together (document, don't crash)") {
    val d = Dedup.exact(
      docs(1L -> (null: String), 2L -> (null: String), 3L -> "x"),
      col("text"), col("doc_id")).collect()
    val nullGroup = d.find(r => r.isNullAt(0)).get
    assert(nullGroup.getLong(1) === 1L && nullGroup.getLong(2) === 2L)
  }
}
