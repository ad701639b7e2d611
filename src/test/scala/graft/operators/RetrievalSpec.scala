package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit semantics for the retrieval pack (the oracle gate covers q100/
  * q116 end-to-end; these pin the arithmetic contracts in isolation).
  */
class RetrievalSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "spark join window spark spark"), // hits all 3 terms, tf-heavy
      (2L, "spark alpha beta gamma delta"),  // hits 1 term
      (3L, "nothing relevant here at all"),  // hits none -> absent
      (4L, "join window join epsilon zeta"))
      .toDF("doc_id", "text")
  }

  test("bm25ScoreBp: only hit documents emitted; more hits => higher score") {
    val byDoc = Retrieval.bm25ScoreBp(docs, col("doc_id"), col("text"),
        Seq("spark", "join", "window"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!byDoc.contains(3L), "zero-hit doc must be absent")
    assert(byDoc(1L)._1 === 3L && byDoc(4L)._1 === 2L && byDoc(2L)._1 === 1L)
    assert(byDoc(1L)._2 > byDoc(2L)._2, "3-term hit outscores 1-term hit")
  }

  test("rrfFuse: integer 1e6 div (k+rank) terms; one-sided ids keep 0") {
    import spark.implicits._
    val a = Seq((10L, 1), (20L, 2)).toDF("id", "r")
    val b = Seq((20L, 1), (30L, 2)).toDF("id", "r")
    val got = Retrieval.rrfFuse(a, "id", "r", b, "id", "r", k = 60)
      .select("id", "rrf_score").as[(Long, Long)].collect().toMap
    assert(got(10L) === 1000000L / 61)            // text only, rank 1
    assert(got(20L) === 1000000L / 62 + 1000000L / 61)
    assert(got(30L) === 1000000L / 62)            // vector only, rank 2
  }

  test("topNRanks: TakeOrdered cutoff and ranks agree with the order") {
    import spark.implicits._
    val d = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 1L)).toDF("id", "s")
    val got = Retrieval.topNRanks(d, col("s"), col("id"), 3, "rk")
      .select("id", "rk").as[(Long, Int)].collect().toMap
    // 9 (id 2), 9 (id 3), 5 (id 1); id 4 cut
    assert(got === Map(2L -> 1, 3L -> 2, 1L -> 3))
  }
}
