package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The shared refuse-at-admission utility (round-12 verdict: q174
  * pairBudget, q274 candBudget, q218 maxBasket and the q187 window
  * bound were four bespoke implementations of "estimate the blow-up
  * cheaply, refuse loudly" — AdmissionGuard is the single one they
  * now route through). These specs pin (a) the standard refusal
  * format every routed operator shares, and (b) the NEW guards on
  * previously unguarded fan-outs (basketPairs, skipGramPairs,
  * sortedNeighborhoodPairs), including that a generous budget leaves
  * results bit-identical — the guard is observation, not semantics.
  */
class AdmissionGuardSpec extends SparkSpec {

  test("admit: returns the bound under budget, refuses loudly over it") {
    assert(AdmissionGuard.admit("op", "pair bound", 10L,
      "pairBudget", 10L, "Escalate to X.") === 10L)
    val e = intercept[IllegalArgumentException] {
      AdmissionGuard.admit("opName", "pair bound", 11L,
        "pairBudget", 10L, "Escalate to X.")
    }
    // the standard format: operator, measured bound, budget name=value,
    // the operator's escalation path, and the generic raise-it tail
    for (tok <- Seq("opName:", "pair bound 11", "pairBudget=10",
        "Escalate to X.", "raise pairBudget explicitly"))
      assert(e.getMessage.contains(tok),
        s"refusal must contain '$tok': ${e.getMessage}")
    val z = intercept[IllegalArgumentException] {
      AdmissionGuard.admit("op", "b", 0L, "budget", 0L, "x")
    }
    assert(z.getMessage.contains("budget >= 1"))
    // a wrapped-negative bound (non-ANSI Long overflow in the bound
    // aggregation, e.g. c*(c-1) div 2 on a ~4.3e9-row group) is the
    // blow-up itself — it must REFUSE, never compare under budget
    val neg = intercept[IllegalArgumentException] {
      AdmissionGuard.admit("op", "pair bound", -42L,
        "pairBudget", Long.MaxValue, "Escalate to X.")
    }
    assert(neg.getMessage.contains("overflowed Long"))
  }

  test("measuredBound: null-safe scalar from an empty frame") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(AdmissionGuard.measuredBound(empty, sum(col("v"))) === 0L)
    val d = Seq((1L, 3L), (2L, 4L)).toDF("k", "v")
    assert(AdmissionGuard.measuredBound(d, sum(col("v"))) === 7L)
  }

  test("routed refusals share the standard format (prefixJaccard, " +
      "editDistanceJoin, sortedNeighborhoodPairs, skipGramPairs, " +
      "basketPairs)") {
    import spark.implicits._
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = (1L to 6L).map(i => (i, t)).toDF("doc_id", "text")
    val standardTail = "explicitly if the cluster's shuffle capacity"
    def refusal(body: => Any): String = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains("exceeds") &&
        e.getMessage.contains(standardTail),
        s"not the standard refusal: ${e.getMessage}")
      e.getMessage
    }
    assert(refusal(Dedup.prefixJaccard(docs, col("doc_id"), col("text"),
        n = 3, thr = 0.5, maxPost = 100, pairBudget = 2L))
      .contains("prefixJaccard: candidate-pair bound"))
    assert(refusal(Dedup.editDistanceJoin(docs, col("doc_id"),
        col("text"), d = 2, candBudget = 2L))
      .contains("editDistanceJoin: candidate bound"))
    assert(refusal(Dedup.sortedNeighborhoodPairs(docs, col("doc_id"),
        col("text"), n = 2, keyLen = 8, blockLen = 4, win = 4,
        minBp = 1L, pairBudget = 2L))
      .contains("sortedNeighborhoodPairs: candidate-pair bound"))
    val ev = Seq((1L, 10L, 100L, "view"), (1L, 20L, 101L, "click"),
        (2L, 30L, 102L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    assert(refusal(Analytics.skipGramPairs(ev, col("user_id"),
        col("ts"), col("event_id"), col("event_type"), win = 2,
        pairBudget = 2L))
      .contains("skipGramPairs: probe fan-out bound"))
    val baskets = Seq((1L, "A"), (1L, "B"), (1L, "C"), (2L, "A"),
      (2L, "B")).toDF("bk", "it")
    assert(refusal(Itemsets.basketPairs(baskets, col("bk"), col("it"),
        pairBudget = 3L))
      .contains("basketPairs: pair fan-out bound"))
  }

  test("sortedNeighborhoodPairs bound is exact: admits at equality, " +
      "refuses one below") {
    import spark.implicits._
    // one block of 5 rows, win=3 (w=2): bound = w(w+1)/2 + (c-1-w)w
    // = 3 + 4 = 7 candidate pairs exactly
    val docs = (1L to 5L).map(i => (i, s"aaaa doc $i")).toDF("doc_id", "text")
    def run(budget: Long) = Dedup.sortedNeighborhoodPairs(docs,
      col("doc_id"), col("text"), n = 2, keyLen = 8, blockLen = 4,
      win = 3, minBp = 1L, pairBudget = budget)
    val e = intercept[IllegalArgumentException](run(6L))
    assert(e.getMessage.contains("candidate-pair bound 7"),
      s"expected the exact bound 7: ${e.getMessage}")
    assert(run(7L).count() >= 0L) // equality admits
  }

  test("basketPairs: guarded result equals the inline fan-out; " +
      "bound is exact Sum C(n,2)") {
    import spark.implicits._
    val baskets = Seq((1L, "A"), (1L, "B"), (1L, "C"), (2L, "A"),
      (2L, "B"), (3L, "C"), (1L, "A")).toDF("bk", "it")
    // distinct widths: 3, 2, 1 -> bound = 3 + 1 + 0 = 4
    val e = intercept[IllegalArgumentException] {
      Itemsets.basketPairs(baskets, col("bk"), col("it"), pairBudget = 3L)
    }
    assert(e.getMessage.contains("pair fan-out bound 4"),
      s"expected the exact bound 4: ${e.getMessage}")
    val got = Itemsets.basketPairs(baskets, col("bk"), col("it"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got === Set(("A", "B", 2L), ("A", "C", 1L), ("B", "C", 1L)))
  }

  test("skipGramPairs: generous budget leaves the pair matrix unchanged") {
    import spark.implicits._
    val ev = Seq((1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"),
        (1L, 30L, 102L, "c"), (2L, 10L, 103L, "a"), (2L, 20L, 104L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.skipGramPairs(ev, col("user_id"), col("ts"),
        col("event_id"), col("event_type"), win = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // user 1 seq a,b,c (win 2: all pairs both directions);
    // user 2 seq a,c
    assert(got === Set(("a", "b", 1L), ("b", "a", 1L), ("a", "c", 2L),
      ("c", "a", 2L), ("b", "c", 1L), ("c", "b", 1L)))
  }
}
