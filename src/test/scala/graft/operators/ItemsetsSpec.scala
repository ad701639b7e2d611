package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the Apriori staircase on hand-enumerable baskets (the oracle
  * gate covers q218 end-to-end; these verify the pruning semantics —
  * which candidates the L1/L2 filters kill — in isolation).
  */
class ItemsetsSpec extends SparkSpec {

  private def baskets(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("bk", "it")
  }

  test("frequentTriples: only triples whose every pair clears support survive") {
    // b1={A,B,C} b2={A,B,C} b3={A,B,D} b4={C,D}; support 1/2 of 4 = 2.
    // L1: all of A(3) B(3) C(3) D(2). Pairs: AB=3 AC=2 BC=2, AD=BD=CD=1
    // → L2={AB,AC,BC}. The only closure-complete triple is ABC, in
    // baskets 1,2 → sup 2. ABD occurs but AD/BD are infrequent.
    val d = baskets(
      (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"), (2L, "C"),
      (3L, "A"), (3L, "B"), (3L, "D"),
      (4L, "C"), (4L, "D"))
    val got = Itemsets.frequentTriples(d, col("bk"), col("it"),
        supNum = 1, supDen = 2, k = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got === Seq(("A", "B", "C", 2L)))
  }

  test("frequentTriples: L1 pruning removes rare items before enumeration") {
    // Z appears once (below 1/2 of 3 baskets = 2) — every triple
    // containing Z must be gone even though {A,B,Z} co-occurs.
    val d = baskets(
      (1L, "A"), (1L, "B"), (1L, "C"), (1L, "Z"),
      (2L, "A"), (2L, "B"), (2L, "C"),
      (3L, "A"), (3L, "B"), (3L, "C"))
    val got = Itemsets.frequentTriples(d, col("bk"), col("it"),
        supNum = 1, supDen = 2, k = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got === Seq(("A", "B", "C", 3L)))
  }

  test("frequentTriples: duplicate (basket, item) rows count once") {
    val d = baskets(
      (1L, "A"), (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"), (2L, "C"))
    val got = Itemsets.frequentTriples(d, col("bk"), col("it"),
        supNum = 1, supDen = 1, k = 10)
      .collect().map(r => r.getLong(3)).toSeq
    assert(got === Seq(2L))
  }
}
