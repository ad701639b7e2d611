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

  test("frequentTriples maxBasket: no-op below the cap, wide baskets dropped") {
    // baskets 1-3 hold {A,B,C}; basket 4 holds 6 L1-frequent items
    val rows = (1L to 3L).flatMap(b => Seq("A", "B", "C").map(b -> _)) ++
      Seq("A", "B", "C", "D", "E", "F").map(4L -> _) ++
      (5L to 8L).flatMap(b => Seq("D", "E", "F").map(b -> _))
    val d = baskets(rows: _*)
    def run(cap: Int) = Itemsets.frequentTriples(d, col("bk"), col("it"),
        supNum = 1, supDen = 4, k = 100, maxBasket = cap)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    // cap above every basket width: identical to the default
    assert(run(10) === run(10000))
    // cap at 5 drops ONLY basket 4 from enumeration: ABC loses its
    // 4th occurrence, DEF its 5th; cross triples (needing basket 4)
    // vanish entirely
    val capped = run(5)
    assert(capped(("A", "B", "C", 3L)) && capped(("D", "E", "F", 4L)))
    assert(capped.forall(t => Set(t._1, t._2, t._3).subsetOf(Set("A", "B", "C"))
      || Set(t._1, t._2, t._3).subsetOf(Set("D", "E", "F"))))
    val uncapped = run(10000)
    assert(uncapped(("A", "B", "C", 4L)) && uncapped(("D", "E", "F", 5L)))
  }
}
