package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins TopKState's contract: the buffer+θ invariant makes the
  * reported top-k EXACT under any batch split of the same signed
  * history; deletion drain below k is answered by a certified refill
  * (and the `refilled` verdict honestly reflects the state path the
  * history took — a one-shot run that never evicted into the drain
  * doesn't flag).
  */
class TopKStateSpec extends SparkSpec {

  private val K = 3
  private val B = 6

  private def df(rows: Seq[(String, Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("g", "id", "v", "sign")
  }

  private def run(splits: Seq[Seq[(String, Long, Long, Long)]],
                  base: Seq[(String, Long, Long, Long)])
      : Seq[(String, Long, Long, Long, Long)] = {
    val first = df(splits.head)
    var (buf, meta) = TopKState.emptyState(first, Seq("g"))
    splits.foreach { s =>
      val (b2, m2) = TopKState.step(buf, meta, df(s), Seq("g"), B)
      // localCheckpoint stands in for the parquet round-trip the
      // monitors do per batch (state must not chain lineage)
      buf = b2.localCheckpoint(true); meta = m2.localCheckpoint(true)
    }
    TopKState.topkWithRefill(buf, meta, df(base), Seq("g"), K)
      .orderBy("g", "rnk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
  }

  test("view is batch-split invariant; θ discards below-horizon inserts; deletes land everywhere") {
    val ins = (1L to 30L).map(i => ("a", i, i * 10, 1L))
    // deletes: two buffer members, one below-θ row (id 1)
    val dels = Seq(28L, 27L, 1L).map(i => ("a", i, i * 10, -1L))
    val all = ins ++ dels
    val one = run(Seq(all), all)
    val three = run(Seq(ins.take(20).toSeq,
      (ins.drop(20) ++ dels.take(2)).toSeq, Seq(dels(2))), all)
    assert(one.map(t => (t._1, t._3, t._4, t._5)) ===
      three.map(t => (t._1, t._3, t._4, t._5)),
      "top-k rows must not depend on how the history was batched")
    assert(one.map(t => (t._3, t._4, t._5)) ===
      Seq((1L, 30L, 300L), (2L, 29L, 290L), (3L, 26L, 260L)))
    assert(one.forall(_._2 == 0L) && three.forall(_._2 == 0L),
      "no drain here — refill must not fire")
  }

  test("deletion drain below k certifies a refill; the refilled view equals the recompute") {
    val ins = (1L to 30L).map(i => ("a", i, i * 10, 1L))
    // churn wave: kill the whole warm buffer region after the last
    // insert — ids 23..30 — so the split run's buffer drains to zero
    // while 22 live rows remain below θ
    val dels = (23L to 30L).map(i => ("a", i, i * 10, -1L))
    val all = ins ++ dels
    val expectedRows = Seq((1L, 22L, 220L), (2L, 21L, 210L), (3L, 20L, 200L))
    val one = run(Seq(all), all)
    // one-shot: deletes fold into the same batch as every insert —
    // the buffer never held the doomed rows past an eviction, so the
    // read serves from a healthy buffer, refilled = 0
    assert(one.map(t => (t._3, t._4, t._5)) === expectedRows)
    assert(one.forall(_._2 == 0L))
    val split = run(Seq(ins.toSeq, dels.toSeq), all)
    // split: the wave hits AFTER the buffer was capped at {25..30} —
    // |buf| = 0 < k with n_live = 22 > 0: certified drain, per-group
    // refill, identical rows with refilled = 1
    assert(split.map(t => (t._3, t._4, t._5)) === expectedRows)
    assert(split.forall(_._2 == 1L),
      "post-wave drain must certify and flag the refill")
  }

  test("groups with fewer than k live rows report what exists, without a refill") {
    val rows = Seq(("a", 1L, 10L, 1L), ("a", 2L, 20L, 1L),
      ("b", 9L, 90L, 1L), ("b", 8L, 80L, 1L), ("b", 7L, 70L, 1L),
      ("b", 6L, 60L, 1L), ("b", 5L, 50L, 1L))
    val out = run(Seq(rows), rows)
    assert(out.filter(_._1 == "a").map(t => (t._3, t._4)) ===
      Seq((1L, 2L), (2L, 1L)), "group a has 2 live rows — report both")
    assert(out.filter(_._1 == "b").map(_._4) === Seq(9L, 8L, 7L))
    assert(out.forall(_._2 == 0L), "n_live == |buffer| is complete, not a drain")
  }
}
