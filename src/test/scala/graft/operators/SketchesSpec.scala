package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit semantics for the replayable HLL sketch (the oracle gate covers
  * q179 end-to-end against DuckDB; these pin the sketch contract in
  * isolation).
  */
class SketchesSpec extends SparkSpec {

  private def keyed(counts: (String, Int)*) = {
    import spark.implicits._
    counts.flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("k")
  }

  test("hllReplay: full register table, single key sets exactly one register") {
    val got = Sketches.hllReplay(keyed("only" -> 3), col("k"), p = 6)
      .orderBy("register").collect()
    assert(got.length === 64, "all 64 registers materialized")
    assert(got.map(_.getLong(0)).toSeq === (0L until 64L))
    val nonZero = got.filter(_.getLong(1) > 0)
    assert(nonZero.length === 1, "one key occupies exactly one register")
    val rho = nonZero.head.getLong(1)
    assert(rho >= 1 && rho <= 55, s"rho=$rho out of the 60-bit-hash range")
    assert(got.forall(_.getLong(3) === 1L), "n_true constant column")
    assert(got.forall(_.getLong(2) > 0L), "estimate positive")
  }

  test("hllReplay: registers merge as max (union of inputs)") {
    val a = Sketches.hllReplay(keyed("k1" -> 1, "k2" -> 1), col("k"), 6)
      .select("register", "rho").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sketches.hllReplay(keyed("k2" -> 1, "k3" -> 1), col("k"), 6)
      .select("register", "rho").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val u = Sketches.hllReplay(
      keyed("k1" -> 1, "k2" -> 1, "k3" -> 1), col("k"), 6)
      .select("register", "rho").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 64L).foreach { r =>
      assert(u(r) === math.max(a(r), b(r)),
        s"register $r of the union is not the max of the parts")
    }
  }
}
