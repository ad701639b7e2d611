package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ArrayPairsSpec extends SparkSpec {

  private def pairsOf(xs: Seq[Long]): Seq[(Long, Long)] = {
    import spark.implicits._
    Seq(Tuple1(xs)).toDF("a")
      .select(explode(ArrayPairs.pairs(col("a"))).as("p"))
      .select(col("p.u"), col("p.v"))
      .as[(Long, Long)].collect().toSeq
  }

  test("pairs: C(n,2) ordered pairs in array order") {
    assert(pairsOf(Seq(1L, 2L, 3L)) ===
      Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairsOf(Seq(7L, 7L, 9L)) ===
      Seq((7L, 7L), (7L, 9L), (7L, 9L)),
      "duplicates are the caller's contract (collect_set upstream)")
  }

  test("pairs: empty and singleton arrays explode to nothing") {
    assert(pairsOf(Seq.empty) === Seq.empty)
    assert(pairsOf(Seq(42L)) === Seq.empty)
  }
}
