package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the golden-record field rules: latest-wins ordering with id
  * tiebreak, the majority tie contract (largest value), and that the
  * three rules are independent (each field can come from a DIFFERENT
  * source row).
  */
class SurvivorshipSpec extends SparkSpec {

  private def feed(rows: (Long, Long, Long, String, Long, String)*) = {
    import spark.implicits._
    rows.toDF("k", "ord", "id", "lv", "gv", "mv")
  }

  test("goldenRecord: latest / largest / majority can disagree on source row") {
    val d = feed(
      (1L, 1L, 10L, "HIGH", 100L, "O"),
      (1L, 2L, 11L, "LOW", 50L, "O"),
      (1L, 2L, 12L, "MED", 70L, "F")) // latest row (ord 2, id 12)
    val got = Survivorship.goldenRecord(d, col("k"), col("ord"), col("id"),
      col("lv"), col("gv"), col("mv")).collect().head
    // latest = MED (ord tie 2 broken by id 12 > 11); largest = 100 from
    // the OLDEST row; majority = O (2 of 3) from neither
    assert((got.getLong(1), got.getString(2), got.getLong(3),
      got.getString(4), got.getLong(5)) === ((3L, "MED", 100L, "O", 2L)))
  }

  test("goldenRecord: majority ties go to the largest value, by contract") {
    val d = feed((2L, 1L, 1L, "X", 1L, "A"), (2L, 2L, 2L, "X", 1L, "B"))
    val got = Survivorship.goldenRecord(d, col("k"), col("ord"), col("id"),
      col("lv"), col("gv"), col("mv")).collect().head
    assert(got.getString(4) === "B")
    assert(got.getLong(5) === 1L)
  }
}
