package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the table-checksum contract: order-independence (the whole
  * point), sensitivity to any value change, and null/empty
  * disambiguation (the classic concat_ws trap).
  */
class IntegritySpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("id", "grp", "payload")
  }

  private def sums(df: org.apache.spark.sql.DataFrame) =
    Integrity.groupChecksum(df, col("grp"),
        Seq(col("id"), col("payload")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("checksum is row-order independent and repartition-stable") {
    val a = docs((1L, "g", "x"), (2L, "g", "y"), (3L, "g", "z"))
    val b = docs((3L, "g", "z"), (1L, "g", "x"), (2L, "g", "y"))
      .repartition(7)
    assert(sums(a) === sums(b))
  }

  test("any value change moves the checksum; row count alone does not save it") {
    val base = sums(docs((1L, "g", "x"), (2L, "g", "y")))
    val changed = sums(docs((1L, "g", "x"), (2L, "g", "Y")))
    assert(base("g")._1 === changed("g")._1, "same row count")
    assert(base("g")._2 !== changed("g")._2, "payload edit must move checksum")
  }

  test("null and empty string serialize differently") {
    val withNull = sums(docs((1L, "g", null)))
    val withEmpty = sums(docs((1L, "g", "")))
    assert(withNull("g")._2 !== withEmpty("g")._2)
  }

  test("groups checksum independently") {
    val two = sums(docs((1L, "a", "x"), (2L, "b", "y")))
    val aOnly = sums(docs((1L, "a", "x")))
    assert(two("a") === aOnly("a"), "group b must not bleed into a")
  }

  test("checksum state merges across arbitrary splits == single pass") {
    val all = docs((1L, "g", "x"), (2L, "g", "y"), (3L, "g", "z"),
      (4L, "h", "w"))
    val cols = Seq(col("id"), col("payload"))
    val whole = Integrity.groupChecksum(all, col("grp"), cols)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // split 1+3 rows, partial states merged by addition, then finished
    val s1 = Integrity.checksumState(all.filter(col("id") === 1),
      col("grp"), cols)
    val s2 = Integrity.checksumState(all.filter(col("id") =!= 1),
      col("grp"), cols)
    val merged = Integrity.finishChecksum(
        Integrity.mergeChecksumState(Seq(s1, s2)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(merged === whole,
      "mergeable state must equal the one-pass checksum on any split")
  }
}
