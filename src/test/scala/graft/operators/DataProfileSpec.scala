package graft.operators

import graft.SparkSpec

class DataProfileSpec extends SparkSpec {

  test("profile: nulls, exact distincts, min/max, sketch audit") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None),
      (Some(2L), Some("c")), (None, Some("a")))
      .toDF("k", "s")
    val rows = DataProfile.profile(df, Seq("k", "s")).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("k", "s"))
    val k = rows(0); val s = rows(1)
    assert(k.getLong(1) === 4L && k.getLong(2) === 1L && k.getLong(3) === 2L)
    assert(k.getBoolean(4))
    assert(k.getString(5) === "1" && k.getString(6) === "2")
    assert(s.getLong(2) === 1L && s.getLong(3) === 2L)
    assert(s.getString(5) === "a" && s.getString(6) === "c")
  }
}
