package graft.operators

import graft.SparkSpec

/** Snapshot-diff classification semantics, including the null-safe
  * compare contract (value<->NULL = update, NULL==NULL = unchanged).
  */
class DiffSpec extends SparkSpec {

  test("snapshotDiff classifies insert/delete/update/unchanged") {
    import spark.implicits._
    val base = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("c")),
      (5L, None: Option[String])).toDF("k", "v")
    val next = Seq((2L, Some("b")), (3L, Some("X")), (4L, Some("d")),
      (5L, None: Option[String])).toDF("k", "v")
    val got = Diff.snapshotDiff(base, next, Seq("k"), Seq("v"))
      .select("k", "diff_status").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "delete", 2L -> "unchanged", 3L -> "update",
      4L -> "insert", 5L -> "unchanged"))
  }

  test("snapshotDiff: value to NULL is an update (null-safe compare)") {
    import spark.implicits._
    val base = Seq((1L, Some("a"))).toDF("k", "v")
    val next = Seq((1L, None: Option[String])).toDF("k", "v")
    val got = Diff.snapshotDiff(base, next, Seq("k"), Seq("v"))
      .select("diff_status").as[String].collect().toSeq
    assert(got === Seq("update"))
  }
}
