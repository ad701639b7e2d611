package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Distributed selection == naive in-group sort, for every rank and any
  * bucket count (buckets steer distribution only — the exactness claim).
  */
class GroupedQuantileSpec extends SparkSpec {

  private def table = {
    import spark.implicits._
    // group a: 7 values incl. duplicates; group b: 2; group c: all-equal
    Seq(("a", 50L, 1L), ("a", 10L, 2L), ("a", 30L, 3L), ("a", 30L, 4L),
      ("a", 90L, 5L), ("a", 20L, 6L), ("a", 70L, 7L),
      ("b", 5L, 8L), ("b", 15L, 9L),
      ("c", 4L, 10L), ("c", 4L, 11L), ("c", 4L, 12L))
      .toDF("g", "v", "t")
  }

  test("kthSmallestLong matches the sorted answer for every rank") {
    import spark.implicits._
    val rows = table.as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sorted }
    for (k <- 1 to 7; buckets <- Seq(2, 4, 1024)) {
      val got = GroupedQuantile.kthSmallestLong(table, col("g"), col("v"),
          col("t"), n => least(lit(k.toLong), n), buckets)
        .as[(String, Long)].collect().toMap
      rows.foreach { case (g, sorted) =>
        val expect = sorted(math.min(k, sorted.length) - 1)
        assert(got(g) === expect, s"g=$g k=$k buckets=$buckets")
      }
    }
  }

  test("lowerMedianRank and pctRank produce the documented ranks") {
    import spark.implicits._
    val d = Seq(4L, 5L, 100L).toDF("n")
    val byN = d.select(col("n"),
        GroupedQuantile.lowerMedianRank(col("n")).as("med"),
        GroupedQuantile.pctRank(90)(col("n")).as("p90"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(byN(4L) === ((2L, 4L)))   // ceil(3.6) = 4
    assert(byN(5L) === ((3L, 5L)))   // ceil(4.5) = 5
    assert(byN(100L) === ((50L, 90L)))
  }
}
