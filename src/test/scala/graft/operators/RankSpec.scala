package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Rank.globalRank must equal the single-partition global row_number for
  * ANY prebucket count (the prebucketing affects distribution only), and
  * the equi-depth bins must partition the row count by the documented
  * integer formula. The oracle gate (q115) covers the sf-table path.
  */
class RankSpec extends SparkSpec {

  private def table = {
    import spark.implicits._
    // duplicate values (30.0 x3) force the tie column to decide ranks;
    // skewed range (one huge outlier) forces uneven prebuckets.
    Seq((1L, 30.0), (2L, 10.0), (3L, 30.0), (4L, 999.0), (5L, 30.0),
      (6L, 20.0), (7L, 10.0), (8L, 50.0))
      .toDF("id", "v")
  }

  test("globalRank == global row_number, any preBuckets") {
    import spark.implicits._
    val expected = table.orderBy(col("v"), col("id"))
      .collect().map(r => r.getLong(0)).zipWithIndex
      .map { case (id, i) => (id, (i + 1).toLong) }.toMap
    for (pb <- Seq(2, 4, 256)) {
      val got = Rank.globalRank(table, "v", "id", preBuckets = pb)
        .select("id", "global_rank").as[(Long, Long)].collect().toMap
      assert(got === expected, s"preBuckets=$pb")
    }
  }

  test("globalRank: constant value column degenerates to tie order") {
    import spark.implicits._
    val const = Seq((3L, 7.0), (1L, 7.0), (2L, 7.0)).toDF("id", "v")
    val got = Rank.globalRank(const, "v", "id")
      .select("id", "global_rank").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("equiDepthHistogram: bins partition n by (rank-1)*k div n") {
    import spark.implicits._
    val h = Rank.equiDepthHistogram(table, "v", "id", k = 3)
      .as[(Int, Long, Double, Double)].collect().toSeq
    // n=8, k=3: ranks 1-3 -> bin 1, 4-6 -> bin 2, 7-8 -> bin 3
    assert(h.map(r => (r._1, r._2)) === Seq((1, 3L), (2, 3L), (3, 2L)))
    assert(h.map(_._2).sum === 8L)
    // bin boundaries never overlap: hi(bin) <= lo(bin+1)
    h.sliding(2).foreach { case Seq(a, b) => assert(a._4 <= b._3); case _ => }
  }
}
