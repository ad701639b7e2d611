package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.operators.Survivorship

/** Generative proof of goldenRecord (q205): for ANY conflicting
  * per-key feed in ANY row order, the one-aggregate fold equals the
  * from-scratch per-field recompute — latest = value at max
  * (ord, ordTie), largest = field max, majority = most frequent value
  * with ties to the LARGEST value (the documented window-free
  * contract). Row order is the distributed degree of freedom here
  * (the fold is a pair of algebraic aggregates, so partial/merge
  * batching is exactly what Spark's map-side combine already
  * exercises under every shuffled order); values collide on purpose
  * so majority ties and ord ties actually occur.
  */
object SurvivorshipProperties extends Properties("graft.survivorship") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  // (key, ord, ordTie, latest-val, largest-val, majority-val):
  // ord collides across rows (ties broken by unique ordTie),
  // majority values drawn from 3 symbols so ties are common
  private case class Row(k: String, o: Long, ot: Long, lv: Long,
                         gv: Long, mv: String)
  private val feed: Gen[List[Row]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.sequence[List[Row], Row]((1 to n).toList.map { i =>
      for {
        k <- Gen.oneOf("k1", "k2", "k3")
        o <- Gen.choose(0L, 6L)
        lv <- Gen.choose(-20L, 20L)
        gv <- Gen.choose(-20L, 20L)
        mv <- Gen.oneOf("a", "b", "c")
      } yield Row(k, o, i.toLong, lv, gv, mv)
    })
  } yield rows

  private def reference(rows: List[Row]): Map[String, (Long, Long, Long, String, Long)] =
    rows.groupBy(_.k).map { case (k, rs) =>
      val latest = rs.maxBy(r => (r.o, r.ot)).lv
      val largest = rs.map(_.gv).max
      val counts = rs.groupBy(_.mv).map { case (v, g) => (v, g.size.toLong) }
      val (mv, mn) = counts.maxBy { case (v, n) => (n, v) }
      k -> ((rs.size.toLong, latest, largest, mv, mn))
    }

  property("goldenRecord == from-scratch recompute for any feed in any row order") =
    forAll(feed, Gen.long) { (rows, seed) =>
      import spark.implicits._
      val shuffled = new scala.util.Random(seed).shuffle(rows)
      val df = shuffled.map(r => (r.k, r.o, r.ot, r.lv, r.gv, r.mv))
        .toDF("k", "o", "ot", "lv", "gv", "mv")
        .repartition(3) // arbitrary physical batching of the fold
      val got = Survivorship.goldenRecord(df, col("k"), col("o"),
          col("ot"), col("lv"), col("gv"), col("mv"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4), r.getLong(5))))
        .toMap
      got == reference(rows)
    }
}
