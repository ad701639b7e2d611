package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Generative proof of touchAttribution (q124): for ANY (user, ts,
  * type) feed in ANY row order, the running-window annotation equals
  * the from-scratch scan — per user in (ts, ordId) order, each
  * conversion carries the user's FIRST touch id ever and the LAST
  * touch id at-or-before itself (same-instant touches attribute iff
  * their ordId sorts earlier), NULL when no touch preceded (organic).
  * Same-instant touch/conversion collisions and organic runs are
  * generated deliberately; non-touch non-conversion noise rows ride
  * along and must never attribute.
  */
object AttributionProperties extends Properties("graft.attribution") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private case class Ev(u: String, ts: Long, oid: Long, typ: String, v: Long)
  private val feed: Gen[List[Ev]] = for {
    n <- Gen.choose(1, 40)
    evs <- Gen.sequence[List[Ev], Ev]((1 to n).toList.map { i =>
      for {
        u <- Gen.oneOf("u1", "u2")
        ts <- Gen.choose(0L, 8L) // ties certain: ordId breaks them
        typ <- Gen.oneOf("touch", "conv", "noise")
        v <- Gen.choose(0L, 99L)
      } yield Ev(u, ts, i.toLong, typ, v)
    })
  } yield evs

  // conversion_id -> (user, value, first_touch_id, last_touch_id)
  private def reference(evs: List[Ev])
      : Map[Long, (String, Long, Option[Long], Option[Long])] =
    evs.groupBy(_.u).flatMap { case (u, rs) =>
      val sorted = rs.sortBy(r => (r.ts, r.oid))
      var first: Option[Long] = None
      var last: Option[Long] = None
      sorted.flatMap { r =>
        if (r.typ == "touch") {
          if (first.isEmpty) first = Some(r.oid)
          last = Some(r.oid)
        }
        if (r.typ == "conv") Some(r.oid -> ((u, r.v, first, last)))
        else None
      }
    }

  property("touchAttribution == from-scratch scan for any feed in any row order") =
    forAll(feed, Gen.long) { (evs, seed) =>
      import spark.implicits._
      val shuffled = new scala.util.Random(seed).shuffle(evs)
      val df = shuffled.map(e => (e.u, e.ts, e.oid, e.typ, e.v))
        .toDF("u", "ts", "oid", "typ", "v")
        .repartition(3)
      val got = Analytics.touchAttribution(df, col("u"), col("ts"),
          col("oid"), col("typ"), col("v"), "touch", "conv")
        .collect()
        .map { r =>
          def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
          r.getLong(0) -> ((r.getString(1), r.getLong(2), opt(3), opt(4)))
        }
        .toMap
      got == reference(evs)
    }
}
