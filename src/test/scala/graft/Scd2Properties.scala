package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Generative proof of scd2 (q93): for ANY per-key attribute feed in
  * ANY row order, the window compression equals the from-scratch
  * recompute — sort each key's rows by (ts, ordId), keep the rows
  * whose attribute differs from the previous row's, chain each kept
  * row's validity to the NEXT kept row's ts, mark the last one
  * current. ts ties (simultaneous snapshots, broken by the unique
  * ordId) and long same-value runs are generated on purpose — they
  * are exactly the cases a hand fixture under-samples.
  */
object Scd2Properties extends Properties("graft.scd2") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private case class Row(k: String, ts: Long, oid: Long, attr: String)
  private val feed: Gen[List[Row]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.sequence[List[Row], Row]((1 to n).toList.map { i =>
      for {
        k <- Gen.oneOf("k1", "k2")
        ts <- Gen.choose(0L, 8L) // collisions certain: ordId breaks ties
        attr <- Gen.oneOf("x", "y", "z")
      } yield Row(k, ts, i.toLong, attr)
    })
  } yield rows

  // (k, version_id) -> (attr, effective_from, effective_to, is_current)
  private def reference(rows: List[Row])
      : Map[(String, Long), (String, Long, Option[Long], Boolean)] =
    rows.groupBy(_.k).flatMap { case (k, rs) =>
      val sorted = rs.sortBy(r => (r.ts, r.oid))
      val changed = sorted.zip(None +: sorted.map(r => Some(r.attr)))
        .collect { case (r, prev) if !prev.contains(r.attr) => r }
      changed.zipWithIndex.map { case (r, i) =>
        val to = if (i + 1 < changed.length) Some(changed(i + 1).ts) else None
        (k, r.oid) -> ((r.attr, r.ts, to, to.isEmpty))
      }
    }

  property("scd2 == from-scratch compression for any feed in any row order") =
    forAll(feed, Gen.long) { (rows, seed) =>
      import spark.implicits._
      val shuffled = new scala.util.Random(seed).shuffle(rows)
      val df = shuffled.map(r => (r.k, r.ts, r.oid, r.attr))
        .toDF("k", "ts", "oid", "attr")
        .repartition(3)
      val got = Analytics.scd2(df, col("k"), col("ts"), col("oid"),
          col("attr"))
        .collect()
        .map { r =>
          val to = if (r.isNullAt(4)) None else Some(r.getLong(4))
          (r.getString(0), r.getLong(1)) ->
            ((r.getString(2), r.getLong(3), to, r.getBoolean(5)))
        }
        .toMap
      got == reference(rows)
    }
}
