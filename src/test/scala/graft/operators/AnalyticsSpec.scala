package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit-level event-sequence semantics on hand-built feeds (the oracle
  * gate covers the full operators on `events` at sf0.01; these pin the
  * ordering edge cases the aggregate comparisons cannot isolate).
  */
class AnalyticsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, Long, String, String)*) = {
    import spark.implicits._
    rows.map { case (id, u, t, typ) => (id, u, ts(t), typ) }
      .toDF("event_id", "user_id", "ts", "event_type")
  }

  test("funnel: later stages require STRICTLY-after ordering") {
    val d = ev(
      // u1 completes the funnel in order
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (2L, 1L, "2024-01-01 10:05:00", "click"),
      (3L, 1L, "2024-01-01 10:10:00", "purchase"),
      // u2 clicked BEFORE viewing: click must not count
      (4L, 2L, "2024-01-01 09:00:00", "click"),
      (5L, 2L, "2024-01-01 09:30:00", "view"),
      // u3 purchase without click: stops at stage 1
      (6L, 3L, "2024-01-01 08:00:00", "view"),
      (7L, 3L, "2024-01-01 08:30:00", "purchase"))
    val got = Analytics.funnel(d, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((1, "view", 3L), (2, "click", 1L),
      (3, "purchase", 1L)))
  }

  test("funnel: simultaneous events do not satisfy strictly-after") {
    val d = ev(
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (2L, 1L, "2024-01-01 10:00:00", "click")) // same instant
    val got = Analytics.funnel(d, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got === Map(1 -> 1L, 2 -> 0L))
  }

  test("retentionCohorts: cohort anchors to first week, cells count users") {
    val d = ev(
      // u1 first active week of Jan 1 (Monday), returns 2 weeks later
      (1L, 1L, "2024-01-02 10:00:00", "view"),
      (2L, 1L, "2024-01-16 10:00:00", "view"),
      // u2 same cohort, active only that week (two events, one cell)
      (3L, 2L, "2024-01-03 10:00:00", "view"),
      (4L, 2L, "2024-01-05 10:00:00", "view"),
      // u3 cohort of Jan 8, next-week return
      (5L, 3L, "2024-01-08 10:00:00", "view"),
      (6L, 3L, "2024-01-15 10:00:00", "view"))
    val got = Analytics.retentionCohorts(d, col("user_id"), col("ts"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 2, 1L),
      ("2024-01-08", 0, 1L), ("2024-01-08", 1, 1L)))
  }

  test("scd2: consecutive equal values compress; validity ranges chain") {
    val d = ev(
      (1L, 1L, "2024-01-01 10:00:00", "bronze"),
      (2L, 1L, "2024-01-02 10:00:00", "bronze"), // no change: compressed
      (3L, 1L, "2024-01-03 10:00:00", "gold"),
      (4L, 1L, "2024-01-04 10:00:00", "bronze")) // back again: NEW version
    val rows = Analytics.scd2(d, col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      .orderBy("effective_from").collect()
    assert(rows.map(_.getString(2)).toSeq === Seq("bronze", "gold", "bronze"))
    // each version closes exactly when the next opens; last one current
    assert(rows.map(_.getLong(1)).toSeq === Seq(1L, 3L, 4L))
    assert(rows(0).getTimestamp(4) === rows(1).getTimestamp(3))
    assert(rows(1).getTimestamp(4) === rows(2).getTimestamp(3))
    assert(rows(2).isNullAt(4) && rows(2).getBoolean(5))
  }

  test("gapFillLocf: gap days carry the previous CLOSE forward") {
    import spark.implicits._
    val d = Seq(
      // Jan 1: two events — close must be the later one (7.0)
      (1L, 1L, ts("2024-01-01 09:00:00"), 3.0),
      (2L, 1L, ts("2024-01-01 18:00:00"), 7.0),
      // Jan 2-3: gap; Jan 4: one event
      (3L, 1L, ts("2024-01-04 12:00:00"), 9.0),
      // user 2: single day, no grid expansion
      (4L, 2L, ts("2024-01-02 10:00:00"), 5.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = Analytics.gapFillLocf(d, col("user_id"), col("ts"),
        col("event_id"), col("value"))
      .orderBy("key", "day")
      .as[(Long, java.sql.Date, Long, Double, Boolean)].collect().toSeq
    assert(got === Seq(
      (1L, java.sql.Date.valueOf("2024-01-01"), 2L, 7.0, false),
      (1L, java.sql.Date.valueOf("2024-01-02"), 0L, 7.0, true),
      (1L, java.sql.Date.valueOf("2024-01-03"), 0L, 7.0, true),
      (1L, java.sql.Date.valueOf("2024-01-04"), 1L, 9.0, false),
      (2L, java.sql.Date.valueOf("2024-01-02"), 1L, 5.0, false)))
  }

  test("touchAttribution: first ever vs last preceding; organic = NULL") {
    import spark.implicits._
    val d = Seq(
      (1L, 1L, ts("2024-01-01 09:00:00"), "purchase", 5.0), // organic
      (2L, 1L, ts("2024-01-01 10:00:00"), "click", 0.0),
      (3L, 1L, ts("2024-01-01 11:00:00"), "click", 0.0),
      (4L, 1L, ts("2024-01-01 12:00:00"), "purchase", 9.0), // first=2 last=3
      (5L, 1L, ts("2024-01-01 13:00:00"), "click", 0.0),
      (6L, 1L, ts("2024-01-01 14:00:00"), "purchase", 7.0)) // first=2 last=5
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Analytics.touchAttribution(d, col("user_id"), col("ts"),
        col("event_id"), col("event_type"), col("value"), "click", "purchase")
      .orderBy("conversion_id")
      .as[(Long, Long, Double, Option[Long], Option[Long])].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 5.0, None, None),
      (4L, 1L, 9.0, Some(2L), Some(3L)),
      (6L, 1L, 7.0, Some(2L), Some(5L))))
  }

  test("gapFillLocf: ts ties broken by ordId for the close") {
    import spark.implicits._
    val d = Seq(
      (1L, 1L, ts("2024-01-01 09:00:00"), 3.0),
      (2L, 1L, ts("2024-01-01 09:00:00"), 8.0)) // same ts, higher id wins
      .toDF("event_id", "user_id", "ts", "value")
    val got = Analytics.gapFillLocf(d, col("user_id"), col("ts"),
        col("event_id"), col("value"))
      .select("value_locf").as[Double].collect().toSeq
    assert(got === Seq(8.0))
  }

  test("paretoFrontier2d: matches brute-force dominance on a seeded cloud") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val got = Analytics.paretoFrontier2d(
        pts.toDF("id", "cost", "gain"),
        col("id"), col("cost"), col("gain"))
      .collect().map(_.getLong(0)).toSet
    // brute force: r survives iff nothing beats it weakly in both dims
    // and strictly in one
    val want = pts.filter { case (_, c, g) =>
      !pts.exists { case (_, c2, g2) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g)
      }
    }.map(_._1).toSet
    assert(got === want)
  }

  test("skipGramPairs: ±win sequence neighbors, per-user isolation") {
    import spark.implicits._
    // u1 sequence: A B C (ts order); u2: A alone (no pairs)
    val d = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 09:01:00"), 2L, "B"),
      (1L, ts("2024-01-01 09:02:00"), 3L, "C"),
      (2L, ts("2024-01-01 09:00:00"), 4L, "A"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.skipGramPairs(d, col("user_id"), col("ts"),
        col("event_id"), col("event_type"), win = 1)
      .orderBy("center_type", "context_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // win=1: (A,B),(B,A),(B,C),(C,B) — u2's lone A pairs with nothing
    assert(got === Seq(("A", "B", 1L), ("B", "A", 1L), ("B", "C", 1L),
      ("C", "B", 1L)))
  }

  test("cappedConversion: boundary inclusive, pre-view purchases don't count") {
    import spark.implicits._
    val d = Seq(
      // u1: converts exactly at the 7-day boundary -> counts
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-08 00:00:00"), "purchase"),
      // u2: converts one second past the cap -> does not count
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (2L, ts("2024-01-08 00:00:01"), "purchase"),
      // u3: purchase BEFORE the first view -> does not count
      (3L, ts("2024-01-05 00:00:00"), "purchase"),
      (3L, ts("2024-01-06 00:00:00"), "view"),
      // u4: viewer, never converts
      (4L, ts("2024-01-02 00:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val got = Analytics.cappedConversion(d, col("user_id"), col("ts"),
      col("event_type"), "view", "purchase", days = 7).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2))
      === ((4L, 1L, 2500L)))
  }

  test("sweepConcurrency: overlapping intervals stack; empty interval nets zero") {
    import spark.implicits._
    // [1,4), [2,3), [5,5) (empty), [2,6)
    val d = Seq((1L, 4L), (2L, 3L), (5L, 5L), (2L, 6L)).toDF("s", "e")
    val got = Analytics.sweepConcurrency(d, col("s"), col("e"))
      .orderBy("at").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // day1: +1 -> 1; day2: +2 -> 3; day3: -1 -> 2; day4: -1 -> 1;
    // day5: +1-1 -> net 0, still 1; day6: -1 -> 0
    assert(got === Seq((1L, 1L, 1L), (2L, 2L, 3L), (3L, -1L, 2L),
      (4L, -1L, 1L), (5L, 0L, 1L), (6L, -1L, 0L)))
  }

  test("paretoFrontier2d: continuous cost domain (all costs distinct) stays exact") {
    import spark.implicits._
    // every cost unique -> |distinct costs| == |rows|, the regime the
    // two-level bucketed prefix exists for; preBuckets far below and
    // above the row count must agree with brute force
    val rnd = new scala.util.Random(7)
    val pts = (1L to 500L).map(i => (i, i * 13 % 9973, rnd.nextInt(1000).toLong))
    val want = pts.filter { case (_, c, g) =>
      !pts.exists { case (_, c2, g2) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g)
      }
    }.map(_._1).toSet
    for (pb <- Seq(4, 64, 4096)) {
      val got = Analytics.paretoFrontier2d(
          pts.toDF("id", "cost", "gain"),
          col("id"), col("cost"), col("gain"), preBuckets = pb)
        .collect().map(_.getLong(0)).toSet
      assert(got === want, s"preBuckets=$pb")
    }
  }

  test("paretoFrontier2d: duplicate frontier points all survive") {
    import spark.implicits._
    val d = Seq((1L, 10L, 5L), (2L, 10L, 5L), (3L, 10L, 4L), (4L, 20L, 9L))
      .toDF("id", "cost", "gain")
    val got = Analytics.paretoFrontier2d(d, col("id"), col("cost"),
      col("gain")).collect().map(_.getLong(0)).toSet
    // 3 is dominated by 1/2 (same cost, less gain); 4 gains more at a
    // higher cost -> frontier; 1 and 2 tie exactly -> both kept
    assert(got === Set(1L, 2L, 4L))
  }
}
