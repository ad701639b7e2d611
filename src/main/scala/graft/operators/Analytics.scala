package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over a (user, timestamp, event-type) feed —
  * the query family the reference's domain (channel/video engagement
  * analytics) runs on top of its mart: ordered funnels, retention
  * cohorts, and dimension-history (SCD2) builds.
  *
  * All three operators shuffle ONLY on the user key (funnel: one
  * exchange per stage, all on the same key so AQE reuses the
  * partitioning; retention: a single groupBy(user) — the per-user week
  * set is bounded by the calendar, so the collect_set explode is safe at
  * any corpus size; SCD2: one window partitioning). Nothing collects to
  * the driver; final stage/cohort aggregates are a handful of rows.
  */
object Analytics {

  /** Ordered funnel: how many users reach each stage, where stage i+1
    * counts only events STRICTLY AFTER the user's first stage-i event
    * (the standard "did the click happen after the view" contract —
    * min-ts chaining, not mere presence).
    *
    * Output: (stage, stage_name, n_users), one row per stage.
    *
    * Scale shape: stage 1 is a map-side-combined min-agg keyed on user;
    * each later stage joins the (shrinking) reached-set back to the
    * events scan on the SAME user key — co-partitioned exchanges, no
    * broadcast needed even when the reached-set is huge. The per-stage
    * count collapses to one row; stages union to |stages| rows.
    */
  def funnel(df: DataFrame, user: Column, ts: Column, typ: Column,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val ev = df.select(user.as("uid"), ts.as("ts"), typ.as("et"))
    val reached: Seq[DataFrame] = stages.zipWithIndex
      .foldLeft(Vector.empty[DataFrame]) { case (acc, (stage, i)) =>
        val hits = ev.filter(col("et") === stage)
        val r =
          if (i == 0) hits.groupBy("uid").agg(min("ts").as("reached_ts"))
          else hits.join(acc.last.select(col("uid"), col("reached_ts").as("prev_ts")), "uid")
            .filter(col("ts") > col("prev_ts"))
            .groupBy("uid").agg(min("ts").as("reached_ts"))
        acc :+ r
      }
    reached.zip(stages).zipWithIndex.map { case ((r, name), i) =>
      r.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(name).as("stage_name"),
          col("n_users"))
    }.reduce(_.unionByName(_)).orderBy("stage")
  }

  /** Weekly retention cohorts: users grouped by the week of their FIRST
    * event; cell (cohort_week, week_offset) counts the cohort's users
    * active `week_offset` weeks later.
    *
    * Scale shape: ONE shuffle — groupBy(user) collecting the user's
    * distinct active weeks (bounded by the calendar: a user active every
    * week for 20 years is ~1000 entries — a hard structural bound, not a
    * data-dependent one). Cohort = the array min; the explode emits one
    * row per (user, active week), already distinct, so the final
    * (cohort, offset) agg needs count(*), not a count-distinct expand.
    */
  def retentionCohorts(df: DataFrame, user: Column, ts: Column): DataFrame = {
    val perUser = df
      // DATE-typed weeks (date_trunc returns a midnight timestamp; the
      // calendar week is a date-domain concept and engines agree on it)
      .select(user.as("uid"), date_trunc("week", ts).cast("date").as("wk"))
      .groupBy("uid").agg(array_sort(collect_set("wk")).as("wks"))
    perUser
      .select(element_at(col("wks"), 1).as("cohort_week"),
        explode(col("wks")).as("wk"))
      .select(col("cohort_week"),
        graft.functions.IntMath.intDiv(
          datediff(col("wk"), col("cohort_week")).cast("long"), lit(7L))
          .cast("int").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** SCD2 dimension-history build from a change feed: per key, collapse
    * consecutive equal attribute values (classic SCD2 compression), then
    * emit versioned rows with [effective_from, effective_to) validity —
    * effective_to NULL = the current version. The incremental-warehouse
    * sibling of `Warehouse.upsert` (q88 keeps only latest-wins; this
    * keeps the full history a point-in-time join needs).
    *
    * `version_id` = the event id that OPENED the version: a unique
    * tiebreaker so the output has a total order even if two versions of
    * one key share a timestamp.
    *
    * Scale shape: one window partitioning on the key serves both passes
    * (change-detection lag, then validity lead over the compressed
    * rows — Catalyst plans one exchange + one sort). No driver state.
    */
  def scd2(df: DataFrame, key: Column, ts: Column, ordId: Column,
           attr: Column): DataFrame = {
    val w = Window.partitionBy("k").orderBy("ts", "oid")
    val changed = df
      .select(key.as("k"), ts.as("ts"), ordId.as("oid"), attr.as("attr"))
      .withColumn("prev", lag("attr", 1).over(w))
      .filter(col("prev").isNull || col("attr") =!= col("prev"))
    changed
      .withColumn("effective_to", lead("ts", 1).over(w))
      .select(col("k"), col("oid").as("version_id"), col("attr"),
        col("ts").as("effective_from"), col("effective_to"),
        col("effective_to").isNull.as("is_current"))
  }

  /** First/last-touch attribution: every conversion event is annotated
    * with the id of the user's FIRST touch event ever and the LAST
    * touch at-or-before the conversion (order (ts, ordId) — a touch in
    * the same instant attributes if its ordId sorts earlier). NULL
    * touch ids = organic conversion (no touch yet). The classic
    * marketing-attribution primitive over a (user, ts, type) feed.
    *
    * Scale shape: ONE user-keyed exchange feeding both running
    * first/last windows; conversions filter AFTER the windows (the
    * windows need the full feed), everything else per-row.
    */
  def touchAttribution(df: DataFrame, user: Column, ts: Column,
                       ordId: Column, typ: Column, value: Column,
                       touchType: String, convType: String): DataFrame = {
    val w = Window.partitionBy("u").orderBy("ts", "oid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touchId = when(col("typ") === touchType, col("oid"))
    df.select(user.as("u"), ts.as("ts"), ordId.as("oid"),
        typ.as("typ"), value.as("v"))
      .withColumn("first_touch_id", first(touchId, ignoreNulls = true).over(w))
      .withColumn("last_touch_id", last(touchId, ignoreNulls = true).over(w))
      .filter(col("typ") === convType)
      .select(col("oid").as("conversion_id"), col("u").as("user_id"),
        col("v").as("value"), col("first_touch_id"), col("last_touch_id"))
  }

  /** Time-series resample to a daily grid + last-observation-carried-
    * forward: per key, every calendar day from the key's first to last
    * active day; gap days (no events) carry the previous day's closing
    * value. The missing-row repair every downstream rolling metric
    * needs — a rolling average over a feed with holes silently shortens
    * its denominator.
    *
    * Per (key, day): n_events = row count, close = value of the day's
    * last event (ts desc, ordId desc — deterministic under ts ties).
    * Grid days get n_events = 0, is_gap = true, value_locf = previous
    * close.
    *
    * Scale shape: the daily rollup is ONE (key, day) shuffle (the
    * row_number window and the aggregate share it); the grid explode is
    * bounded by key-count x calendar span — independent of event volume,
    * the whole point of resampling; the LOCF window partitions by key
    * with calendar-bounded partitions. Nothing global, nothing on the
    * driver.
    */
  def gapFillLocf(df: DataFrame, key: Column, ts: Column, ordId: Column,
                  value: Column): DataFrame = {
    val base = df.select(key.as("k"), ts.as("ts"), ordId.as("oid"),
        value.as("v"))
      .withColumn("day", to_date(col("ts")))
    val wDay = Window.partitionBy("k", "day")
      .orderBy(col("ts").desc, col("oid").desc)
    val daily = base
      .withColumn("rn", row_number().over(wDay))
      .groupBy("k", "day")
      .agg(count(lit(1)).as("n_events"),
        max(when(col("rn") === 1, col("v"))).as("close"))
    val grid = daily.groupBy("k")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("k"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val wLocf = Window.partitionBy("k").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("k", "day"), "left")
      .select(col("k").as("key"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last("close", ignoreNulls = true).over(wLocf).as("value_locf"),
        col("n_events").isNull.as("is_gap"))
  }

  /** SKIP-GRAM (center, context) pair extraction over per-user event
    * sequences — the word2vec-style data-prep shape applied to
    * behavioral streams: for every event, its neighbors within ±`win`
    * SEQUENCE positions (ties ordered by (ts, ordId)) become context,
    * and the output is the (center_type, context_type) co-occurrence
    * matrix those pairs induce — the input a session-embedding trainer
    * consumes.
    *
    * Pairing is window-free after the per-user rank: each event EMITS
    * probe ranks rn±1…rn±win and ONE (user, rank) equi-join resolves
    * them (the q187 trick) — fan-out exactly 2·win, no self-join range
    * predicate, no window over pairs. Scale shape: one user-keyed
    * exchange for the rank, one (user, rank)-keyed join, one tiny
    * |types|² aggregate.
    */
  def skipGramPairs(df: DataFrame, user: Column, ts: Column, ordId: Column,
                    typ: Column, win: Int,
                    pairBudget: Long = 1000000000L): DataFrame = {
    require(win >= 1, "skipGramPairs needs win >= 1")
    val base = df.select(user.as("u"), ts.as("ts"), ordId.as("oid"),
        typ.as("typ"))
      .cache() // guard count + rank window share one scan; lazy-output
               // operator, so release is the CALLER's (clearCache /
               // unpersist after materializing — AdmissionGuard rule 5)
    // ADMISSION GUARD (AdmissionGuard, the q174 discipline): each row
    // emits exactly 2·win probes, so 2·win·|rows| bounds the pair
    // fan-out from above (boundary rows emit fewer). Linear in the
    // corpus for fixed win — but a caller passing a corpus-scale win
    // (skip-grams over whole sessions) reinvents the quadratic
    // self-join; the bound names that before the shuffle pays for it.
    AdmissionGuard.admit("skipGramPairs", "probe fan-out bound",
      AdmissionGuard.measuredBound(base, count(lit(1)) * (2L * win)),
      "pairBudget", pairBudget,
      "The per-row probe fan-out 2*win at this corpus size exceeds " +
        "the budget; shrink win or pre-filter the event stream to " +
        "the sequence slice the trainer actually consumes.")
    val ranked = base
      .withColumn("rn", row_number().over(
        Window.partitionBy("u").orderBy("ts", "oid")))
    val deltas = (-win to win).filter(_ != 0)
    val probes = ranked.select(col("u"), col("typ").as("center_type"),
      explode(array(deltas.map(d => col("rn") + d): _*)).as("rn2"))
    probes.join(ranked.select(col("u"), col("rn").as("rn2"),
        col("typ").as("context_type")), Seq("u", "rn2"))
      .groupBy("center_type", "context_type")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Time-CAPPED conversion: of the users who performed `fromType`, how
    * many performed `toType` strictly after their FIRST `fromType` and
    * within `days` days of it — the windowed variant of the unbounded
    * funnel ([[funnel]]), the number an attribution window actually
    * reports. Boundary is inclusive (ts ≤ t0 + days), exact at
    * microsecond granularity on both engines.
    *
    * Scale shape: first-touch table is one user-keyed aggregate; the
    * conversion probe joins on the same user key (partitioning reused);
    * the result is two counts and a ratio — constant-size output, no
    * window functions at all.
    */
  def cappedConversion(df: DataFrame, user: Column, ts: Column,
                       typ: Column, fromType: String, toType: String,
                       days: Int): DataFrame = {
    val base = df.select(user.as("u"), ts.as("ts"), typ.as("typ"))
    val v = base.filter(col("typ") === fromType)
      .groupBy("u").agg(min("ts").as("t0"))
    val conv = base.filter(col("typ") === toType).join(v, "u")
      .filter(col("ts") > col("t0") &&
        col("ts") <= col("t0") + expr(s"INTERVAL $days DAYS"))
      .select("u").distinct()
    v.agg(count(lit(1)).as("n_viewers"))
      .crossJoin(broadcast(conv.agg(count(lit(1)).as("n_converted"))))
      .select(col("n_viewers"), col("n_converted"),
        expr("(10000 * n_converted) div n_viewers").as("conversion_bp"))
  }

  /** Interval-overlap sweep line: how many intervals [start, endEx) are
    * active on each day the count CHANGES — the max-concurrency /
    * occupancy primitive (concurrent sessions, in-transit shipments,
    * active subscriptions). Classic sweep: +1 at start, −1 at endEx,
    * prefix-sum in event-time order.
    *
    * Scale shape: the corpus collapses FIRST via one algebraic
    * groupBy(day) (map-side partial sums — the exchange carries
    * |distinct days| rows, calendar-bounded, no matter how many billion
    * intervals); the prefix sum then runs over that bounded table. The
    * single-partition window touches days, never rows — same bargain as
    * [[paretoFrontier2d]]'s cost table. Days where nothing changes
    * don't appear; the running count is still exact for every emitted
    * day.
    */
  def sweepConcurrency(df: DataFrame, start: Column, endEx: Column): DataFrame = {
    val deltas = df.select(start.as("at"), lit(1L).as("delta"))
      .unionAll(df.select(endEx.as("at"), lit(-1L).as("delta")))
      .groupBy("at").agg(sum("delta").as("net_change"))
    val w = Window.orderBy("at")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("concurrent", sum("net_change").over(w))
  }

  /** 2-D Pareto frontier (skyline): rows minimizing `cost` while
    * maximizing `gain` — row r survives iff NO row beats it weakly in
    * both dimensions and strictly in one. Exact duplicates of a
    * frontier point all survive (neither dominates the other).
    *
    * NOT the textbook O(n²) dominance anti-join: 2-D dominance
    * decomposes through per-cost maxima —
    *   frontier(r) ⟺ r.gain = max gain at r.cost
    *                 AND max gain at any STRICTLY cheaper cost < r.gain
    * — so the plan is (1) one algebraic groupBy(cost) collapsing the
    * corpus to |distinct costs| rows, (2) a TWO-LEVEL prefix-max over
    * that table — range-bucket the cost domain into `preBuckets`
    * buckets (monotone in cost, so strictly-cheaper = earlier bucket ∪
    * earlier-in-bucket), take per-bucket maxima, run the global window
    * only over the ≤ preBuckets bucket rows, and the per-cost window
    * partitioned BY bucket — (3) one broadcast join back to recover
    * the surviving rows. No window ever sees more than ~|distinct
    * costs|/preBuckets rows, so a CONTINUOUS cost domain (|costs| ≈
    * |rows|) cannot collapse the prefix scan onto one partition (the
    * Rank.globalRank bargain; previously this window was unpartitioned
    * and fine only for bounded integer cost domains).
    *
    * `cost` must be integer-typed (cast decimals to scaled longs first
    * — the same engine-stable rule as every oracle contract in this
    * repo).
    */
  def paretoFrontier2d(df: DataFrame, id: Column, cost: Column,
                       gain: Column, preBuckets: Int = 256): DataFrame = {
    require(preBuckets >= 2, "preBuckets must be >= 2")
    val base = df.select(id.as("id"), cost.cast("long").as("cost"),
      gain.cast("long").as("gain"))
    val perCost = base.groupBy("cost").agg(max("gain").as("mg"))
    val mm = perCost.agg(min("cost").cast("double").as("pf_lo"),
      max("cost").cast("double").as("pf_hi"))
    val pre = when(col("pf_hi") === col("pf_lo"), lit(0))
      .otherwise(least(lit(preBuckets - 1),
        floor((col("cost").cast("double") - col("pf_lo")) /
          (col("pf_hi") - col("pf_lo")) * preBuckets)))
      .cast("int")
    val b = perCost.crossJoin(broadcast(mm))
      .withColumn("pf_bucket", pre).drop("pf_lo", "pf_hi")
    // bucket-level running max over the ≤ preBuckets-row side table —
    // the deliberate tiny single-partition window (same class as
    // Rank.globalRank's offsets)
    val prevBuckets = b.groupBy("pf_bucket").agg(max("mg").as("bm"))
      .withColumn("pf_prev",
        max("bm").over(Window.orderBy("pf_bucket")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select("pf_bucket", "pf_prev")
    val wIn = Window.partitionBy("pf_bucket").orderBy("cost")
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierCosts = b.join(broadcast(prevBuckets), "pf_bucket")
      // greatest ignores nulls: max over strictly-cheaper costs =
      // earlier-in-bucket running max ∪ previous buckets' max
      .withColumn("pm", greatest(max("mg").over(wIn), col("pf_prev")))
      .filter(col("pm").isNull || col("pm") < col("mg"))
      .select(col("cost"), col("mg").as("gain"))
    base.join(broadcast(frontierCosts), Seq("cost", "gain"), "left_semi")
      .select(col("id"), col("cost"), col("gain"))
  }
}
