package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Analytics
import graft.util.Tables

/** Event-sequence analytics pack over `events` — the funnel / retention
  * / dimension-history queries the reference's engagement-analytics
  * domain runs downstream of its mart (graft.operators.Analytics).
  */
object AnalyticsQueries {

  val qs: Seq[Q] = Seq(

    // q91 — ordered funnel view → click → purchase: stage i+1 counts
    // only events strictly after the user's first stage-i event
    // (min-ts chaining). Each stage is a user-keyed min-agg / join —
    // same key every exchange, so the partitioning is reused; per-stage
    // counts collapse to one row each.
    Q("q91_funnel",
      (s, d) => Analytics.funnel(Tables(s, d, "events"),
        col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase")),
      Some("""WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id)
        |SELECT 1 AS stage, 'view' AS stage_name, count(*) AS n_users FROM s1
        |UNION ALL
        |SELECT 2, 'click', count(*) FROM s2
        |UNION ALL
        |SELECT 3, 'purchase', count(*) FROM s3
        |ORDER BY stage""".stripMargin),
      "ordered funnel (strictly-after min-ts chaining), user-keyed stage joins"),

    // q92 — weekly retention cohorts: cohort = week of first event;
    // cell (cohort_week, week_offset) = cohort users active that many
    // weeks later. ONE user-keyed shuffle: the per-user distinct-week
    // set is calendar-bounded, so it rides in a collect_set and the
    // explode emits already-distinct (user, week) rows — the final agg
    // is a plain count, no count-distinct expand.
    Q("q92_retention_cohorts",
      (s, d) => Analytics.retentionCohorts(Tables(s, d, "events"),
        col("user_id"), col("ts")),
      Some("""WITH a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
        |  FROM events),
        |f AS (SELECT user_id, min(wk) AS cohort_week FROM a GROUP BY user_id)
        |SELECT f.cohort_week,
        |  CAST(date_diff('day', f.cohort_week, a.wk) // 7 AS INTEGER) AS week_offset,
        |  count(*) AS n_users
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin),
      "weekly retention cohort matrix in one user-keyed shuffle"),

    // q93 — SCD2 dimension history from the events change feed:
    // consecutive equal event_types per user collapse to one version;
    // versions carry [effective_from, effective_to) validity with
    // effective_to NULL = current. version_id = the opening event_id
    // (unique total order even under timestamp ties). One window
    // partitioning serves both the change-detect lag and validity lead.
    Q("q93_scd2_history",
      (s, d) => Analytics.scd2(Tables(s, d, "events"),
          col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumnRenamed("k", "user_id")
        .orderBy("user_id", "effective_from", "version_id"),
      Some("""WITH o AS (SELECT user_id, event_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT user_id, event_id, ts, event_type FROM o
        |  WHERE prev IS NULL OR event_type <> prev)
        |SELECT user_id, event_id AS version_id, event_type AS attr,
        |  ts AS effective_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM c ORDER BY user_id, effective_from, version_id""".stripMargin),
      "SCD2 history build: change-compressed versions with validity ranges"),

    // q96 — one-pass table profiling (the ANALYZE-TABLE surface): per
    // column, nulls, exact distinct cardinality, an HLL sketch audited
    // against it (q54 pattern — the sketch is the 100 TB path, the audit
    // justifies it, so the oracle asserts TRUE), and min/max as strings.
    // ONE aggregation job covers all columns; the per-column reshape is
    // an explode of the single aggregated row.
    Q("q96_table_profile",
      (s, d) => graft.operators.DataProfile.profile(
        Tables(s, d, "lineitem"),
        Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")),
      Some("""SELECT * FROM (
        |  SELECT 'l_orderkey' AS "column", count(*) AS n_rows,
        |    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
        |    TRUE AS approx_ok,
        |    CAST(min(l_orderkey) AS VARCHAR) AS min_value,
        |    CAST(max(l_orderkey) AS VARCHAR) AS max_value
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linenumber', count(*),
        |    CAST(sum(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT l_linenumber) AS BIGINT), TRUE,
        |    CAST(min(l_linenumber) AS VARCHAR), CAST(max(l_linenumber) AS VARCHAR)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', count(*),
        |    CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT l_returnflag) AS BIGINT), TRUE,
        |    CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_shipdate', count(*),
        |    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT l_shipdate) AS BIGINT), TRUE,
        |    CAST(min(l_shipdate) AS VARCHAR), CAST(max(l_shipdate) AS VARCHAR)
        |  FROM lineitem)
        |ORDER BY "column"""".stripMargin),
      "one-pass multi-column profile: nulls, exact+HLL-audited distinct, min/max"),

    // q98 — POINT-IN-TIME join: every event enriched with the SCD2
    // version (q93) valid at its timestamp — the composition a real
    // warehouse runs constantly (fact rows joined to the dimension AS
    // OF the fact time, never the current row). Versions opened at the
    // same instant collapse to the last one (the earlier interval is
    // empty — replayed by the oracle's interval predicate), satisfying
    // AsOfJoin's one-row-per-(key, time) determinism contract; the join
    // itself is the union+window asof composition — ONE user-keyed
    // window pass, no per-key range explosion.
    Q("q98_pit_join",
      (s, d) => {
        val ev = Tables(s, d, "events")
          .select(col("event_id"), col("user_id"), col("ts"))
        val versions = Analytics.scd2(Tables(s, d, "events"),
          col("user_id"), col("ts"), col("event_id"), col("event_type"))
        val oneOpenPerInstant = graft.plans.TopK.perKey(
          versions.select(col("k"), col("version_id"), col("attr"),
            col("effective_from")),
          Seq("k", "effective_from"), "version_id",
          desc = true, tiebreak = Seq.empty, k = 1)
        graft.operators.AsOfJoin.asof(ev, oneOpenPerInstant,
            col("user_id"), col("k"), col("ts"), col("effective_from"),
            payload = Seq(col("attr") -> "attr"))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("__match").getField("attr").as("attr_at_event"))
          .orderBy("event_id")
      },
      Some("""WITH o AS (SELECT user_id, event_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT user_id, event_id, ts, event_type FROM o
        |  WHERE prev IS NULL OR event_type <> prev),
        |v AS (SELECT user_id, event_id AS version_id, event_type AS attr,
        |    ts AS ef,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS et
        |  FROM c)
        |SELECT e.event_id, e.user_id, e.ts, v.attr AS attr_at_event
        |FROM events e LEFT JOIN v
        |  ON e.user_id = v.user_id AND e.ts >= v.ef
        |  AND (v.et IS NULL OR e.ts < v.et)
        |ORDER BY e.event_id""".stripMargin),
      "point-in-time join: facts enriched with the SCD2 version valid at fact time"),

    // q99 — incremental AGGREGATE maintenance (the aggregate sibling of
    // q88's row upsert): per-user aggregates stored as algebraic
    // partials (count + integral basis-point sum), history and the new
    // batch aggregated separately and MERGED — O(|batch|) nightly work,
    // never a history rescan — with the oracle doing the full recompute
    // the merge must equal. Long addition is order-independent, so the
    // equality is exact, not approximate.
    Q("q99_incremental_agg",
      (s, d) => {
        import graft.warehouse.Warehouse
        val ev = Tables(s, d, "events").select(col("user_id"), col("ts"),
          round(col("value") * 10000).cast("long").as("vbp"))
        val cutoff = "2024-01-15 00:00:00"
        val history = ev.filter(col("ts") < lit(cutoff).cast("timestamp"))
        val batch = ev.filter(col("ts") >= lit(cutoff).cast("timestamp"))
        Warehouse.mergeAggState(
            Seq(Warehouse.aggState(history, Seq("user_id"), col("vbp")),
              Warehouse.aggState(batch, Seq("user_id"), col("vbp"))),
            Seq("user_id"))
          .select(col("user_id"), col("n_rows").as("n_events"),
            (col("total_bp") / 10000.0).as("total_value"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
        |    / 10000.0 AS total_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      "incremental aggregate maintenance: merged algebraic partials == full recompute"),

    // q103 — Z-ORDER clustering stats: Morton-interleave the 8-bit
    // reduced (customer, order-day) dimensions and report per-z-bucket
    // row counts + BOTH dimensions' min/max — the file-level statistics
    // a scan planner prunes on, so the clustering claim is itself the
    // oracle-checked result: each of the 64 buckets pins the top 3 bits
    // of BOTH dimensions (span ≤ 32 of 256 in each — an 8x pruning cut
    // per dimension that a single-column sort can only give its leading
    // column). The z-value is a pure codegen'd shift/mask fold; the
    // layout job at scale is repartitionByRange on it + write.
    Q("q103_zorder_stats",
      (s, d) => graft.operators.ZOrder.bucketStats(
        Tables(s, d, "orders"),
        col("o_custkey") % 256L,
        (datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")) % 256).cast("long"),
        bits = 8, shift = 10),
      Some(s"""WITH b AS (SELECT o_custkey % 256 AS x,
        |    date_diff('day', DATE '1970-01-01', o_orderdate::DATE) % 256 AS y
        |  FROM orders),
        |z AS (SELECT x, y, ${(0 until 8).map(i =>
             s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
             .mkString(" + ")} AS zv FROM b)
        |SELECT zv // 1024 AS z_bucket, count(*) AS n_rows,
        |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
        |FROM z GROUP BY 1 ORDER BY z_bucket""".stripMargin),
      "z-order clustering: per-Morton-bucket min/max spans of both dimensions"),

    // q113 — daily resample + LOCF gap fill: per user, the full calendar
    // grid from first to last active day; days with no events carry the
    // previous day's closing value (last event by ts desc, event_id
    // desc) forward. value_locf is a raw passthrough of parquet doubles
    // — no arithmetic, so no rounding is needed for cross-engine
    // equality. The grid explode is calendar-bounded (users x ~30 days),
    // independent of event volume.
    Q("q113_gap_fill_locf",
      (s, d) => Analytics.gapFillLocf(Tables(s, d, "events"),
          col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumnRenamed("key", "user_id")
        .orderBy("user_id", "day"),
      Some("""WITH base AS (SELECT user_id AS k, ts, event_id, value,
        |    CAST(ts AS DATE) AS day FROM events),
        |rn AS (SELECT k, day, value,
        |    row_number() OVER (PARTITION BY k, day
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM base),
        |daily AS (SELECT k, day, count(*) AS n_events,
        |    max(CASE WHEN rn = 1 THEN value END) AS close
        |  FROM rn GROUP BY k, day),
        |mm AS (SELECT k, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY k),
        |grid AS (SELECT k, CAST(unnest(generate_series(d0::TIMESTAMP,
        |    d1::TIMESTAMP, INTERVAL 1 DAY)) AS DATE) AS day FROM mm)
        |SELECT g.k AS user_id, g.day,
        |  coalesce(d.n_events, 0) AS n_events,
        |  last_value(d.close IGNORE NULLS) OVER (PARTITION BY g.k
        |    ORDER BY g.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS value_locf,
        |  d.n_events IS NULL AS is_gap
        |FROM grid g LEFT JOIN daily d ON g.k = d.k AND g.day = d.day
        |ORDER BY user_id, g.day""".stripMargin),
      "daily grid resample with LOCF fill (calendar-bounded explode, user-keyed shuffles)"),

    // q122 — MAD outlier detection (robust anomaly flagging): per event
    // type, median |x - median| in exact integer cents via TWO rounds
    // of the GroupedQuantile distributed selection, then count values
    // beyond 3xMAD — the robust-statistics outlier rule that, unlike
    // mean/stddev z-scores, is itself immune to the outliers it hunts.
    // Everything integer: cents in, deviations in cents, the 3xMAD
    // threshold a pure long compare — nothing to drift cross-engine.
    Q("q122_mad_outliers",
      (s, d) => {
        import graft.operators.GroupedQuantile
        val e = Tables(s, d, "events").select(col("event_type").as("g"),
          round(col("value") * 100, 0).cast("long").as("v"),
          col("event_id").as("t"))
        val med = GroupedQuantile.kthSmallestLong(e, col("g"), col("v"),
            col("t"), GroupedQuantile.lowerMedianRank)
          .withColumnRenamed("kth_value", "med")
        val dev = e.join(broadcast(med), "g")
          .select(col("g"), abs(col("v") - col("med")).as("v"), col("t"))
        val mad = GroupedQuantile.kthSmallestLong(dev, col("g"), col("v"),
            col("t"), GroupedQuantile.lowerMedianRank)
          .withColumnRenamed("kth_value", "mad")
        e.join(broadcast(med), "g").join(broadcast(mad), "g")
          .groupBy("g", "med", "mad")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(abs(col("v") - col("med")) > lit(3L) * col("mad"), 1L)
              .otherwise(0L)).as("n_outliers"))
          .select(col("g").as("event_type"), col("n_rows"),
            (col("med") / 100.0).as("median_value"),
            (col("mad") / 100.0).as("mad_value"), col("n_outliers"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type AS g,
        |    CAST(round(value * 100, 0) AS BIGINT) AS v, event_id AS t
        |  FROM events),
        |r1 AS (SELECT g, v,
        |    row_number() OVER (PARTITION BY g ORDER BY v, t) AS rn,
        |    count(*) OVER (PARTITION BY g) AS n FROM e),
        |med AS (SELECT g, max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS med
        |  FROM r1 GROUP BY g),
        |d AS (SELECT e.g, abs(e.v - med.med) AS v, e.t
        |  FROM e JOIN med ON e.g = med.g),
        |r2 AS (SELECT g, v,
        |    row_number() OVER (PARTITION BY g ORDER BY v, t) AS rn,
        |    count(*) OVER (PARTITION BY g) AS n FROM d),
        |mad AS (SELECT g, max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS mad
        |  FROM r2 GROUP BY g)
        |SELECT e.g AS event_type, count(*) AS n_rows,
        |  med.med / 100.0 AS median_value, mad.mad / 100.0 AS mad_value,
        |  CAST(sum(CASE WHEN abs(e.v - med.med) > 3 * mad.mad
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM e JOIN med ON e.g = med.g JOIN mad ON e.g = mad.g
        |GROUP BY e.g, med.med, mad.mad ORDER BY event_type""".stripMargin),
      "exact-integer MAD outlier counts per event type (two distributed selections)"),

    // q124 — first/last-touch attribution: every purchase annotated
    // with the user's first click ever and last click at-or-before the
    // purchase ((ts, event_id) order). NULL = organic (purchase before
    // any click). Purchase value passes through as raw parquet doubles
    // — no arithmetic, no rounding needed. One user-keyed shuffle.
    Q("q124_touch_attribution",
      (s, d) => Analytics.touchAttribution(Tables(s, d, "events"),
          col("user_id"), col("ts"), col("event_id"), col("event_type"),
          col("value"), touchType = "click", convType = "purchase")
        .orderBy("conversion_id"),
      Some("""SELECT event_id AS conversion_id, user_id, value,
        |  first_touch_id, last_touch_id
        |FROM (SELECT user_id, event_id, event_type, value,
        |    first_value(CASE WHEN event_type = 'click' THEN event_id END
        |      IGNORE NULLS) OVER w AS first_touch_id,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END
        |      IGNORE NULLS) OVER w AS last_touch_id
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |WHERE event_type = 'purchase'
        |ORDER BY conversion_id""".stripMargin),
      "first/last-touch conversion attribution (running ignore-nulls windows, one user shuffle)"),

    // q129 — MARKET-BASKET co-occurrence: top supplier PAIRS appearing
    // in the same order — the association-mining primitive behind
    // "frequently bought together". The pair space is generated by an
    // order-keyed SELF-JOIN over the per-order DISTINCT supplier set:
    // baskets are size-bounded (<= 7 lineitems per order), so the
    // per-key fan-out is <= C(7,2) = 21 pairs — linear in order count,
    // the same bounded-pair argument as the dedup bucket caps; the
    // operator still measures Σ C(|basket|,2) and refuses over its
    // pairBudget (AdmissionGuard — it cannot assume its caller's data
    // model bounds baskets). a < b
    // deduplicates orientation; ONE co-partitioned shuffle.
    Q("q129_basket_pairs",
      (s, d) =>
        // Array fan-out, not a basket self-join: collect_set dedups the
        // (order, supplier) rows inside the agg state; the sorted array
        // emits its C(n,2) pairs in codegen (functions/ArrayPairs),
        // behind the shared AdmissionGuard pair-budget check.
        graft.operators.Itemsets.basketPairs(Tables(s, d, "lineitem"),
            col("l_orderkey"), col("l_suppkey"))
          .select(col("item_a").as("s_a"), col("item_b").as("s_b"),
            col("n_baskets").as("n_orders"))
          .orderBy(col("n_orders").desc, col("s_a"), col("s_b"))
          .limit(20),
      Some("""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |  FROM lineitem)
        |SELECT a.sk AS s_a, b.sk AS s_b, count(*) AS n_orders
        |FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk
        |GROUP BY 1, 2 ORDER BY n_orders DESC, s_a, s_b LIMIT 20""".stripMargin),
      "market-basket supplier pair counts (bounded per-order fan-out, one shuffle)"),

    // q131 — DISTRIBUTION DRIFT monitor: total-variation distance
    // between the first and second half of the month, per event type —
    // the "did yesterday's feed change shape?" check a production
    // pipeline alerts on. Value distributions are 20 equi-width buckets
    // over integer cents with a PURE-INTEGER bucket formula (no double
    // arithmetic anywhere), and TVD = Σ|n1·N2 − n2·N1| / (2·N1·N2)
    // in exact half-up basis points. The integer sibling of PSI/KL —
    // those need ln(), which cannot cross engines exactly.
    // ONE events shuffle (type, half, bucket); everything after is
    // bucket-count-sized.
    Q("q131_drift_tvd",
      (s, d) => {
        import graft.functions.IntMath
        val k = 20
        val e = Tables(s, d, "events").select(col("event_type").as("g"),
          when(col("ts") < lit("2024-01-16").cast("timestamp"), 1)
            .otherwise(2).as("half"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        val mm = e.agg(min("cents").as("lo"), max("cents").as("hi"))
        val b = e.crossJoin(broadcast(mm))
          .withColumn("bkt", least(lit(k - 1),
            IntMath.intDiv((col("cents") - col("lo")) * k,
              col("hi") - col("lo") + 1L)).cast("int"))
        val cnt = b.groupBy("g", "bkt")
          .agg(sum(when(col("half") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("half") === 2, 1L).otherwise(0L)).as("n2"))
        val tot = cnt.groupBy("g")
          .agg(sum("n1").as("t1"), sum("n2").as("t2"))
        cnt.join(broadcast(tot), "g")
          .groupBy("g", "t1", "t2")
          .agg(sum(abs(col("n1") * col("t2") - col("n2") * col("t1")))
            .as("num"))
          .select(col("g").as("event_type"), col("t1").as("n_first_half"),
            col("t2").as("n_second_half"),
            IntMath.halfUp(col("num"), lit(2L) * col("t1") * col("t2"), 10000L)
              .as("tvd_bp"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type AS g,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 2 END AS half,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
        |mm AS (SELECT min(cents) AS lo, max(cents) AS hi FROM e),
        |b AS (SELECT g, half,
        |    CAST(least(19, ((cents - lo) * 20) // (hi - lo + 1)) AS INTEGER)
        |      AS bkt FROM e, mm),
        |cnt AS (SELECT g, bkt,
        |    CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM b GROUP BY g, bkt),
        |tot AS (SELECT g, CAST(sum(n1) AS BIGINT) AS t1,
        |    CAST(sum(n2) AS BIGINT) AS t2 FROM cnt GROUP BY g)
        |SELECT cnt.g AS event_type, t1 AS n_first_half, t2 AS n_second_half,
        |  CAST((2 * sum(abs(n1 * t2 - n2 * t1)) * 10000 + 2 * t1 * t2)
        |    // (2 * (2 * t1 * t2)) AS BIGINT) AS tvd_bp
        |FROM cnt JOIN tot ON cnt.g = tot.g
        |GROUP BY cnt.g, t1, t2 ORDER BY event_type""".stripMargin),
      "distribution drift: exact-integer total-variation distance per event type"),

    // q132 — DAILY TRENDING ranks: each day's event types ranked by
    // volume, with the rank DELTA vs the previous day (positive =
    // climbing) — the dashboard "movers" query. Two windows: a
    // day-partitioned rank (bounded partitions: one per day) and a
    // type-partitioned lag over the tiny (day x type) rollup — the
    // fact table shuffles ONCE into the daily rollup, everything after
    // is calendar-sized.
    Q("q132_trending_rank_delta",
      (s, d) => {
        val daily = Tables(s, d, "events")
          .groupBy(to_date(col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val wDay = Window.partitionBy("day")
          .orderBy(col("n").desc, col("event_type"))
        val wType = Window.partitionBy("event_type").orderBy("day")
        daily
          .withColumn("rnk", row_number().over(wDay))
          .withColumn("rank_delta", lag("rnk", 1).over(wType) - col("rnk"))
          .orderBy("day", "rnk")
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day, event_type,
        |    count(*) AS n FROM events GROUP BY 1, 2),
        |r AS (SELECT day, event_type, n, CAST(row_number() OVER (
        |    PARTITION BY day ORDER BY n DESC, event_type) AS INTEGER) AS rnk
        |  FROM daily)
        |SELECT day, event_type, n, rnk,
        |  lag(rnk, 1) OVER (PARTITION BY event_type ORDER BY day) - rnk
        |    AS rank_delta
        |FROM r ORDER BY day, rnk""".stripMargin),
      "daily trending ranks with movers delta (one fact shuffle, calendar-sized windows)"),

    // q138 — SESSION PATH ANALYSIS: the top 20 three-step event-type
    // paths users take WITHIN a session (30-minute gap rule, q20's
    // semantics) — the product-analytics "what do people do next"
    // query. Session ids via the lag/running-sum fold, then each row
    // looks two steps ahead with lead() and keeps the trigram only when
    // all three steps share the session. ONE user-keyed shuffle serves
    // every window; the path rollup is map-side combined.
    Q("q138_session_paths",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val e = Tables(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("new_sess",
            when(lag("ts", 1).over(w).isNull ||
              unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(w))
                > 1800L, 1L).otherwise(0L))
          .withColumn("sid", sum("new_sess").over(wRun))
        val tri = e
          .withColumn("t1", lead("event_type", 1).over(w))
          .withColumn("t2", lead("event_type", 2).over(w))
          .withColumn("s1", lead("sid", 1).over(w))
          .withColumn("s2", lead("sid", 2).over(w))
          .filter(col("s1") === col("sid") && col("s2") === col("sid"))
          .select(concat_ws(">", col("event_type"), col("t1"), col("t2"))
            .as("path"))
        tri.groupBy("path").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path"))
          .limit(20)
      },
      Some("""WITH g AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) // 1000000 - epoch_us(lag(ts) OVER w) // 1000000
        |        > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, event_id, event_type,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g),
        |t AS (SELECT event_type, sid,
        |    lead(event_type, 1) OVER w AS t1, lead(event_type, 2) OVER w AS t2,
        |    lead(sid, 1) OVER w AS s1, lead(sid, 2) OVER w AS s2
        |  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_type || '>' || t1 || '>' || t2 AS path, count(*) AS n
        |FROM t WHERE s1 = sid AND s2 = sid
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin),
      "top 3-step in-session paths (one user shuffle serves session + lead windows)"),

    // q146 — ACTIVITY BITMAP index: each user's January activity as a
    // 31-bit mask (bit d-1 = active on day d) — the roaring-bitmap-style
    // encoding that turns retention/cohort set algebra into bitwise AND
    // on longs. mask = sum(DISTINCT 1<<(day-1)) — distinct powers of
    // two sum without carries, so the sum IS the OR, a pure two-level
    // agg on both engines; bit_count(mask) cross-checks the distinct-day
    // count in the same row.
    Q("q146_activity_bitmap",
      (s, d) => Tables(s, d, "events")
        .select(col("user_id"),
          expr("shiftleft(1L, day(ts) - 1)").as("daybit"))
        .groupBy("user_id")
        .agg(sum_distinct(col("daybit")).as("mask"))
        .select(col("user_id"), col("mask"),
          bit_count(col("mask")).cast("int").as("days_active"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
        |  CAST(sum(DISTINCT 1::BIGINT << (day(ts) - 1)) AS BIGINT) AS mask,
        |  CAST(bit_count(CAST(sum(DISTINCT 1::BIGINT << (day(ts) - 1))
        |    AS BIGINT)) AS INTEGER) AS days_active
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      "per-user day-activity bitmask (carry-free distinct power-of-two sum == OR)"),

    // q147 — TIME-TO-CONVERT percentiles: median and p90 seconds from a
    // user's first 'view' to their first 'purchase' strictly after it
    // (q91's stage-1→3 chaining), computed by the GroupedQuantile
    // distributed selection over a single logical group — no global
    // sort of the latency table. Latencies are exact integer seconds.
    Q("q147_conversion_latency",
      (s, d) => {
        import graft.operators.GroupedQuantile
        val e = Tables(s, d, "events")
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("vts"))
        val p = e.filter(col("event_type") === "purchase")
          .join(v, "user_id")
          .filter(col("ts") > col("vts"))
          .groupBy("user_id").agg(min(col("ts")).as("pts"), min("vts").as("vts"))
        val lat = p.select(col("user_id"),
          (unix_timestamp(col("pts")) - unix_timestamp(col("vts")))
            .as("lat_s"))
        val n = lat.agg(count(lit(1)).as("n_converted"))
        val med = GroupedQuantile.kthSmallestLong(
            lat.withColumn("g", lit(1)), col("g"), col("lat_s"),
            col("user_id"), GroupedQuantile.lowerMedianRank)
          .select(col("kth_value").as("median_s"))
        val p90 = GroupedQuantile.kthSmallestLong(
            lat.withColumn("g", lit(1)), col("g"), col("lat_s"),
            col("user_id"), GroupedQuantile.pctRank(90))
          .select(col("kth_value").as("p90_s"))
        n.crossJoin(broadcast(med)).crossJoin(broadcast(p90))
      },
      Some("""WITH v AS (SELECT user_id, min(ts) AS vts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS pts, min(v.vts) AS vts
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > v.vts
        |  GROUP BY e.user_id),
        |lat AS (SELECT user_id,
        |    epoch_us(pts) // 1000000 - epoch_us(vts) // 1000000 AS lat_s
        |  FROM p),
        |r AS (SELECT lat_s, row_number() OVER (ORDER BY lat_s, user_id) AS rn,
        |    count(*) OVER () AS n FROM lat)
        |SELECT CAST(max(n) AS BIGINT) AS n_converted,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN lat_s END) AS median_s,
        |  max(CASE WHEN rn = (90 * n + 99) // 100 THEN lat_s END) AS p90_s
        |FROM r""".stripMargin),
      "first-view→first-purchase latency median/p90 via distributed selection"),

    // q148 — SESSION LIFT matrix: for each event-type pair, how much
    // more often they co-occur in a session than independence predicts
    // — lift = P(a,b) / (P(a)·P(b)) = n_ab·n / (n_a·n_b) over session
    // baskets, in exact half-up basis points (10000 = independent).
    // Sessions from the q20/q138 gap fold; per-session distinct type
    // sets are bounded by the type cardinality, so the pair explode is
    // ≤ C(5,2) per session. q129 counts raw pair volume; lift is the
    // statistically-normalized version that survives imbalanced types.
    Q("q148_session_lift",
      (s, d) => {
        import graft.functions.IntMath
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sess = Tables(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("new_sess",
            when(lag("ts", 1).over(w).isNull ||
              unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(w))
                > 1800L, 1L).otherwise(0L))
          .withColumn("sid", concat_ws("#", col("user_id"),
            sum("new_sess").over(wRun)))
          .select(col("sid"), col("event_type")).distinct()
        val nDf = sess.select("sid").distinct()
          .agg(count(lit(1)).as("n_sessions"))
        val single = sess.groupBy("event_type").agg(count(lit(1)).as("n_t"))
        val pairs = sess.select(col("sid"), col("event_type").as("t_a"))
          .join(sess.select(col("sid"), col("event_type").as("t_b")), "sid")
          .filter(col("t_a") < col("t_b"))
          .groupBy("t_a", "t_b").agg(count(lit(1)).as("n_ab"))
        pairs
          .join(broadcast(single.select(col("event_type").as("t_a"),
            col("n_t").as("n_a"))), "t_a")
          .join(broadcast(single.select(col("event_type").as("t_b"),
            col("n_t").as("n_b"))), "t_b")
          .crossJoin(broadcast(nDf))
          .select(col("t_a"), col("t_b"), col("n_ab"),
            IntMath.halfUp(col("n_ab") * col("n_sessions"),
              col("n_a") * col("n_b"), 10000L).as("lift_bp"))
          .orderBy("t_a", "t_b")
      },
      Some("""WITH g AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) // 1000000 - epoch_us(lag(ts) OVER w) // 1000000
        |        > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT DISTINCT
        |    user_id || '#' || CAST(sum(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW) AS VARCHAR) AS sid, event_type
        |  FROM g),
        |n AS (SELECT count(DISTINCT sid) AS n FROM s),
        |single AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
        |  FROM s GROUP BY 1),
        |pairs AS (SELECT a.event_type AS t_a, b.event_type AS t_b,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM s a JOIN s b ON a.sid = b.sid AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT t_a, t_b, n_ab,
        |  (2 * n_ab * n.n * 10000 + sa.n_t * sb.n_t) // (2 * sa.n_t * sb.n_t)
        |    AS lift_bp
        |FROM pairs JOIN single sa ON t_a = sa.event_type
        |JOIN single sb ON t_b = sb.event_type, n
        |ORDER BY t_a, t_b""".stripMargin),
      "session-basket lift matrix in exact basis points (normalized co-occurrence)"),

    // q149 — RETENTION RATES: q92's cohort matrix normalized to exact
    // basis-point survival rates — cell / cohort size (offset-0 cell),
    // the number a growth dashboard actually plots. The rate join is
    // cohort-keyed over the tiny (cohort x offset) matrix.
    Q("q149_retention_rates",
      (s, d) => {
        import graft.functions.IntMath
        val m = Analytics.retentionCohorts(Tables(s, d, "events"),
          col("user_id"), col("ts"))
        val base = m.filter(col("week_offset") === 0)
          .select(col("cohort_week"), col("n_users").as("cohort_size"))
        m.join(broadcast(base), "cohort_week")
          .select(col("cohort_week"), col("week_offset"), col("n_users"),
            col("cohort_size"),
            IntMath.bp(col("n_users"), col("cohort_size")).as("retained_bp"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
        |  FROM events),
        |f AS (SELECT user_id, min(wk) AS cohort_week FROM a GROUP BY user_id),
        |m AS (SELECT f.cohort_week,
        |    CAST(date_diff('day', f.cohort_week, a.wk) // 7 AS INTEGER)
        |      AS week_offset, count(*) AS n_users
        |  FROM a JOIN f ON a.user_id = f.user_id GROUP BY 1, 2),
        |base AS (SELECT cohort_week, n_users AS cohort_size FROM m
        |  WHERE week_offset = 0)
        |SELECT m.cohort_week, m.week_offset, m.n_users, base.cohort_size,
        |  CAST((2 * m.n_users * 10000 + base.cohort_size)
        |    // (2 * base.cohort_size) AS BIGINT) AS retained_bp
        |FROM m JOIN base ON m.cohort_week = base.cohort_week
        |ORDER BY m.cohort_week, m.week_offset""".stripMargin),
      "cohort retention rates in exact basis points (q92 normalized)"),

    // q150 — CUSUM change-point scan: cumulative deviation of daily
    // event volume from the FIRST WEEK's daily mean, in exact integer
    // row-units (scaled by 7 to avoid division) — cusum_d =
    // Σ_{i<=d}(7·n_i − total_week1). The day with the largest |cusum|
    // is the change-point candidate; the threshold crossing flag is a
    // pure long compare. Calendar-sized: one fact shuffle to daily
    // counts, then windows over ≤31 rows.
    Q("q150_cusum_changepoint",
      (s, d) => {
        val daily = Tables(s, d, "events")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val ref = daily.filter(col("day") < lit("2024-01-08").cast("date"))
          .agg(sum("n").as("w1"))
        val w = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.crossJoin(broadcast(ref))
          .withColumn("cusum", sum(col("n") * 7L - col("w1")).over(w))
          .select(col("day"), col("n"), col("cusum"),
            (abs(col("cusum")) > col("w1")).as("alert"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |ref AS (SELECT CAST(sum(n) AS BIGINT) AS w1 FROM daily
        |  WHERE day < DATE '2024-01-08')
        |SELECT day, n,
        |  CAST(sum(n * 7 - w1) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cusum,
        |  abs(CAST(sum(n * 7 - w1) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT))
        |    > w1 AS alert
        |FROM daily, ref ORDER BY day""".stripMargin),
      "integer CUSUM change-point scan vs first-week mean (calendar-sized windows)"),

    // q153 — CUMULATIVE UNIQUE USERS (the growth curve): distinct users
    // ever seen, per day — computed WITHOUT a rolling count-distinct:
    // each user contributes only on their FIRST-SEEN day (a user-keyed
    // min agg), daily first-seen counts then prefix-sum over the
    // calendar. The dense_rank-free trick that turns an O(days x users)
    // distinct-window into one user agg + a 31-row window. Days with no
    // new users still appear (calendar grid join), carrying the running
    // total flat.
    Q("q153_cumulative_users",
      (s, d) => {
        val e = Tables(s, d, "events")
        val firstSeen = e.groupBy("user_id")
          .agg(min(to_date(col("ts"))).as("day"))
          .groupBy("day").agg(count(lit(1)).as("n_new"))
        val grid = e.agg(min(to_date(col("ts"))).as("d0"),
            max(to_date(col("ts"))).as("d1"))
          .select(explode(sequence(col("d0"), col("d1"))).as("day"))
        val w = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(firstSeen, Seq("day"), "left")
          .select(col("day"), coalesce(col("n_new"), lit(0L)).as("n_new"))
          .withColumn("cumulative_users", sum("n_new").over(w))
          .orderBy("day")
      },
      Some("""WITH fs AS (SELECT user_id, min(CAST(ts AS DATE)) AS day
        |  FROM events GROUP BY user_id),
        |daily AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new FROM fs
        |  GROUP BY day),
        |mm AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
        |  FROM events),
        |grid AS (SELECT CAST(unnest(generate_series(d0::TIMESTAMP,
        |    d1::TIMESTAMP, INTERVAL 1 DAY)) AS DATE) AS day FROM mm)
        |SELECT g.day, coalesce(daily.n_new, 0) AS n_new,
        |  CAST(sum(coalesce(daily.n_new, 0)) OVER (ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cumulative_users
        |FROM grid g LEFT JOIN daily ON g.day = daily.day
        |ORDER BY g.day""".stripMargin),
      "cumulative unique users via first-seen-day trick (no rolling count-distinct)"),

    // q161 — Markov TRANSITION matrix: P(next type | current type) for
    // consecutive events INSIDE a session (q138's gap rule), in exact
    // half-up basis points — each row of the matrix sums to ~10000, the
    // one-step behavioral model behind next-action prediction and
    // anomaly scoring. One user-keyed exchange serves the session fold
    // and the lead; transition counts are map-side combined.
    Q("q161_transition_matrix",
      (s, d) => {
        import graft.functions.IntMath
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val e = Tables(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("new_sess",
            when(lag("ts", 1).over(w).isNull ||
              unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(w))
                > 1800L, 1L).otherwise(0L))
          .withColumn("sid", sum("new_sess").over(wRun))
          .withColumn("t_next", lead("event_type", 1).over(w))
          .withColumn("s_next", lead("sid", 1).over(w))
          .filter(col("s_next") === col("sid"))
        val pair = e.groupBy(col("event_type").as("t_from"),
          col("t_next").as("t_to")).agg(count(lit(1)).as("n"))
        val from = pair.groupBy("t_from").agg(sum("n").as("n_from"))
        pair.join(broadcast(from), "t_from")
          .select(col("t_from"), col("t_to"), col("n"),
            IntMath.bp(col("n"), col("n_from")).as("p_bp"))
          .orderBy("t_from", "t_to")
      },
      Some("""WITH g AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) // 1000000 - epoch_us(lag(ts) OVER w) // 1000000
        |        > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, event_id, event_type,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g),
        |t AS (SELECT event_type AS t_from, sid,
        |    lead(event_type, 1) OVER w AS t_to, lead(sid, 1) OVER w AS s_next
        |  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |pair AS (SELECT t_from, t_to, CAST(count(*) AS BIGINT) AS n FROM t
        |  WHERE s_next = sid GROUP BY 1, 2),
        |f AS (SELECT t_from, CAST(sum(n) AS BIGINT) AS n_from FROM pair
        |  GROUP BY 1)
        |SELECT pair.t_from, t_to, n,
        |  (2 * n * 10000 + n_from) // (2 * n_from) AS p_bp
        |FROM pair JOIN f ON pair.t_from = f.t_from
        |ORDER BY pair.t_from, t_to""".stripMargin),
      "in-session Markov transition matrix in exact basis points (one user shuffle)"),

    // q162 — ENGAGEMENT CADENCE: median and p90 inter-arrival gap per
    // event type, over per-user consecutive-event gaps in integer
    // seconds — the "how often do users do X" profile. The gaps come
    // from one user-keyed lag; the percentiles from GroupedQuantile's
    // distributed selection (thin-slice windows only). The globally
    // unique event_id is the selection tiebreak (no composite-key
    // collision or overflow risk).
    Q("q162_cadence_percentiles",
      (s, d) => {
        import graft.operators.GroupedQuantile
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy("ts", "event_id")
        val gaps = Tables(s, d, "events")
          .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
          .withColumn("gap_s", unix_timestamp(col("ts")) -
            unix_timestamp(lag("ts", 1).over(w)))
          .filter(col("gap_s").isNotNull)
          .select(col("event_type").as("g"), col("gap_s").as("v"),
            col("event_id").as("t"))
        val n = gaps.groupBy("g").agg(count(lit(1)).as("n_gaps"))
        val med = GroupedQuantile.kthSmallestLong(gaps, col("g"), col("v"),
            col("t"), GroupedQuantile.lowerMedianRank)
          .withColumnRenamed("kth_value", "median_gap_s")
        val p90 = GroupedQuantile.kthSmallestLong(gaps, col("g"), col("v"),
            col("t"), GroupedQuantile.pctRank(90))
          .withColumnRenamed("kth_value", "p90_gap_s")
        n.join(med, "g").join(p90, "g")
          .select(col("g").as("event_type"), col("n_gaps"),
            col("median_gap_s"), col("p90_gap_s"))
          .orderBy("event_type")
      },
      Some("""WITH gaps AS (SELECT event_type AS g,
        |    epoch_us(ts) // 1000000 - epoch_us(lag(ts) OVER w) // 1000000 AS v,
        |    event_id AS t
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
        |f AS (SELECT g, v, t FROM gaps WHERE v IS NOT NULL),
        |r AS (SELECT g, v,
        |    row_number() OVER (PARTITION BY g ORDER BY v, t) AS rn,
        |    count(*) OVER (PARTITION BY g) AS n FROM f)
        |SELECT g AS event_type, CAST(max(n) AS BIGINT) AS n_gaps,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS median_gap_s,
        |  max(CASE WHEN rn = (90 * n + 99) // 100 THEN v END) AS p90_gap_s
        |FROM r GROUP BY g ORDER BY event_type""".stripMargin),
      "per-type inter-arrival median/p90 via distributed selection (engagement cadence)"),

    // q165 — DEBOUNCE / burst dedup: keep only the event that STARTS
    // each (user, type) burst — bursts split on >1h gaps, the standard
    // alert-throttling / re-crawl-window rule ("same signal within the
    // window is a duplicate"). Exactly the q20 gap fold re-purposed as
    // a time-scoped dedup: unlike q22's global exact dedup, the same
    // key is legitimately NEW again once the window passes. One
    // (user, type)-keyed window; emits kept rows + per-burst size.
    Q("q165_debounce",
      (s, d) => {
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy("ts", "event_id")
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val e = Tables(s, d, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("new_burst",
            when(lag("ts", 1).over(w).isNull ||
              unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(w))
                > 3600L, 1L).otherwise(0L))
          .withColumn("burst", sum("new_burst").over(wRun))
        e.groupBy("user_id", "event_type", "burst")
          .agg(min(struct(col("ts"), col("event_id"))).as("first"),
            count(lit(1)).as("n_suppressed"))
          .select(col("user_id"), col("event_type"),
            col("first.event_id").as("kept_event_id"),
            (col("n_suppressed") - 1L).as("n_suppressed"))
          .orderBy("user_id", "event_type", "kept_event_id")
      },
      Some("""WITH g AS (SELECT user_id, event_type, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) // 1000000 - epoch_us(lag(ts) OVER w) // 1000000
        |        > 3600 THEN 1 ELSE 0 END AS new_burst
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
        |b AS (SELECT user_id, event_type, ts, event_id,
        |    sum(new_burst) OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW) AS burst
        |  FROM g)
        |SELECT user_id, event_type,
        |  first(event_id ORDER BY ts, event_id) AS kept_event_id,
        |  CAST(count(*) - 1 AS BIGINT) AS n_suppressed
        |FROM b GROUP BY user_id, event_type, burst
        |ORDER BY user_id, event_type, kept_event_id""".stripMargin),
      "time-scoped burst dedup: keep each burst's first event, count suppressed"),

    // q169 — RECENCY-WEIGHTED volume: per event type, activity weighted
    // by exponential decay with a one-week half-life — the freshness
    // score behind "what's hot NOW" rankings — computed WITHOUT floats:
    // weight = 16 >> weeks_ago (16, 8, 4, 2, 1 for weeks 0..4, integer
    // shift), so the weighted sum is exact on both engines. Weeks
    // count back from the corpus max day (broadcast row).
    Q("q169_recency_weighted_volume",
      (s, d) => {
        val e = Tables(s, d, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"))
        val mx = e.agg(max("day").as("d1"))
        e.crossJoin(broadcast(mx))
          .withColumn("weeks_ago",
            least(lit(4), expr("datediff(d1, day) div 7")).cast("int"))
          .withColumn("wt", expr("shiftright(16, weeks_ago)").cast("long"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum("wt").as("weighted_volume"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day
        |  FROM events),
        |mx AS (SELECT max(day) AS d1 FROM e)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(16 >> least(4, date_diff('day', day, d1) // 7))
        |    AS BIGINT) AS weighted_volume
        |FROM e, mx GROUP BY event_type ORDER BY event_type""".stripMargin),
      "freshness score: integer-shift exponential decay, exact on both engines")
  )
}
