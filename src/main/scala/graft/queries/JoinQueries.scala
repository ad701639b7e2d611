package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Tables

/** Join-operator pack — the custom/physical join half of the former
  * Relational file, split along its batch seam (round-8 verdict
  * housekeeping; no query renames): salted skew join, as-of and
  * range joins, pivot/unpivot, percentiles, cube, custom aggregator,
  * native top-k, bucketed co-located join, rule-fallback join.
  */
object JoinQueries {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val qs: Seq[Q] = Seq(
    // q41 — salted skew join: q11's fact-fact join rewritten with
    // explicit left-side salting (hash(l_linenumber) mod 8 sub-keys,
    // right side replicated 8x). Salting is a physical rewrite only, so
    // the oracle is the PLAIN join — identical rows out proves the
    // technique is semantics-preserving.
    Q("q41_skew_salted_join",
      (s, d) => {
        val l = t(s, d, "lineitem")
        val o = t(s, d, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
        graft.operators.SkewJoin.salted(l, o, "l_orderkey",
            col("l_linenumber"), buckets = 8)
          .groupBy(col("l_orderkey").as("o_orderkey"), col("o_orderdate"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey, o_orderdate,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin),
      "salted skew join == plain join (physical rewrite, same rows)"),

    // q43 — AS-OF join (an operator Spark lacks; DuckDB has it natively,
    // which makes the oracle independent): each event enriched with the
    // user's most recent order at event time. Spark side = the
    // union+window composition (one shuffle on the key, no range
    // explosion); right side deduped to one order per (custkey, date)
    // first so "most recent at a tied time" is well-defined in both
    // engines.
    Q("q43_asof_join",
      (s, d) => {
        val w = Window.partitionBy("o_custkey", "o_orderdate")
          .orderBy(col("o_orderkey").desc)
        val latestPerDay = t(s, d, "orders")
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        val e = t(s, d, "events").select("event_id", "ts", "user_id")
        graft.operators.AsOfJoin.asof(
            e, latestPerDay,
            leftKey = col("user_id"), rightKey = col("o_custkey"),
            leftTime = col("ts"), rightTime = col("o_orderdate"),
            payload = Seq(col("o_orderkey") -> "o_orderkey",
              col("o_orderdate") -> "o_orderdate",
              col("o_totalprice") -> "o_totalprice"))
          .select(col("event_id"), col("ts"), col("user_id"),
            col("__match.o_orderkey").as("o_orderkey"),
            col("__match.o_orderdate").as("o_orderdate"),
            col("__match.o_totalprice").as("o_totalprice"))
          .orderBy("event_id")
      },
      Some("""WITH o AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
        |  FROM orders
        |  QUALIFY row_number() OVER (
        |    PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) = 1),
        |e AS (SELECT event_id, ts, user_id FROM events)
        |SELECT e.event_id, e.ts, e.user_id,
        |  o.o_orderkey, o.o_orderdate, o.o_totalprice
        |FROM e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY event_id""".stripMargin),
      "as-of join: union+window composition vs DuckDB's native ASOF JOIN"),

    // q44 — range (interval) join: for each event, the same user's other
    // events in the preceding hour. Bucketized by the window length
    // (each interval overlaps <=2 buckets -> equi-join on (key, bucket),
    // exact predicate after) — never the per-key O(n*m) theta join.
    Q("q44_range_join",
      (s, d) => {
        val e = t(s, d, "events").select("event_id", "ts", "user_id", "value")
        val prior = e.select(col("event_id").as("prior_id"),
          col("ts").as("prior_ts"), col("user_id").as("uid"),
          col("value").as("prior_value"))
        graft.operators.RangeJoin.withinAfter(
            e, prior,
            leftKey = col("user_id"), rightKey = col("uid"),
            leftTime = col("ts"), rightTime = col("prior_ts"),
            windowUs = 3600L * 1000000L)
          .filter(col("prior_id") =!= col("event_id"))
          .groupBy("event_id")
          .agg(count(lit(1)).as("n_prior"),
            round(sum("prior_value"), 4).as("prior_value_sum"))
          .orderBy("event_id")
      },
      Some("""SELECT a.event_id, count(*) AS n_prior,
        |  round(sum(b.value), 4) AS prior_value_sum
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |  AND b.ts <= a.ts AND a.ts < b.ts + INTERVAL 1 HOUR
        |  AND b.event_id <> a.event_id
        |GROUP BY a.event_id ORDER BY a.event_id""".stripMargin),
      "bucketized interval self-join (prior events within 1h)"),

    // q45 — pivot (wide aggregation): revenue matrix returnflag x
    // linestatus. Same single-shuffle hash aggregate as a groupBy; the
    // pivot values are declared so no extra distinct pass runs.
    Q("q45_pivot",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum("l_quantity"), 2))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
        |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      "declared-values pivot == CASE aggregation"),

    // q46 — exact interpolated percentiles per group (sort-based
    // aggregate; both engines use linear interpolation).
    Q("q46_percentiles",
      (s, d) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
        |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      "exact interpolated percentiles per group"),

    // q47 — CUBE grouping sets (rollup's sibling, all 2^k subtotal
    // combinations in one shuffle).
    Q("q47_cube",
      (s, d) => t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
      Some("""SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin),
      "CUBE grouping sets"),

    // q48 — custom typed Aggregator (the UDAF surface): geometric mean
    // of positive balances per segment. Constant-size (Σ ln x, n)
    // buffer -> map-side partial agg like any built-in; the oracle
    // replays the same math as exp(avg(ln x)).
    Q("q48_custom_aggregator",
      (s, d) => t(s, d, "customer")
        .filter(col("c_acctbal") > 0)
        .groupBy("c_mktsegment")
        .agg(round(graft.functions.GeoMean.column(col("c_acctbal")), 4).as("geo_mean_bal"),
          count(lit(1)).as("n"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment,
        |  round(exp(avg(ln(c_acctbal))), 4) AS geo_mean_bal,
        |  count(*) AS n
        |FROM customer WHERE c_acctbal > 0
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      "custom Aggregator (geometric mean) == exp(avg(ln x)) oracle"),

    // q49 — top-k per group (rank + filter): the 3 highest-value orders
    // per order priority. One shuffle on the partition key; the rank
    // filter prunes before any downstream work (no global sort of the
    // full table).
    Q("q49_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, d, "orders")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("o_orderpriority"), col("rk").cast("int").as("rk"),
            col("o_orderkey"), col("o_totalprice"))
          .orderBy("o_orderpriority", "rk")
      },
      Some("""SELECT o_orderpriority,
        |  CAST(row_number() OVER w AS INTEGER) AS rk, o_orderkey, o_totalprice
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |QUALIFY rk <= 3
        |ORDER BY o_orderpriority, rk""".stripMargin),
      "top-k per group via rank window + filter"),

    // q66 — the same top-3-per-priority through the CUSTOM plan node
    // (plans/TopKPerKey.scala: logical node + planner strategy +
    // two-phase partial/final heap SparkPlan). q49 shuffles and sorts
    // EVERY row; this shuffles at most k rows per (key, input
    // partition). Identical semantics — the oracle is q49's minus the
    // rank column.
    Q("q66_topk_native",
      (s, d) => graft.plans.TopK.perKey(t(s, d, "orders"),
          keyCols = Seq("o_orderpriority"), orderCol = "o_totalprice",
          desc = true, tiebreak = Seq("o_orderkey"), k = 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "o_orderkey"),
      Some("""SELECT o_orderpriority, o_orderkey, o_totalprice
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |QUALIFY row_number() OVER w <= 3
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin),
      "top-k per group via the custom TopKPerKey plan node (partial/final heaps)"),

    // q229 — BUCKETED CO-LOCATED JOIN: both fact tables written ONCE
    // bucketed (+sorted) by the join key into the session catalog, then
    // joined with NO exchange on either side — the storage layout that
    // turns the recurring big-big join into a local merge at any scale
    // (the lexical/ANN serving-layout story of q175/q212 applied to
    // relational storage; pay the shuffle at layout time, never at
    // query time). PlansSpec asserts the no-Exchange property; the
    // revenue arithmetic is q151's exact integer units.
    Q("q229_bucketed_colocated_join",
      (s, d) => {
        val ob = "graft_q229_orders_b"
        val lb = "graft_q229_lineitem_b"
        // Idempotent layout rebuild: an interrupted prior run can leave the
        // warehouse directory behind with no catalog entry, and saveAsTable
        // (even mode=overwrite) refuses to create over an orphaned location.
        Seq(ob, lb).foreach { name =>
          s.sql(s"DROP TABLE IF EXISTS $name")
          val p = new org.apache.hadoop.fs.Path(
            s.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
          val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
        }
        t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ob)
        t(s, d, "lineitem").select(col("l_orderkey"),
            (round(col("l_extendedprice") * 100, 0).cast("long") *
              (lit(10000L) - round(col("l_discount") * 10000, 0).cast("long")))
              .as("rev_u"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(lb)
        s.table(ob).join(s.table(lb),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority").as("pri"))
          .agg(count(lit(1)).cast("long").as("n_items"),
            sum("rev_u").cast("long").as("revenue_u"))
          .orderBy("pri")
      },
      Some("""SELECT o.o_orderpriority AS pri,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |    (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
        |    AS BIGINT) AS revenue_u
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin),
      "bucketed+sorted co-located join — exchange paid at layout time, not query time"),

    // q244 — MOST-SPECIFIC-MATCH rule join (the config-cascade /
    // longest-prefix-match pattern): rules exist at three
    // specificities — (brand, type) cells and type groups carrying at
    // least the AVERAGE load of their level (1/150 resp. 1/6 of
    // parts — enough supporting data), plus a global default — and
    // each part binds to the MOST specific rule that exists. Instead of
    // cascade of sequential left joins re-scanning the probe per level,
    // both rule tables are tiny aggregates broadcast onto ONE probe
    // pass; specificity resolution is a per-row CASE. Ratio (not
    // absolute) thresholds keep the rule derivation scale-free.
    Q("q244_rule_fallback_join",
      (s, d) => {
        val p = t(s, d, "part").select(col("p_brand"), col("p_type"),
          round(col("p_retailprice") * 100, 0).cast("long").as("pc"))
        val tot = p.agg(count(lit(1)).as("tot"))
        val l2 = p.groupBy("p_brand", "p_type")
          .agg(count(lit(1)).as("n2")).crossJoin(broadcast(tot))
          .filter(col("n2") * 150 >= col("tot"))
          .select(col("p_brand"), col("p_type"), lit(1).as("f2"))
        val l1 = p.groupBy("p_type")
          .agg(count(lit(1)).as("n1")).crossJoin(broadcast(tot))
          .filter(col("n1") * 6 >= col("tot"))
          .select(col("p_type"), lit(1).as("f1"))
        p.join(broadcast(l2), Seq("p_brand", "p_type"), "left")
          .join(broadcast(l1), Seq("p_type"), "left")
          .select(col("pc"),
            when(col("f2").isNotNull, lit(2))
              .when(col("f1").isNotNull, lit(1)).otherwise(lit(0))
              .as("lvl"),
            when(col("f2").isNotNull,
                concat(col("p_brand"), lit("/"), col("p_type")))
              .when(col("f1").isNotNull, col("p_type"))
              .otherwise(lit("default")).as("rule_key"))
          .groupBy("lvl", "rule_key")
          .agg(count(lit(1)).cast("long").as("n_parts"),
            expr("CAST(sum(pc) div count(1) AS BIGINT)").as("avg_price_c"))
          .orderBy(col("lvl").desc, col("rule_key"))
      },
      Some("""WITH p AS (SELECT p_brand, p_type,
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS pc FROM part),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM p),
        |l2 AS (SELECT p_brand, p_type, 1 AS f2
        |  FROM (SELECT p_brand, p_type, count(*) AS n2 FROM p GROUP BY 1, 2), tot
        |  WHERE n2 * 150 >= tot),
        |l1 AS (SELECT p_type, 1 AS f1
        |  FROM (SELECT p_type, count(*) AS n1 FROM p GROUP BY 1), tot
        |  WHERE n1 * 6 >= tot),
        |m AS (SELECT p.pc,
        |    CASE WHEN l2.f2 IS NOT NULL THEN 2
        |         WHEN l1.f1 IS NOT NULL THEN 1 ELSE 0 END AS lvl,
        |    CASE WHEN l2.f2 IS NOT NULL THEN p.p_brand || '/' || p.p_type
        |         WHEN l1.f1 IS NOT NULL THEN p.p_type
        |         ELSE 'default' END AS rule_key
        |  FROM p
        |  LEFT JOIN l2 ON p.p_brand = l2.p_brand AND p.p_type = l2.p_type
        |  LEFT JOIN l1 ON p.p_type = l1.p_type)
        |SELECT lvl, rule_key, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(CAST(sum(pc) AS HUGEINT) // count(*) AS BIGINT) AS avg_price_c
        |FROM m GROUP BY 1, 2 ORDER BY lvl DESC, rule_key""".stripMargin),
      "most-specific-match rule join — broadcast rule cascade resolved in one probe pass"),

    // q262 — JOIN-view IVM with signed deltas on BOTH sides: the
    // bilinear identity Δ(A⋈B) = ΔA⋈B₀ + A₀⋈ΔB + ΔA⋈ΔB with pair
    // multiplicity = product of row signs, applied to a revenue view
    // over orders ⋈ lineitem. Both tables split by md5 hash gates into
    // base (90%), inserts (the held-out 10%, sign +1) and retractions
    // (5% of base re-emitted with sign −1) — so every algebra case
    // fires: delete×survivor, delete×delete (the double-retraction
    // cancellation), insert×insert, insert×delete. The Spark side
    // maintains V₀ + ΔV through delta-sized broadcast joins; the
    // oracle recomputes the post-change truth from scratch — equality
    // IS the IVM contract (the q200 discipline, extended from per-key
    // aggregates to the join bilinearity).
    Q("q262_join_ivm",
      (s, d) => {
        import graft.functions.TextFunctions.hash60
        import graft.warehouse.Warehouse
        val ord = Tables(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          (hash60(col("o_orderkey").cast("string"), 7) % 1000).as("ha"),
          (hash60(col("o_orderkey").cast("string"), 8) % 1000).as("hd"))
        val a0 = ord.filter(col("ha") < 900)
          .select("o_orderkey", "o_custkey")
        val da = ord.filter(col("ha") >= 900)
          .select(col("o_orderkey"), col("o_custkey"),
            lit(1L).as("sign"))
          .unionAll(ord.filter(col("ha") < 900 && col("hd") < 50)
            .select(col("o_orderkey"), col("o_custkey"),
              lit(-1L).as("sign")))
        val li = Tables(s, d, "lineitem").select(
          col("l_orderkey").as("o_orderkey"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
          (hash60(concat(col("l_orderkey").cast("string"), lit("#"),
            col("l_linenumber").cast("string")), 7) % 1000).as("hb"),
          (hash60(concat(col("l_orderkey").cast("string"), lit("#"),
            col("l_linenumber").cast("string")), 8) % 1000).as("he"))
        val b0 = li.filter(col("hb") < 900).select("o_orderkey", "cents")
        val db = li.filter(col("hb") >= 900)
          .select(col("o_orderkey"), col("cents"), lit(1L).as("sign"))
          .unionAll(li.filter(col("hb") < 900 && col("he") < 50)
            .select(col("o_orderkey"), col("cents"),
              lit(-1L).as("sign")))
        Warehouse.joinViewDelta(a0, da, b0, db, "o_orderkey",
            Seq("o_custkey"), col("cents"))
          .select(col("o_custkey"), col("n_rows"),
            col("total_bp").as("total_cents"))
          .orderBy("o_custkey")
      },
      Some("""WITH o AS (SELECT o_orderkey, o_custkey,
        |    ('0x' || substring(md5('7#' ||
        |      CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 1000 AS ha,
        |    ('0x' || substring(md5('8#' ||
        |      CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 1000 AS hd
        |  FROM orders),
        |a1 AS (SELECT o_orderkey, o_custkey FROM o
        |  WHERE ha >= 900 OR (ha < 900 AND hd >= 50)),
        |l AS (SELECT l_orderkey AS o_orderkey,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    ('0x' || substring(md5('7#' || CAST(l_orderkey AS VARCHAR)
        |      || '#' || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT
        |      % 1000 AS hb,
        |    ('0x' || substring(md5('8#' || CAST(l_orderkey AS VARCHAR)
        |      || '#' || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT
        |      % 1000 AS he
        |  FROM lineitem),
        |b1 AS (SELECT o_orderkey, cents FROM l
        |  WHERE hb >= 900 OR (hb < 900 AND he >= 50))
        |SELECT a1.o_custkey, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM a1 JOIN b1 USING (o_orderkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin),
      "join-view IVM: V0 + bilinear signed deltas == from-scratch join on the post-change tables"),

    // q264 — COUNT(DISTINCT) view maintenance under signed deltas:
    // the IVM case q200 (abelian per-key aggregates) and q262 (join
    // bilinearity) cannot express — a delete cannot be applied to a
    // distinct count directly (whether it decrements depends on
    // whether OTHER rows still carry the value), so the maintained
    // state is the per-(group, value) SUPPORT table and the view
    // derives from it. Per-user distinct audiences per event type
    // over events, with the q262 md5 gates: base (ha < 900), inserts
    // (ha >= 900, sign +1), retractions (5% of base re-emitted with
    // sign −1) — support decrements that do NOT zero a value leave
    // the distinct count unchanged, ones that do remove it. The
    // maintenance path is JOIN-FREE (plan contract); the oracle is
    // the from-scratch COUNT(DISTINCT) on the post-change table, and
    // equality also proves n_neg_support == 0 everywhere (consistent
    // deltas cannot drive support negative).
    Q("q264_distinct_ivm",
      (s, d) => {
        import graft.functions.TextFunctions.hash60
        import graft.warehouse.Warehouse
        val ev = Tables(s, d, "events").select(
          col("event_type"), col("user_id"),
          (hash60(col("event_id").cast("string"), 7) % 1000).as("ha"),
          (hash60(col("event_id").cast("string"), 8) % 1000).as("hd"))
        val base = ev.filter(col("ha") < 900)
          .select("event_type", "user_id")
        val delta = ev.filter(col("ha") >= 900)
          .select(col("event_type"), col("user_id"), lit(1L).as("sign"))
          .unionAll(ev.filter(col("ha") < 900 && col("hd") < 50)
            .select(col("event_type"), col("user_id"),
              lit(-1L).as("sign")))
        Warehouse.distinctViewDelta(base, delta, Seq("event_type"),
            col("user_id"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type, user_id,
        |    ('0x' || substring(md5('7#' ||
        |      CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 1000 AS ha,
        |    ('0x' || substring(md5('8#' ||
        |      CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 1000 AS hd
        |  FROM events),
        |post AS (SELECT event_type, user_id FROM e
        |  WHERE ha >= 900 OR (ha < 900 AND hd >= 50))
        |SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct,
        |  CAST(0 AS BIGINT) AS n_neg_support,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM post GROUP BY 1 ORDER BY 1""".stripMargin),
      "distinct-count IVM: support-table state == from-scratch COUNT(DISTINCT) on the post-change table"),

    // q275 — DYNAMIC PARTITION PRUNING: the cornerstone 100 TB scan
    // mechanism the suite had not yet pinned. The fact lands
    // partitioned by priority (the lake's partitionBy discipline, one
    // dir per value); the dim's qualifying priorities exist only at
    // RUNTIME (derived from nation rows filtered by region — no
    // literal in-list the planner could fold), so a static plan must
    // scan all five partitions while DPP inserts a subquery filter on
    // the fact's PARTITION column and the scan reads 2 of 5
    // partitions (regions {1,3} ≡ nationkeys {1,3} mod 5 → priorities
    // {2-HIGH, 4-NOT SPECIFIED}). At 100 TB this is the difference
    // between reading the whole fact and reading the qualifying
    // slice; the plan contract pins the `dynamicpruning` expression
    // on the scan. Fact written once per JVM (FeedCache — a fixture,
    // exactly like the streaming feeds).
    Q("q275_dynamic_partition_pruning",
      (s, d) => {
        val fact = graft.util.FeedCache.ensure("q275_fact", d) { p =>
          Tables(s, d, "orders").select(
              col("o_orderkey"),
              round(col("o_totalprice") * 100).cast("long").as("cents"),
              col("o_orderpriority").as("pri"))
            .write.mode("overwrite").partitionBy("pri").parquet(p) }
        val prios = array(Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
          "4-NOT SPECIFIED", "5-LOW").map(lit): _*)
        val dim = Tables(s, d, "nation")
          .filter(col("n_regionkey").isin(1, 3))
          .select(element_at(prios,
            (col("n_nationkey") % 5).cast("int") + 1).as("pri"))
          .distinct()
        s.read.parquet(fact).join(dim, "pri")
          .groupBy("pri")
          .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
          .orderBy("pri")
      },
      Some("""WITH dimp AS (SELECT DISTINCT
        |    ['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW']
        |      [CAST(n_nationkey % 5 AS INT) + 1] AS pri
        |  FROM nation WHERE n_regionkey IN (1, 3))
        |SELECT o.o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM orders o JOIN dimp ON dimp.pri = o.o_orderpriority
        |GROUP BY 1 ORDER BY 1""".stripMargin),
      "dynamic partition pruning: runtime dim-derived partition filter on the partitioned fact scan (plan-contracted)"),

    // q276 — RUNTIME BLOOM-FILTER join pruning: DPP's row-level
    // sibling, for the join 100 TB clusters actually dread — fact ⋈
    // dim on a NON-partition column with the dim too big to
    // broadcast. Spark's InjectRuntimeFilter builds a bloom filter
    // over the dim's selective side and pushes
    // `might_contain(xxhash64(key))` into the fact scan, so the
    // shuffle carries only rows that can possibly match instead of
    // the whole fact. The injection thresholds default to
    // cluster-scale sizes (application side > 10 GB), so the query
    // pins them for the bench corpus and DISABLES auto-broadcast —
    // the broadcast join would be the right plan at this SF, but the
    // mechanism under contract is the one that matters when the dim
    // side outgrows broadcast (conf set/restored around planning, the
    // serial-session discipline). Semantics are untouched: the bloom
    // filter only PRUNES — the join itself re-verifies every
    // surviving row — so the oracle is the plain join.
    Q("q276_runtime_bloom_join",
      (s, d) => {
        // CONF-WINDOW SUBTLETY: Spark optimizes LAZILY — a frame
        // returned from inside a set/restore block would plan AFTER
        // the restore and the filter would silently never inject.
        // The aggregate (3 rows) therefore MATERIALIZES inside the
        // window (localCheckpoint); the work is still timed (the
        // query fn runs it) and the plan contract builds the frame
        // under the same confs (q276Frame, shared).
        withBloomConfs(s) {
          q276Frame(s, d).localCheckpoint(eager = true)
        }.orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |    AS BIGINT) AS cents
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_size < 5
        |GROUP BY 1 ORDER BY 1""".stripMargin),
      "runtime bloom-filter join pruning: might_contain pushed into the fact scan of a shuffle join (plan-contracted)"),

    // q279 — the two runtime pruning mechanisms COMPOSED in one star
    // join (the q151 shape over a partitioned fact layout): the fact
    // lands partitioned by ship month; the qualifying months exist
    // only at runtime (region 'ASIA' → nation → month key — the q151
    // dim chain, no literal in-list to fold), so DPP injects a
    // `dynamicpruning` partition filter and the scan reads 5 of 12
    // month partitions; the SAME plan joins the surviving rows to the
    // small-parts dim on the NON-partition key l_partkey as a shuffle
    // join (dim-outgrows-broadcast scenario, q276's conf window), and
    // InjectRuntimeFilter pushes `might_contain` into the already-
    // partition-pruned fact scan. Partition pruning cuts which FILES
    // are read, the bloom cuts which ROWS reach the shuffle — at
    // 100 TB that composition is the whole scan story, and q275/q276
    // pinned each mechanism only in isolation. Both firing together
    // is plan-contracted (PlansSpec q279). Semantics untouched by
    // either mechanism (both only prune; joins re-verify), so the
    // oracle is the plain two-join aggregate.
    Q("q279_dual_runtime_pruning",
      (s, d) =>
        withBloomConfs(s) {
          q279Frame(s, d).localCheckpoint(eager = true)
        }.orderBy("shipmonth"),
      Some("""WITH dimm AS (SELECT DISTINCT
        |    CAST(n_nationkey % 12 AS INT) + 1 AS shipmonth
        |  FROM nation JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA')
        |SELECT CAST(month(l_shipdate) AS INT) AS shipmonth,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |    AS BIGINT) AS cents
        |FROM lineitem
        |JOIN dimm ON dimm.shipmonth = CAST(month(l_shipdate) AS INT)
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_size < 5
        |GROUP BY 1 ORDER BY 1""".stripMargin),
      "DPP + runtime bloom composed in one star join: partition filter prunes month files, might_contain prunes rows, same fact scan (plan-contracted)"),
  )

  /** q276's conf window: bloom injection on, application-side size
    * threshold collapsed to the bench corpus, auto-broadcast off (the
    * dim-outgrows-broadcast scenario under contract). Set/restore —
    * safe under the repo's serial-session execution contract (the
    * withStateParts discipline).
    */
  private[graft] def withBloomConfs[T](
      s: org.apache.spark.sql.SparkSession)(f: => T): T = {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set(keys(0), "true")
      s.conf.set(keys(1), "0")
      s.conf.set(keys(2), "-1")
      f
    } finally prev.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _)) }
  }

  /** q276's logical frame — shared by the query (which materializes
    * it inside the conf window) and the PlansSpec contract (which
    * explains it inside the same window).
    */
  /** q279's logical frame — the q151 star shape over a month-
    * partitioned fact, shared by the query (materialized inside the
    * bloom conf window) and the PlansSpec dual-pruning contract
    * (explained under the same confs — the lazy-planning subtlety
    * q276's body documents). The fact fixture is written once per JVM
    * (FeedCache), partitioned by ship month.
    */
  private[graft] def q279Frame(s: org.apache.spark.sql.SparkSession,
                               d: String): org.apache.spark.sql.DataFrame = {
    val fact = graft.util.FeedCache.ensure("q279_fact", d) { p =>
      Tables(s, d, "lineitem").select(
          col("l_orderkey"), col("l_partkey"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"),
          month(col("l_shipdate")).as("shipmonth"))
        .write.mode("overwrite").partitionBy("shipmonth").parquet(p) }
    // qualifying months derived at RUNTIME from the q151 dim chain
    // (region filter → nation → month key); broadcast-hinted so the
    // exchange DPP reuses survives the conf window's disabled
    // auto-broadcast (the hint is the dim-is-small declaration)
    val dimM = t(s, d, "nation")
      .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")
          .select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(((col("n_nationkey") % 12) + 1).cast("int").as("shipmonth"))
      .distinct()
    // the row-pruning dim: NON-partition join key, shuffle join under
    // the conf window — the side the bloom filter is built from
    val dimP = t(s, d, "part").filter(col("p_size") < 5)
      .select(col("p_partkey"))
    s.read.parquet(fact)
      .join(broadcast(dimM), "shipmonth")
      .join(dimP, col("l_partkey") === col("p_partkey"))
      .groupBy(col("shipmonth").cast("int").as("shipmonth"))
      .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
  }

  private[graft] def q276Frame(s: org.apache.spark.sql.SparkSession,
                               d: String): org.apache.spark.sql.DataFrame = {
    val dim = t(s, d, "part")
      .filter(col("p_size") < 5)
      .select(col("p_partkey"))
    t(s, d, "lineitem")
      .select(col("l_partkey"), col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
  }
}
