package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-integer statistics over grouped data — correlation and trend
  * primitives whose every intermediate an independent engine replays
  * bit-for-bit (the q94/q100/q148 no-libm contract). Where the textbook
  * form needs sqrt/float (Pearson, OLS), the operator either moves to a
  * rank domain (Spearman) or reports exact rational components plus a
  * scaled integral quotient arranged so no negative value ever meets an
  * integer division (Spark `div` truncates toward zero, DuckDB `//`
  * floors — they agree ONLY on non-negatives; every program here
  * divides absolute values and reapplies the sign by multiplication).
  *
  * Reference analogue: none — extensions in the analytics pack.
  */
object Stats {

  /** Spearman rank correlation per group between two numeric columns,
    * in exact basis points. Ranks are the row_number over (value, id) —
    * the id tiebreak makes each rank column a PERMUTATION (no tied
    * ranks), so the classic d² identity is exact:
    *
    *   rho_bp = 10⁴ − (6·10⁴·Σd²) div (n·(n²−1)),  d = rank_x − rank_y
    *
    * The quotient operand is non-negative (Σd² ≥ 0), so truncation and
    * floor agree; the subtraction afterward is exact — rho_bp lands in
    * [−10⁴, 10⁴] without a negative division anywhere. Long headroom:
    * 6·10⁴·Σd² < 2⁶³ requires n ≲ 2·10⁴ per group — DECIMAL(38)
    * escalation is the documented step beyond (same playbook as q159's
    * decimal-escalated ratios). Groups with n < 2 are dropped (rho
    * undefined).
    *
    * Scale shape: ONE exchange on the group key feeds both rank windows
    * and the Σd² aggregate (identical partitioning, reused); per-group
    * partitions are the parallelism unit. Nothing global, nothing on
    * the driver.
    */
  def spearmanByGroup(df: DataFrame, group: Column, id: Column,
                      x: Column, y: Column): DataFrame = {
    val base = df.select(group.as("g"), id.as("i"),
        x.cast("long").as("x"), y.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val rx = row_number().over(Window.partitionBy("g").orderBy("x", "i"))
    val ry = row_number().over(Window.partitionBy("g").orderBy("y", "i"))
    base
      .withColumn("rx", rx.cast("long"))
      .withColumn("ry", ry.cast("long"))
      .withColumn("d", col("rx") - col("ry"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("d") * col("d")).as("sd2"))
      .filter(col("n") >= 2)
      .select(col("g"), col("n"), col("sd2"),
        (lit(10000L) - expr("(60000 * sd2) div (n * (n * n - 1))"))
          .as("rho_bp"))
  }

  /** JACKKNIFE (leave-one-out) variance of the group mean, as an exact
    * rational — the error bar a daily-volume mean deserves, computed
    * without a single float. Algebra: with S = Σx and n observations,
    *
    *   mean_i − mean = (S − n·x_i) / (n(n−1))
    *   var_jack      = (n−1)/n · Σ(mean_i − mean)²
    *                 = Σ(S − n·x_i)²  /  (n³(n−1))    ← num / den, exact
    *
    * Both components are non-negative, so the scaled quotient
    * var_bp = (10⁴·num) div den is engine-agreement-safe. Reported as
    * (num, den, var_bp); groups with n < 2 drop (variance undefined).
    * Sums run in DECIMAL(38,0) — (S − n·x_i)² at n ~ 10⁴ daily counts
    * ~ 10⁶ stays far inside 38 digits.
    *
    * TWO aggregation passes by construction (S must exist before
    * (S − n·x_i)² can be summed) — but both are algebraic with map-side
    * partials, and the second pass's S/n ride back as a broadcast join
    * on the group key. Nothing global, nothing on the driver.
    */
  def jackknifeVarByGroup(df: DataFrame, group: Column,
                          x: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.select(group.as("g"), x.cast("long").as("x"))
      .filter(col("x").isNotNull)
    val firstPass = base.groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("x").cast(dec)).as("s"))
      .filter(col("n") >= 2)
    base.join(broadcast(firstPass), "g")
      .select(col("g"), col("n"), col("s"),
        (col("s") - col("n").cast(dec) * col("x")).as("d"))
      .groupBy("g", "n", "s")
      .agg(sum(col("d") * col("d")).as("num"))
      .select(col("g"), col("n"),
        col("num").cast("long").as("var_num"),
        (col("n").cast(dec) * col("n") * col("n") * (col("n") - 1))
          .cast("long").as("var_den"))
      .withColumn("var_bp", expr(
        "CAST((10000 * CAST(var_num AS DECIMAL(38,0))) div var_den AS BIGINT)"))
  }

  /** Per-group OLS trend slope of y over an integer x, reported as the
    * exact rational (num, den) plus a scaled integral quotient:
    *
    *   num = n·Σxy − Σx·Σy      den = n·Σx² − (Σx)²   (≥ 0 always)
    *   slope_bp = sign(num) · ((10⁴·|num|) div den)
    *
    * The absolute-value-then-sign arrangement is the whole trick: num
    * is legitimately negative for downtrends, and a negative integer
    * division is exactly where Spark (truncate) and DuckDB (floor)
    * part ways. den = 0 (a single distinct x — vertical line) yields
    * NULL slope with the exact components still reported.
    *
    * All sums run in DECIMAL(38,0): n·Σxy at 10⁶ points of y ~ 10⁶
    * already passes 2⁶³. Scale shape: one algebraic aggregate per
    * group — map-side partials collapse everything; the exchange
    * carries |groups| rows.
    */
  def trendSlopeByGroup(df: DataFrame, group: Column, x: Column,
                        y: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val base = df.select(group.as("g"), x.cast("long").as("x"),
        y.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    base.groupBy("g")
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"),
        sum((col("x") * col("x")).cast(dec)).as("sx2"))
      .select(col("g"), col("n").cast("long").as("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sx2") - col("sx") * col("sx")).as("den"))
      .select(col("g"), col("n"),
        col("num").cast("long").as("slope_num"),
        col("den").cast("long").as("slope_den"),
        when(col("den") === 0, lit(null).cast("long"))
          .otherwise((signum(col("num")).cast("long") *
            expr("(10000 * abs(num)) div den").cast("long")))
          .as("slope_bp"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic between samples A
    * and B of an integer-valued column:
    *
    *   D = max over values v of |F_A(v) − F_B(v)|
    *     = max |cumA(v)·nB − cumB(v)·nA| / (nA·nB)
    *
    * reported as the exact integer numerator `d_num` plus
    * `ks_bp = (10⁴·d_num) div (nA·nB)` (both operands non-negative, so
    * Spark `div` ≡ DuckDB `//`). EDF jumps are evaluated after ALL rows
    * of a tied value — grouping by distinct value first makes that
    * automatic.
    *
    * Scale shape — the textbook form needs one GLOBAL cumulative sum, a
    * serial bottleneck; this runs the classic two-level distributed
    * prefix instead: (1) one shuffle collapses the corpus to distinct
    * values with per-sample counts; (2) values roll up to caller-chosen
    * monotone BUCKETS whose per-bucket totals prefix-sum in a
    * single-partition window over |buckets| rows (bounded by the bucket
    * design, independent of data volume — the same bargain as a
    * broadcast join); (3) within-bucket windows partition by bucket and
    * add the bucket offset. Long headroom: cum·n < 2⁶³ holds to ~3·10⁹
    * rows per side; DECIMAL(38) escalation is the documented step
    * beyond (q159 playbook).
    *
    * @param bucketOf monotone (non-decreasing) bucketing of the value
    *                 domain, e.g. `_ div 2500` for $25 buckets of cents
    */
  def ksTwoSample(df: DataFrame, value: Column, isA: Column, isB: Column,
                  bucketOf: Column => Column): DataFrame = {
    val byValue = df
      .select(value.cast("long").as("v"),
        isA.cast("int").as("a"), isB.cast("int").as("b"))
      .filter(col("v").isNotNull && (col("a") === 1 || col("b") === 1))
      .groupBy("v")
      .agg(sum("a").cast("long").as("d1"), sum("b").cast("long").as("d2"))
      .withColumn("bk", bucketOf(col("v")))
    // Bucket offsets: totals per bucket, then an exclusive prefix over
    // the (tiny, bounded) bucket table. The window is single-partition
    // by design — it sees |buckets| rows, never the data.
    val wb = Window.orderBy("bk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = byValue.groupBy("bk")
      .agg(sum("d1").as("s1"), sum("d2").as("s2"))
      .withColumn("o1", sum("s1").over(wb) - col("s1"))
      .withColumn("o2", sum("s2").over(wb) - col("s2"))
      .select("bk", "o1", "o2")
    val wv = Window.partitionBy("bk").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = byValue
      .agg(sum("d1").cast("long").as("n1"), sum("d2").cast("long").as("n2"))
    byValue.join(broadcast(offsets), "bk")
      .withColumn("c1", col("o1") + sum("d1").over(wv))
      .withColumn("c2", col("o2") + sum("d2").over(wv))
      .crossJoin(broadcast(totals))
      .groupBy("n1", "n2")
      .agg(max(abs(col("c1") * col("n2") - col("c2") * col("n1")))
        .as("d_num"))
      .select(col("n1"), col("n2"), col("d_num"),
        expr("(10000 * d_num) div (n1 * n2)").as("ks_bp"))
  }

  /** MANN-WHITNEY U (rank-sum) two-sample test in exact integers — the
    * nonparametric "is one distribution stochastically larger"
    * companion to [[ksTwoSample]]'s shape test. Ties use textbook
    * MIDRANKS, kept integral by working in DOUBLED rank units: a tie
    * run of c values starting after C rows has 2·midrank = 2C + c + 1,
    * so
    *
    *   2·U_A = Σ_{a∈A} 2·midrank(a) − n_A·(n_A+1)
    *
    * is exact, and 2·U_A + 2·U_B = 2·n_A·n_B is the built-in
    * cross-check both engines must reproduce bit-for-bit. The z/p
    * normalization needs sqrt — the STATISTIC is exact, the lookup is
    * the caller's (same no-libm bargain as chi-square).
    *
    * Scale shape: one hash agg collapses the data to value-level
    * (value, n_a, n_b) counts; the running rank offset is the same
    * two-level distributed prefix as [[ksTwoSample]] — a bounded
    * bucket table carries exclusive offsets, the within-bucket window
    * partitions by bucket; output is one row.
    *
    * @param bucketOf monotone (non-decreasing) bucketing of the value
    *                 domain, the ksTwoSample contract
    */
  def mannWhitneyU2(df: DataFrame, value: Column, isA: Column,
                    isB: Column, bucketOf: Column => Column): DataFrame = {
    val byValue = df.select(value.cast("long").as("v"),
        isA.cast("int").as("a"), isB.cast("int").as("b"))
      .filter(col("v").isNotNull && (col("a") === 1 || col("b") === 1))
      .groupBy("v")
      .agg(sum("a").cast("long").as("ca"), sum("b").cast("long").as("cb"))
      .withColumn("bk", bucketOf(col("v")))
    val wb = Window.orderBy("bk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = byValue.groupBy("bk")
      .agg(sum(col("ca") + col("cb")).as("s"))
      .withColumn("off", sum("s").over(wb) - col("s"))
      .select("bk", "off")
    val wv = Window.partitionBy("bk").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byValue.join(broadcast(offsets), "bk")
      .withColumn("cbefore",
        col("off") + coalesce(sum(col("ca") + col("cb")).over(wv), lit(0L)))
      .withColumn("mr2",
        lit(2L) * col("cbefore") + col("ca") + col("cb") + 1L)
    ranked.agg(
        sum("ca").cast("long").as("n_a"),
        sum("cb").cast("long").as("n_b"),
        sum(col("ca") * col("mr2")).cast("long").as("r2a"),
        sum(col("cb") * col("mr2")).cast("long").as("r2b"))
      .select(col("n_a"), col("n_b"),
        (col("r2a") - col("n_a") * (col("n_a") + 1L)).as("u2_a"),
        (col("r2b") - col("n_b") * (col("n_b") + 1L)).as("u2_b"))
  }

  /** Pearson CHI-SQUARE independence statistic over a two-way
    * contingency table, in exact basis points. Clearing E = r·c/N from
    * the textbook Σ(O−E)²/E gives the all-integer per-cell term
    *
    *   cell_bp = 10⁴·(o·N − r·c)² div (N·r·c)
    *
    * — numerator and denominator both non-negative, so Spark's
    * truncating `div` and DuckDB's flooring `//` agree (the object's
    * standing sign contract). Intermediates run in DECIMAL(38,0):
    * (o·N)² needs ~4·log₁₀(rows) digits, so the headroom holds to ~1e8
    * rows per table — far past any per-batch contingency this serves.
    * Alongside: the observed-cell degrees of freedom
    * (cells − distinct_a − distinct_b + 1, the (r−1)(c−1) of the
    * observed support) and N, so a caller can look up the critical
    * value. The no-libm bargain once more: the p-value needs the
    * incomplete gamma, the STATISTIC is exact.
    *
    * Scale shape: one hash agg on (a, b) collapses the data to the
    * cell table; margins and N are cell-table-sized aggs broadcast
    * back; the result is one row. Nothing after the first agg ever
    * sees a data-sized row count.
    */
  def chiSquareBp(df: DataFrame, a: Column, b: Column): DataFrame = {
    // cached (r15, guide §5): the contingency table is consumed by
    // FOUR branches (cells, row totals, column totals, grand total) —
    // without the cache each branch re-executes the ENTIRE upstream
    // (for q237 that is the co-occurrence edge build + two degree
    // joins + this agg, replicated 4x in the plan; exchange reuse did
    // not dedupe the replicas at runtime — measured). The cached table
    // is ≤ |bins(a)|·|bins(b)| rows (both bitlen-bounded for every
    // caller), so the cache is bytes. In-query cache: released by the
    // caller's clearCache, the coOccurrenceEdgesUV convention.
    val cells = df.select(a.as("ca"), b.as("cb"))
      .filter(col("ca").isNotNull && col("cb").isNotNull)
      .groupBy("ca", "cb")
      .agg(count(lit(1)).cast("decimal(38,0)").as("o"))
      .cache()
    val rowT = cells.groupBy("ca").agg(sum("o").as("r"))
    val colT = cells.groupBy("cb").agg(sum("o").as("c"))
    val tot = cells.agg(sum("o").as("nn"))
    cells
      .join(broadcast(rowT), "ca")
      .join(broadcast(colT), "cb")
      .crossJoin(broadcast(tot))
      .agg(
        sum(expr("(10000 * (o * nn - r * c) * (o * nn - r * c)) div (nn * r * c)"))
          .cast("long").as("chi2_bp"),
        (count(lit(1)) - countDistinct("ca") - countDistinct("cb") + 1)
          .cast("long").as("dof"),
        max(col("nn")).cast("long").as("n"))
  }

  /** HBOS-flavored multivariate rarity: per feature, a global
    * equi-width histogram (`buckets` bins over [min, max]); a row's
    * rarity is the PRODUCT of its bins' occupancy counts — the exact
    * integer monotone of the histogram-based outlier score (HBOS sums
    * log inverse densities; the count product ranks identically with
    * no libm in sight, the no-float contract). Smallest product = the
    * row sitting in the jointly emptiest corner of feature space.
    *
    * Bin index = ((v−lo)·buckets) div (hi−lo+1) over long-cast values —
    * operands kept non-negative so Spark trunc and DuckDB floor agree;
    * the product escalates to DECIMAL(38) (three 10⁹-row bins already
    * overflow a long at corpus scale).
    *
    * Scale shape: one scan computes every feature; the per-feature
    * min/max and the bin-occupancy tables are ≤`buckets`-row aggregates
    * (map-side combined), broadcast back — the corpus is never
    * shuffled, so the operator is a scan plus k micro-aggregates
    * regardless of data size. Input must carry `featureCols` as
    * long-castable columns; rows with any NULL feature are dropped
    * (rarity undefined).
    */
  def hbosRarity(df: DataFrame, featureCols: Seq[String],
                 buckets: Int = 16): DataFrame = {
    require(featureCols.nonEmpty, "hbosRarity needs >= 1 feature")
    require(buckets >= 2, "buckets must be >= 2")
    val base0 = featureCols.foldLeft(df) { (acc, f) =>
      acc.withColumn(f, col(f).cast("long"))
    }
    val base = base0.filter(featureCols.map(col(_).isNotNull).reduce(_ && _))
    val aggs = featureCols.flatMap(f =>
      Seq(min(col(f)).as(s"lo_$f"), max(col(f)).as(s"hi_$f")))
    val stats = base.agg(aggs.head, aggs.tail: _*)
    val binned = featureCols.foldLeft(base.crossJoin(broadcast(stats))) {
      (acc, f) =>
        acc.withColumn(s"bin_$f",
          graft.functions.IntMath.intDiv(
            (col(f) - col(s"lo_$f")) * lit(buckets.toLong),
            col(s"hi_$f") - col(s"lo_$f") + lit(1L)).cast("long"))
    }.drop(featureCols.flatMap(f => Seq(s"lo_$f", s"hi_$f")): _*)
    featureCols.foldLeft(binned) { (acc, f) =>
      val occ = binned.groupBy(s"bin_$f")
        .agg(count(lit(1)).cast("decimal(38,0)").as(s"occ_$f"))
      acc.join(broadcast(occ), s"bin_$f")
    }.withColumn("rarity",
      featureCols.map(f => col(s"occ_$f")).reduce(_ * _)
        .cast("decimal(38,0)"))
  }
}
