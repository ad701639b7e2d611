package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash60

/** Deterministic cardinality sketch whose EXACT register contents an
  * independent engine can replay — not just audit the final estimate
  * (q54/q63 do that for Spark's built-in sketches; q118 replays a
  * count-min FREQUENCY sketch — this file holds the distinct-count
  * side). Hashing is the repo-standard 60-bit md5 derivation
  * (`TextFunctions.hash60`), so DuckDB recomputes every register
  * bit-for-bit and the oracle contract covers the sketch ITSELF, not an
  * error band.
  *
  * Why this matters at 100 TB: the sketch is ALGEBRAIC — per-partition
  * partial registers merge associatively (register-wise max), so
  * Catalyst's partial aggregation collapses any input volume to m rows
  * per partition before the one tiny shuffle. Distinct-counting the
  * full corpus costs one scan + a constant-size exchange (contrast
  * exact distinct: a shuffle proportional to the key cardinality).
  *
  * Reference analogue: none (the reference has no sketches); extension
  * in the training-data-pipeline pack, the replayable-contract mirror
  * of `approx_count_distinct`'s role (q54).
  */
object Sketches {

  /** KMV set-operation estimate: |A ∩ B| (and |A ∪ B|) of two scopes'
    * key sets from ONE combined bottom-k sketch — the capability that
    * motivates KMV over HLL (Beyer et al., SIGMOD'07: the bottom-k of
    * the union is a uniform sample of the union, so the fraction of it
    * lying in both sets estimates the Jaccard ratio):
    *
    *   K          = k smallest distinct hashes of A ∪ B
    *   est_union  = (k−1)·2⁶⁰ div max(K)       (exact when |A∪B| < k)
    *   est_inter  = (|{h ∈ K : h ∈ A ∧ h ∈ B}| · est_union) div |K|
    *
    * All integer, replayed bit-for-bit by the oracle; exact true
    * union/intersection audit columns ride alongside (contract only —
    * they are the key-cardinality shuffle the sketch exists to avoid).
    *
    * Scale shape: membership flags fold into the same hash-keyed
    * aggregation that dedups the union (algebraic max); the global
    * bottom-k rank filter gets Spark's WindowGroupLimit treatment — ≤ k
    * rows per partition survive to the single ordering partition, so
    * the "global window" touches k·partitions rows, never the corpus
    * (same shape the q184 plan contract asserts).
    */
  def kmvIntersect(df: DataFrame, key: Column, scope: Column,
                   scopeA: String, scopeB: String, k: Int): DataFrame = {
    require(k >= 2, "kmvIntersect needs k >= 2")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(scope.cast("string").as("scope"),
        key.cast("string").as("kk"))
      .filter(col("scope").isin(scopeA, scopeB))
    val byHash = base.select(col("scope"), hash60(col("kk"), 0).as("h"))
      .groupBy("h").agg(
        max(when(col("scope") === scopeA, 1L).otherwise(0L)).as("in_a"),
        max(when(col("scope") === scopeB, 1L).otherwise(0L)).as("in_b"))
    val sketch = byHash
      .withColumn("rn", row_number().over(Window.orderBy("h")))
      .filter(col("rn") <= k)
      .agg(count(lit(1)).as("n_kept"),
        max(when(col("rn") === k, col("h"))).as("kth_hash"),
        sum(col("in_a") * col("in_b")).as("n_both_in_k"))
      .select(col("n_kept"), col("kth_hash"), col("n_both_in_k"),
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(
            s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * ${1L << 60}) div kth_hash AS BIGINT)"))
          .as("est_union"))
      .withColumn("est_intersect",
        // DECIMAL: a tiny kth_hash makes est_union large enough that the
        // long product n_both·est_union could wrap
        expr("CAST((CAST(n_both_in_k AS DECIMAL(38,0)) * est_union) div n_kept AS BIGINT)"))
    val truth = byHash.agg(
      count(lit(1)).as("n_true_union"),
      sum(col("in_a") * col("in_b")).as("n_true_intersect"))
    sketch.crossJoin(broadcast(truth))
  }

  /** HyperLogLog register table with the raw (uncorrected) estimate,
    * computed so an independent engine replays every register exactly.
    *
    * Registers: m = 2^p; register(k) = h mod m (low p bits), and
    * rho(k) = 1 + number of leading zeros in the REMAINING 60-p bits of
    * the 60-bit hash = (60 - p) - bitlen(h >> p) + 1, with bitlen via
    * the engine-portable `length(bin(x))` (an integer-string op — no
    * libm anywhere). M[r] = max rho over keys landing in r; empty
    * registers are materialized at 0 via a range frame so the estimate
    * denominator is complete.
    *
    * Estimate: raw HLL, alpha_m·m²/Σ2^(−M[r]), evaluated in exact
    * integer arithmetic by scaling the harmonic sum by 2^60:
    * est = (alpha_num·m²·2^60) div (alpha_den·Σ2^(60−M[r])) — the
    * division is integral (both engines truncate non-negatives
    * identically). alpha for m=64 is 0.709 = 709/1000 (Flajolet et al.;
    * bias correction for small/large ranges is deliberately NOT applied
    * — the contract is the raw estimator, which is what merges).
    *
    * Output: one row per register (register, rho) with the constant
    * (est, n_true) columns alongside — the register table IS the
    * mergeable sketch state, the thing a 1000-executor run ships.
    *
    * Scale shape: register build is one aggregation with map-side max
    * partials → at most m rows per partition on the wire; the harmonic
    * sum folds the m-row table on one node (m = 64); the exact n_true
    * audit is the only key-cardinality shuffle and exists for the
    * contract, not the production path.
    */
  /** KMV (k-minimum-values / bottom-k) distinct sketch per scope, plus
    * the union scope "__union" — the OTHER classic mergeable
    * cardinality sketch, complementary to [[hllReplay]]: where HLL
    * merges by register-max, KMV merges by keeping the k smallest
    * hashes of the union, which additionally supports set-intersection
    * estimates downstream (Beyer et al., SIGMOD'07). Everything is
    * exact-integer so DuckDB replays the sketch itself:
    *
    *   est = (k−1)·2⁶⁰ div h_(k)    — h_(k) = k-th smallest distinct
    *                                   60-bit key hash in the scope
    *   est = n_hashes (exact)        — when the scope holds < k keys
    *                                   (the sketch IS the key set)
    *
    * The (k−1)·2⁶⁰ product overflows Long for k > 8 — the arithmetic
    * runs in DECIMAL(38,0) on both engines.
    *
    * Scale shape: hashing is a scan-side projection; the distinct
    * (scope, hash) pass and the per-scope bottom-k window share one
    * scope-keyed exchange (at production scale the bottom-k rides the
    * TopKPerKey plan node — partial heaps ship ≤ k rows per
    * scope·partition, so the union scope costs k rows per partition,
    * not a global distinct). The exact n_true audit column is the only
    * key-cardinality shuffle and exists for the contract, not the
    * production path.
    */
  def kmvReplay(df: DataFrame, key: Column, scope: Column, k: Int): DataFrame = {
    require(k >= 2, "kmvReplay needs k >= 2")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(scope.cast("string").as("scope"),
      key.cast("string").as("kk"))
    val all = base.unionAll(base.withColumn("scope", lit("__union")))
      .select(col("scope"), col("kk"), hash60(col("kk"), 0).as("h"))
    val d = all.select("scope", "h").distinct()
    val nHashes = d.groupBy("scope").agg(count(lit(1)).as("n_hashes"))
    val kth = d.withColumn("rn",
        row_number().over(Window.partitionBy("scope").orderBy("h")))
      .filter(col("rn") === k)
      .select(col("scope"), col("h").as("kth_hash"))
    val nTrue = all.groupBy("scope").agg(count_distinct(col("kk")).as("n_true"))
    nHashes.join(kth, Seq("scope"), "left").join(nTrue, "scope")
      .select(col("scope"),
        least(col("n_hashes"), lit(k.toLong)).as("n_kept"),
        col("kth_hash"),
        when(col("n_hashes") < k, col("n_hashes"))
          .otherwise(expr(
            s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * ${1L << 60}) div kth_hash AS BIGINT)"))
          .as("est"),
        col("n_true"))
  }

  def hllReplay(df: DataFrame, key: Column, p: Int): DataFrame = {
    require(p >= 2 && p <= 16, "hllReplay supports p in [2,16]")
    val m = 1 << p
    val spark = df.sparkSession
    val h = hash60(key.cast("string"), 0)
    // rho = 1 + leading zeros of the (60-p)-bit remainder: for rem > 0
    // that is (60-p) + 1 - bitlen(rem); the all-zeros remainder pins to
    // the field width + 1 (bin(0) = "0" has length 1, NOT bitlen 0, so
    // it needs the explicit branch)
    val rem = shiftright(h, p)
    val occupied = df
      .select(pmod(h, lit(m)).as("register"),
        when(rem === 0, lit((60 - p) + 1).cast("long"))
          .otherwise((lit((60 - p) + 1) - length(bin(rem))).cast("long"))
          .as("rho0"))
      .groupBy("register").agg(max("rho0").as("rho"))
    val allRegs = spark.range(m).select(col("id").as("register"))
    val regs = allRegs.join(occupied, Seq("register"), "left")
      .select(col("register"), coalesce(col("rho"), lit(0L)).as("rho"))
    val harm = regs.agg(sum(expr(
      "CAST(shiftleft(CAST(1 AS BIGINT), 60 - CAST(rho AS INT)) AS DECIMAL(38,0))"))
      .as("s"))
    val alphaNum = BigDecimal(709) * m * m * BigDecimal(2).pow(60)
    val est = harm.select(expr(
      s"CAST($alphaNum AS DECIMAL(38,0)) div (1000 * s)").as("est"))
    val nTrue = df.agg(count_distinct(key).as("n_true"))
    regs.crossJoin(broadcast(est)).crossJoin(broadcast(nTrue))
      .select(col("register"), col("rho"), col("est"), col("n_true"))
  }

  /** Per-group HLL register PARTIAL of one insert batch — the
    * distinct-IVM state for cardinalities where the exact support
    * table (q270, size ∝ total distinct values) is unaffordable: at
    * most m = 2^p rows per group, FOREVER, whatever the data volume.
    * Registers are sparse (an absent register means rho 0), so small
    * groups cost only their occupied registers.
    *
    * The state algebra is register-wise MAX — associative, commutative
    * and IDEMPOTENT, which buys what neither counter nor support state
    * has: replaying a duplicate batch (at-least-once delivery, a
    * BatchState retry) is a NO-OP on the merged state, so the sketch
    * path needs no exactly-once bookkeeping at all. The price is
    * insert-only maintenance — max has no inverse, so a workload with
    * retractions takes the exact support state instead; the two are a
    * documented pairing (q270 exact / q277 approximate), not
    * alternatives hiding each other's limits.
    *
    * Scale shape: one map-side-combined aggregation per batch keyed on
    * (group, register) — partials collapse every partition to ≤ m rows
    * per group before the one tiny shuffle; maintenance never rescans
    * history ([[mergeHllState]] is state ∪ partial → max).
    */
  def hllState(df: DataFrame, groupCols: Seq[String], key: Column,
               p: Int): DataFrame = {
    require(p >= 2 && p <= 16, "hllState supports p in [2,16]")
    val m = 1 << p
    val h = hash60(key.cast("string"), 0)
    val rem = shiftright(h, p)
    // NULL keys are IGNORED — SQL COUNT(DISTINCT) semantics, and the
    // contract the estimate needs: an unfiltered null hashes to a
    // (group, NULL register) state row whose rho the harmonic sum
    // skips but whose n_regs the completion term counts, silently
    // skewing every estimate for the group.
    df.filter(key.isNotNull)
      .select(groupCols.map(col) :+ pmod(h, lit(m)).as("register")
        :+ when(rem === 0, lit((60 - p) + 1).cast("long"))
          .otherwise((lit((60 - p) + 1) - length(bin(rem))).cast("long"))
          .as("rho"): _*)
      .groupBy((groupCols :+ "register").map(col): _*)
      .agg(max("rho").as("rho"))
  }

  /** Merge register states/partials by (group, register) max — the
    * abelian idempotent fold that makes the state batch-split and
    * replay invariant ([[hllState]]'s header). Inputs are
    * select-normalized before the union (the round-10 positional-union
    * lesson).
    */
  def mergeHllState(states: Seq[DataFrame],
                    groupCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeHllState needs at least one state")
    val keys = (groupCols :+ "register").map(col)
    states.map(_.select(keys :+ col("rho"): _*))
      .reduce(_ unionAll _)
      .groupBy(keys: _*).agg(max("rho").as("rho"))
  }

  /** Signed COUNT-MIN cell partial of one batch — the approximate
    * FREQUENCY-IVM state, completing the matrix the exact/approximate
    * pairing spans: q200/applyAggDelta (exact per-key counts, state ∝
    * keys) ↔ this (approximate counts, state ≤ depth·width cells
    * FOREVER), as q270's support table (exact distinct) ↔ q277's HLL
    * registers (approximate distinct). Unlike HLL's max, CMS cells
    * are SUMS — abelian with an inverse — so retractions work (a
    * delete subtracts from the same depth cells its insert added, and
    * the estimate stays ≥ the true count for any consistent history:
    * every cell holds true_count(key) + Σ colliding net counts, all
    * ≥ 0). The flip side, documented not hidden: sums are NOT
    * idempotent, so a replayed batch double-counts — CMS maintenance
    * needs the BatchState commit discipline that HLL's idempotent max
    * lets q277 skip.
    *
    * `delta` carries `sign` (+1 insert, −1 retraction of an existing
    * row). Cells landing at 0 are compacted away (absent == 0 for
    * both the estimate's left join and every future merge). Hashing
    * is `hash60(key, 101 + r)` — the q118 constants, so the DuckDB
    * oracle replays every cell.
    *
    * Scale shape: one map-side-combined aggregation per batch keyed
    * on (r, bkt) — ≤ depth·width rows survive per partition before
    * the one tiny shuffle; maintenance never rescans history
    * ([[mergeCmsState]] is state ∪ partial → sum).
    */
  def cmsState(delta: DataFrame, key: Column, depth: Int,
               width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "cmsState needs depth >= 1, width >= 2")
    // NULL keys are IGNORED (SQL COUNT(col) semantics) — unfiltered
    // they would land a NULL-bucket cell row that every later merge
    // carries and no probe can read (hllState's contract, same reason)
    val rows = delta.filter(key.isNotNull)
      .select(key.cast("string").as("__k"),
        col("sign").cast("long").as("sign"))
    rows.select(col("sign"), explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"),
          (hash60(col("__k"), 101 + r) % width).cast("int").as("bkt"))): _*))
        .as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bkt").as("bkt"))
      .agg(sum("sign").as("c"))
      .filter(col("c") =!= 0L)
  }

  /** Merge CMS cell states/partials by (r, bkt) addition — abelian, so
    * any batch split folds to the same state; zero cells compacted
    * ([[cmsState]]'s header). Inputs select-normalized before the
    * union (the round-10 positional-union lesson).
    */
  def mergeCmsState(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "mergeCmsState needs at least one state")
    states.map(_.select(col("r"), col("bkt"), col("c")))
      .reduce(_ unionAll _)
      .groupBy("r", "bkt").agg(sum("c").as("c"))
      .filter(col("c") =!= 0L)
  }

  /** Point estimates from a CMS state for the keys of `probes`
    * (expected distinct on `key`): min over the depth cells, absent
    * cells reading 0 through the left join. Broadcasting the ≤
    * depth·width-cell state makes the probe pass one map-side join —
    * the whole reason the sketch replaces a key-cardinality shuffle.
    */
  def cmsEstimateFor(state: DataFrame, probes: DataFrame, key: Column,
                     depth: Int, width: Int): DataFrame = {
    val keyed = probes.withColumn("__k", key.cast("string"))
    keyed
      .select(col("*"), explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"),
          (hash60(col("__k"), 101 + r) % width).cast("int").as("bkt"))): _*))
        .as("rb"))
      .select(col("*"), col("rb.r").as("r"), col("rb.bkt").as("bkt"))
      .join(broadcast(state), Seq("r", "bkt"), "left")
      .groupBy((keyed.columns.map(col)): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
      .drop("__k")
  }

  /** Derive the per-group raw-HLL estimate from a sparse register
    * state: sv = Σ_occupied 2^(60−rho) + (m − n_occupied)·2^60 (the
    * absent registers' rho-0 terms restored in closed form — no dense
    * m-row completion per group), est = 0.709·m² · 2^60 div (sv/1000)
    * in exact decimal arithmetic, same constants as [[hllReplay]] so
    * the oracle replays the estimate bit-for-bit.
    */
  def hllEstimateFromState(state: DataFrame, groupCols: Seq[String],
                           p: Int): DataFrame = {
    require(p >= 2 && p <= 16, "hllEstimateFromState supports p in [2,16]")
    val m = 1 << p
    val pow60 = "CAST(1152921504606846976 AS DECIMAL(38,0))" // 2^60
    val alphaNum = BigDecimal(709) * m * m * BigDecimal(2).pow(60)
    state
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_regs"),
        sum(expr(
          "CAST(shiftleft(CAST(1 AS BIGINT), 60 - CAST(rho AS INT)) AS DECIMAL(38,0))"))
          .as("__sv_occ"))
      .select(groupCols.map(col) :+ col("n_regs") :+ expr(
        s"""CAST(CAST($alphaNum AS DECIMAL(38,0)) div
           |(1000 * (__sv_occ + ($m - n_regs) * $pow60)) AS BIGINT)"""
          .stripMargin.replace('\n', ' ')).as("est"): _*)
  }
}
