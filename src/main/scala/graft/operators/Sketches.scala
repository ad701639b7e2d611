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
}
