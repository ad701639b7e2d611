package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT global ranking — the building block for equi-depth
  * histograms, exact quantile binning, and "give every row its position
  * in the total order" jobs, WITHOUT the single-partition window that
  * `row_number() OVER (ORDER BY ...)` plans to (one reducer holding the
  * whole table — the canonical global-sort scale killer).
  *
  * Shape: one broadcast min/max row splits the value domain into
  * `preBuckets` equi-width coarse buckets (a pure per-row expression on
  * the scan — no shuffle); per-bucket counts collapse to `preBuckets`
  * rows whose prefix sums become broadcast rank offsets; the only
  * fact-table shuffle is the per-bucket window, whose partitions are
  * 1/preBuckets of the data each. global_rank = bucket offset + local
  * row_number, EXACT for the unique total order (value, tie) no matter
  * how skewed the bucket sizes are — the prebucketing affects only
  * distribution, never the answer, so callers' oracles replay a plain
  * `row_number() OVER (ORDER BY value, tie)`.
  *
  * The offsets window (`orderBy(pre_bucket)` with no partition) runs on
  * the `preBuckets`-row side table only — a deliberate tiny-data
  * single-partition window, same class as q112's broadcast min/max row.
  * At 100 TB with pathological value skew (one value = half the corpus)
  * a single bucket still concentrates that value's rows; the tie column
  * can be appended to the prebucket key in that regime — documented,
  * not defaulted, because it costs a second counts pass.
  */
object Rank {

  /** Adds `global_rank` (1-based, dense total order by (`valueCol`,
    * `tieCol`) ascending) to `df`. `tieCol` must make the order unique.
    */
  def globalRank(df: DataFrame, valueCol: String, tieCol: String,
                 preBuckets: Int = 256): DataFrame = {
    require(preBuckets >= 2, "preBuckets must be >= 2")
    val v = col(valueCol)
    val mm = df.agg(min(v).cast("double").as("rk_lo"),
      max(v).cast("double").as("rk_hi"))
    val pre = when(col("rk_hi") === col("rk_lo"), lit(0))
      .otherwise(least(lit(preBuckets - 1),
        floor((v.cast("double") - col("rk_lo")) /
          (col("rk_hi") - col("rk_lo")) * preBuckets)))
      .cast("int")
    val b = df.crossJoin(broadcast(mm))
      .withColumn("rk_bucket", pre)
      .drop("rk_lo", "rk_hi")
    val counts = b.groupBy("rk_bucket").agg(count(lit(1)).as("rk_cnt"))
    val offs = counts
      .withColumn("rk_off",
        coalesce(sum("rk_cnt").over(Window.orderBy("rk_bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("rk_bucket", "rk_off")
    val w = Window.partitionBy("rk_bucket").orderBy(v.asc, col(tieCol).asc)
    b.join(broadcast(offs), "rk_bucket")
      .withColumn("global_rank", col("rk_off") + row_number().over(w))
      .drop("rk_bucket", "rk_off")
  }

  /** Equi-DEPTH histogram over `valueCol`: `k` bins of (near-)equal row
    * count from the exact global rank — bin = (rank-1)*k div n + 1, the
    * integer formula both engines replay exactly (unlike SQL `ntile`,
    * whose remainder placement this deliberately does not imitate —
    * the formula is the contract). Output: (bin, n_rows, lo, hi).
    */
  def equiDepthHistogram(df: DataFrame, valueCol: String, tieCol: String,
                         k: Int, preBuckets: Int = 256): DataFrame = {
    val ranked = globalRank(df.select(valueCol, tieCol), valueCol, tieCol,
      preBuckets)
    val tot = df.agg(count(lit(1)).as("rk_n"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("bin",
        (expr(s"(global_rank - 1) * $k div rk_n") + 1L).cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"),
        round(min(valueCol), 2).as("lo"), round(max(valueCol), 2).as("hi"))
      .orderBy("bin")
  }
}
