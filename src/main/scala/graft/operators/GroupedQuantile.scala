package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT per-group order statistics (median, p90, k-th smallest) over
  * long-valued columns WITHOUT sorting any group in one task — the
  * distributed-selection primitive behind exact MAD outlier detection
  * (q122) and exact grouped percentiles (q121). The approximate path
  * for wide exploratory sweeps is approx_percentile (q63's audited
  * sketch); this is the exact path whose per-group cost stays
  * sublinear in group size.
  *
  * Two passes over the fact table, both cheap:
  *  1. per-group (min, max, n) -> broadcast; per-row equi-width bucket
  *     (a scan-side projection) -> (group, bucket) counts, a tiny
  *     (G x buckets) table whose per-group prefix sums locate the ONE
  *     bucket holding the target rank;
  *  2. rows of the selected bucket only (~n/buckets of each group) are
  *     re-scanned and ranked by a per-group window — the only sort
  *     anywhere runs on the thin selected slice, never the full group.
  *
  * Exactness does not depend on the bucket boundaries (floats only
  * steer distribution): equal values share a bucket, lower buckets hold
  * strictly smaller values, so local rank + prefix count == global
  * rank. Degenerate case: a group whose values are all equal collapses
  * to one bucket and the "thin slice" is the whole group — correct,
  * documented, and irrelevant to the quantile (every value is the
  * answer).
  */
object GroupedQuantile {

  /** One row per group: (g, kth_value) where kth_value is the
    * `rankOf(n)`-th smallest `value` (1-based) in the group.
    * `tie` must make (value, tie) unique within a group.
    */
  def kthSmallestLong(df: DataFrame, group: Column, value: Column,
                      tie: Column, rankOf: Column => Column,
                      buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    val base = df.select(group.as("g"), value.as("v"), tie.as("t"))
    val stats = base.groupBy("g")
      .agg(min("v").as("lo"), max("v").as("hi"), count(lit(1)).as("n"))
      .withColumn("r", rankOf(col("n")))
    val b = base.join(broadcast(stats.select("g", "lo", "hi")), "g")
      .withColumn("bkt", when(col("hi") === col("lo"), lit(0))
        // Cast BEFORE subtracting: (v - lo) as raw longs overflows when
        // the domain spans more than Long range; double subtraction
        // keeps bucket monotonicity (rounding preserves order).
        .otherwise(least(lit(buckets - 1),
          floor((col("v").cast("double") - col("lo").cast("double")) /
            (col("hi").cast("double") - col("lo").cast("double")) * buckets)))
        .cast("int"))
      .drop("lo", "hi")
    val bc = b.groupBy("g", "bkt").agg(count(lit(1)).as("c"))
    val cum = bc.withColumn("cum_prev",
      coalesce(sum("c").over(Window.partitionBy("g").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val sel = cum.join(stats.select("g", "r"), "g")
      .filter(col("r") > col("cum_prev") &&
        col("r") <= col("cum_prev") + col("c"))
      .select(col("g"), col("bkt"), (col("r") - col("cum_prev")).as("local_r"))
    val wv = Window.partitionBy("g").orderBy(col("v").asc, col("t").asc)
    b.join(broadcast(sel), Seq("g", "bkt"))
      .withColumn("rn", row_number().over(wv))
      .filter(col("rn") === col("local_r"))
      .select(col("g"), col("v").as("kth_value"))
  }

  /** Lower median rank: (n+1) div 2. */
  def lowerMedianRank(n: Column): Column =
    graft.functions.IntMath.intDiv(n + lit(1L), lit(2L))

  /** ceil(pct% of n) as an integer rank, pct in (0,100]. */
  def pctRank(pct: Int)(n: Column): Column =
    graft.functions.IntMath.intDiv(lit(pct.toLong) * n + lit(99L), lit(100L))
}
