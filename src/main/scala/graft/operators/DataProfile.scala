package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ONE-PASS multi-column table profiling — the warehouse's
  * ANALYZE-TABLE surface: per column, null count, exact distinct
  * cardinality, an HLL sketch audited against it (the q54 pattern —
  * at 100 TB the sketch is the only viable per-column stat, and the
  * audit is how switching to it is justified), and min/max rendered as
  * strings so one schema carries every column type.
  *
  * Scale shape: a single aggregation pass over the scan computes every
  * column's stats together — one job, not |cols| jobs. The exact
  * count-distincts make Catalyst plan an expand (|cols| rows per input
  * row into partial aggs); that is the documented price of EXACT
  * cardinalities, paid so the sketch audit means something — a
  * production profile at 100 TB drops the exact columns and keeps the
  * (already map-side-merged, constant-memory) HLL path. The reshape to
  * one row per column is a per-row explode of a |cols|-element array on
  * the SINGLE aggregated row — no extra shuffle.
  */
object DataProfile {

  def profile(df: DataFrame, cols: Seq[String],
              approxRelTol: Double = 0.1): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__nd"),
      approx_count_distinct(col(c)).as(s"${c}__approx"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    one.select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        (abs(col(s"${c}__approx") - col(s"${c}__nd")) <=
          col(s"${c}__nd") * approxRelTol).as("approx_ok"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))): _*)).as("p"))
      .select("p.*")
      .orderBy("column")
  }
}
