package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff (change-data-capture between two table versions):
  * classify every key as insert / delete / update / unchanged by a
  * single key-partitioned FULL OUTER join — the "what changed since
  * yesterday's load?" primitive that incremental pipelines build
  * their change feeds from (the batch complement of q88's latest-wins
  * upsert: upsert APPLIES a delta, diff RECOVERS one).
  *
  * Comparison is null-safe (`<=>`) per compare column, so NULL -> value
  * and value -> NULL both classify as update, and NULL == NULL as
  * unchanged.
  *
  * Scale shape: ONE exchange per side, both hash-partitioned on the
  * key — at warehouse scale, land both snapshots bucketed on the key
  * (Warehouse.loadBucketed) and the exchanges disappear entirely;
  * nothing global, nothing driver-side.
  */
object Diff {

  def snapshotDiff(base: DataFrame, next: DataFrame, keys: Seq[String],
                   compare: Seq[String]): DataFrame = {
    val bm = base.select(
      keys.map(col) ++ compare.map(c => col(c).as(s"b_$c"))
        :+ lit(1).as("b_present"): _*)
    val nm = next.select(
      keys.map(col) ++ compare.map(c => col(c).as(s"n_$c"))
        :+ lit(1).as("n_present"): _*)
    val changed: Column = compare
      .map(c => !(col(s"b_$c") <=> col(s"n_$c")))
      .reduce(_ || _)
    bm.join(nm, keys, "full_outer")
      .withColumn("diff_status",
        when(col("b_present").isNull, lit("insert"))
          .when(col("n_present").isNull, lit("delete"))
          .when(changed, lit("update"))
          .otherwise(lit("unchanged")))
      .drop("b_present", "n_present")
  }
}
