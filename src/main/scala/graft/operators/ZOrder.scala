package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) clustering for multi-dimensional data skipping —
  * the lakehouse layout technique: interleaving the bits of two sort
  * dimensions gives a single clustering key whose ranges are small in
  * BOTH dimensions at once, so file-level min/max statistics prune
  * scans filtered on EITHER column. A plain sort clusters only its
  * leading column; z-order trades a little locality in each dimension
  * for locality in all of them.
  *
  * `zValue` is a pure per-row expression (codegen'd shift/mask fold, no
  * UDF); the layout job is `repartitionByRange(zValue)` + write, and
  * the skipping payoff is measurable as the per-bucket min/max span of
  * each dimension — which is exactly what `bucketStats` emits, making
  * the clustering claim itself oracle-checkable.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of x (even positions) and
    * y (odd positions). Callers pre-reduce dimensions to non-negative
    * ints below 2^bits (rank, bucket, or modulo — the standard z-order
    * prep); bits <= 31 keeps the result in a positive long.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Per-z-bucket statistics of the two source dimensions: row count
    * and each dimension's min/max — the file-level stats a scan planner
    * prunes on. Bucket = z div 2^shift (a contiguous z-range ≈ one
    * output file); small spans in BOTH min/max pairs are the data-
    * skipping win the layout buys.
    */
  def bucketStats(df: DataFrame, x: Column, y: Column,
                  bits: Int, shift: Int): DataFrame = {
    val z = zValue(x, y, bits)
    df.select(x.as("x"), y.as("y"),
        graft.functions.IntMath.intDiv(z, lit(1L << shift)).as("z_bucket"))
      .groupBy("z_bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .orderBy("z_bucket")
  }
}
