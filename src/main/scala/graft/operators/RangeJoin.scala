package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — pair left rows with right rows of the same
  * key whose time opens an interval containing the left time:
  * `rightTime <= leftTime < rightTime + window`.
  *
  * The naive formulation is an equi-join on the key with a range theta
  * predicate — Spark executes that as a join + filter whose per-key
  * cost is O(n·m). The scalable composition BUCKETIZES time by the
  * window length: an interval [t, t+W) overlaps at most two W-sized
  * buckets, so replicating each right row into (bucket, bucket+1) and
  * equi-joining on (key, bucket) bounds the candidate space to rows at
  * most one bucket apart, then the exact predicate filters. Shuffle
  * keys are (key, bucket) — skew in time is spread across buckets.
  */
object RangeJoin {

  /** @param windowUs interval length in microseconds
    * @note left and right must not share column names (rename the right
    *       side first, as a self-join caller would anyway) — the output
    *       carries both sides' columns verbatim.
    */
  def withinAfter(left: DataFrame, right: DataFrame,
                  leftKey: Column, rightKey: Column,
                  leftTime: Column, rightTime: Column,
                  windowUs: Long): DataFrame = {
    val l = left
      .withColumn("__k", leftKey)
      .withColumn("__lt", unix_micros(leftTime))
      .withColumn("__b", floor(col("__lt") / windowUs))
    val r0 = right
      .withColumn("__k", rightKey)
      .withColumn("__rt", unix_micros(rightTime))
    val r = r0
      .withColumn("__b",
        explode(array(floor(col("__rt") / windowUs),
          floor(col("__rt") / windowUs) + 1)))
    l.join(r, Seq("__k", "__b"))
      .filter(col("__rt") <= col("__lt") &&
        col("__lt") < col("__rt") + windowUs)
      .drop("__k", "__b", "__lt", "__rt")
  }
}
