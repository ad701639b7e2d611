package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — enrich each left row with the most recent right row at
  * or before its time, per key. Spark has no native asof operator; the
  * scalable composition is the union+window pattern:
  *
  *   1. union both sides into (key, time, side, payload) rows
  *   2. ONE shuffle: window partitioned by key, ordered by
  *      (time, side, tiebreak) — right rows sort before left rows at
  *      equal times, so matches are inclusive (right.time <= left.time)
  *   3. last(payload, ignoreNulls) over the running frame carries the
  *      latest right payload forward; keep only left rows
  *
  * No range-explosion (the naive t1 >= t2 theta-join is O(n·m) per
  * key), no broadcast requirement, state = one payload per key per
  * partition — the plan that survives both sides being huge, matching
  * how a stream-stream temporal join would shard.
  *
  * Determinism contract: callers must ensure at most one right row per
  * (key, time) (dedupe first) — otherwise "the" most recent row at a
  * tied time is not well-defined in any engine.
  *
  * Column contract (like RangeJoin's): the names `__k`, `__t`, `__side`,
  * `__p`, `__match` are reserved for the internal union layout — a left
  * DataFrame (or payload alias) using any of them is rejected up front,
  * since the positional union would silently misalign otherwise. Output =
  * every left column unchanged + `__match` (struct of the payload fields,
  * null when no right row at or before the left time).
  */
object AsOfJoin {

  private val reserved = Set("__k", "__t", "__side", "__p", "__match")

  /** @param left      probe side (each row gets enriched)
    * @param right     reference side (must be unique per (key, time))
    * @param leftKey   join key on left;  @param rightKey on right
    * @param leftTime  event time on left; @param rightTime on right
    * @param payload   right-side columns to carry (renamed as given)
    */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: Column, rightKey: Column,
           leftTime: Column, rightTime: Column,
           payload: Seq[(Column, String)]): DataFrame = {
    val clashes = (left.columns.toSet ++ payload.map(_._2)) & reserved
    require(clashes.isEmpty,
      s"asof reserves ${reserved.mkString(", ")} internally; rename: ${clashes.mkString(", ")}")
    val pType = payloadType(right, payload)
    val leftCols = left.columns.toSeq
    val lAligned = left.select(
      (Seq(leftKey.as("__k"), leftTime.as("__t"), lit(1).as("__side"),
        lit(null).cast(pType).as("__p")) ++ leftCols.map(col)): _*)
    val rAligned = right.select(
      (Seq(rightKey.as("__k"), rightTime.as("__t"), lit(0).as("__side"),
        struct(payload.map { case (c, n) => c.as(n) }: _*).as("__p")) ++
        leftCols.map(n => lit(null).cast(left.schema(n).dataType).as(n))): _*)
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rAligned.union(lAligned)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) :+ col("__match")): _*)
  }

  /** NEAREST-direction as-of (pandas merge_asof direction='nearest'):
    * each left row matches the right row closest in time — before OR
    * after — per key, ties preferring the backward match. Same
    * union+window shape as [[asof]], with BOTH running frames over the
    * one (key, time, side) sort: `last ignore-nulls` over the preceding
    * frame carries the latest earlier right row, `first ignore-nulls`
    * over the following frame the earliest later one; the winner is an
    * arithmetic pick. Still ONE shuffle — the two window frames share
    * partitioning and order. Right rows at the exact left time sort
    * before the left row (side 0 < 1), so an equal-time match counts as
    * backward with gap 0.
    *
    * Times must arrive as LONG micros (callers convert timestamps via
    * unix_micros) so the gap arithmetic is exact integers. Output =
    * every left column + near_id / direction ('b'/'f', null when the
    * key has no right rows at all) / gap_us.
    *
    * Tie rule when several right rows share one (key, time): the window
    * order includes `__rid`, so the backward carry resolves to the MAX
    * right id at that time and the forward carry to the MIN — fully
    * deterministic in both engines with no caller dedupe contract
    * (unlike [[asof]], which requires unique (key, time) because a tied
    * payload has no well-defined winner).
    */
  def asofNearest(left: DataFrame, right: DataFrame,
                  leftKey: Column, rightKey: Column,
                  leftTime: Column, rightTime: Column,
                  rightId: Column): DataFrame = {
    val internal = Set("__k", "__t", "__side", "__rid",
      "__bt", "__bid", "__ft", "__fid")
    val outputs = Set("near_id", "direction", "gap_us")
    val clashes = left.columns.toSet & (internal ++ outputs)
    require(clashes.isEmpty,
      s"asofNearest reserves ${(internal ++ outputs).mkString(", ")}; " +
        s"rename: ${clashes.mkString(", ")}")
    val leftCols = left.columns.toSeq
    val lAligned = left.select(
      (Seq(leftKey.as("__k"), leftTime.cast("long").as("__t"),
        lit(1).as("__side"), lit(null).cast("long").as("__rid")) ++
        leftCols.map(col)): _*)
    val rAligned = right.select(
      (Seq(rightKey.as("__k"), rightTime.cast("long").as("__t"),
        lit(0).as("__side"), rightId.cast("long").as("__rid")) ++
        leftCols.map(n => lit(null).cast(left.schema(n).dataType).as(n))): _*)
    // __rid in the order makes tied right rows deterministic (left rows
    // carry a null __rid and only tie among themselves, where order is
    // irrelevant — each sees the same right rows either way)
    val order = Seq(col("__t"), col("__side"), col("__rid"))
    val wb = Window.partitionBy("__k").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("__k").orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rt = when(col("__side") === 0, col("__t"))
    val rid = when(col("__side") === 0, col("__rid"))
    val enriched = rAligned.union(lAligned)
      .withColumn("__bt", last(rt, ignoreNulls = true).over(wb))
      .withColumn("__bid", last(rid, ignoreNulls = true).over(wb))
      .withColumn("__ft", first(rt, ignoreNulls = true).over(wf))
      .withColumn("__fid", first(rid, ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
    val backWins = col("__ft").isNull ||
      (col("__bt").isNotNull &&
        col("__t") - col("__bt") <= col("__ft") - col("__t"))
    enriched.select((leftCols.map(col) ++ Seq(
      when(col("__bt").isNull && col("__ft").isNull, lit(null).cast("long"))
        .when(backWins, col("__bid")).otherwise(col("__fid")).as("near_id"),
      when(col("__bt").isNull && col("__ft").isNull, lit(null).cast("string"))
        .when(backWins, lit("b")).otherwise(lit("f")).as("direction"),
      when(col("__bt").isNull && col("__ft").isNull, lit(null).cast("long"))
        .when(backWins, col("__t") - col("__bt"))
        .otherwise(col("__ft") - col("__t")).as("gap_us"))): _*)
  }

  private def payloadType(right: DataFrame,
                          payload: Seq[(Column, String)]): org.apache.spark.sql.types.DataType = {
    // resolve payload column types from a zero-row projection
    val probe = right.select(payload.map { case (c, n) => c.as(n) }: _*)
    org.apache.spark.sql.types.StructType(probe.schema.fields)
  }
}
