package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream INTERVAL join (§2.9's join mechanism): match right-
  * stream rows to left-stream rows with the same key whose event time
  * falls inside [l_ts, l_ts + gap] — the attribution shape (view →
  * click within the window) the reference's engagement domain needs.
  *
  * Both sides carry event-time watermarks, which is what makes the join
  * RUNNABLE FOREVER: a buffered left row can only match right rows up
  * to l_ts + gap, so once the right watermark passes that point (plus
  * the delay) the incremental engine evicts it — state is bounded by
  * the gap + delay horizon, not the stream length. Inner-join matches
  * emit as soon as both rows have arrived (append mode does not wait
  * for the watermark; the watermark only gates state eviction), so the
  * complete result is deterministic however the files split into
  * micro-batches.
  *
  * Sides must be pre-projected to disjoint column names apart from
  * `key`; time columns are referenced through the l/r aliases.
  */
object IntervalJoin {

  def within(left: DataFrame, lTs: String, right: DataFrame, rTs: String,
             key: String, gap: String, delay: String): DataFrame = {
    val l = left.withWatermark(lTs, delay).alias("l")
    val r = right.withWatermark(rTs, delay).alias("r")
    l.join(r, expr(
      s"l.$key = r.$key AND r.$rTs >= l.$lTs AND r.$rTs <= l.$lTs + INTERVAL $gap"))
  }

  /** LEFT OUTER interval join — the production attribution shape
    * [[within]] cannot express: every left row EMITS, matched rows as
    * they meet, unmatched rows with null right columns once the
    * watermark proves no match can still arrive (the engine emits the
    * null-padded row when it evicts the left row's state — left rows
    * are held until the global watermark passes l_ts + gap + delay,
    * so "unmatched" is a watermark-certified verdict, never a guess).
    * The inner join's completeness argument extends: the match set is
    * arrival-order independent, and the unmatched set is its exact
    * complement, so the result equals the batch LEFT JOIN whenever
    * the feed respects the watermark — on a FINITE feed that requires
    * a flush row past max(ts) + gap + delay on BOTH sides (the global
    * watermark is the min across sources), or tail rows still
    * buffered at stream end would never get their verdict (q272
    * appends sentinel flush rows and filters them from the output —
    * the close-the-books pattern).
    */
  def withinOuter(left: DataFrame, lTs: String, right: DataFrame,
                  rTs: String, key: String, gap: String,
                  delay: String): DataFrame = {
    val l = left.withWatermark(lTs, delay).alias("l")
    val r = right.withWatermark(rTs, delay).alias("r")
    l.join(r, expr(
      s"l.$key = r.$key AND r.$rTs >= l.$lTs AND r.$rTs <= l.$lTs + INTERVAL $gap"),
      "left_outer")
  }
}
