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
}
