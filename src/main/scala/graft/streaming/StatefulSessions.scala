package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY §2.9's
  * "state" row, done properly): gap-based sessionization per user —
  * the streaming twin of the batch q20 — with the OPEN session held as
  * typed state per key and CLOSED sessions emitted exactly once.
  *
  * Scale shape: state is one small record per active user, partitioned
  * by the group key and checkpointed by the engine; each micro-batch
  * touches only keys with new events. This is the managed-state version
  * of what the reference faked with read-modify-write CSV
  * (/root/reference/dags/extract.py:118-129) — no rewrite
  * amplification, no lost-update window.
  */
object StatefulSessions {

  case class Ev(user_id: Long, ts: Timestamp, value: Double)
  case class Sess(user_id: Long, session_start: Timestamp,
                  session_end: Timestamp, n_events: Long, session_value: Double)
  /** The open session: all times in epoch micros. */
  case class Open(start: Long, last: Long, n: Long, sum: Double)

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
  private def ts(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }

  /** Per-key logic: merge the batch's events (sorted by time) into the
    * open session, emitting every session that a gap closes. The open
    * tail stays in state.
    */
  private[streaming] def updateKey(gapUs: Long)(
      userId: Long, events: Iterator[Ev], state: GroupState[Open]): Iterator[Sess] = {
    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.value))
    var open = state.getOption
    val closed = Seq.newBuilder[Sess]
    sorted.foreach { e =>
      val t = micros(e.ts)
      open = open match {
        case Some(o) if t - o.last <= gapUs =>
          Some(Open(o.start, t, o.n + 1, o.sum + e.value))
        case Some(o) =>
          closed += Sess(userId, ts(o.start), ts(o.last), o.n, o.sum)
          Some(Open(t, t, 1L, e.value))
        case None =>
          Some(Open(t, t, 1L, e.value))
      }
    }
    open.foreach(state.update)
    closed.result().iterator
  }

  /** Streaming sessionization: 30-min default gap, append mode (each
    * closed session exactly once). The final open session per user is
    * emitted only when a later event closes it — the contract of an
    * unbounded stream.
    */
  def sessionize(spark: SparkSession, events: Dataset[Ev],
                 gapMinutes: Int = 30): Dataset[Sess] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Open, Sess](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(updateKey(gapUs))
  }
}
