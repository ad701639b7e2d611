package graft.streaming

import java.sql.Timestamp
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import StatefulSessions.{Ev, Open}

/** Generative proof of the sessionizer's state algebra: folding
  * `updateKey` over ANY time-ordered batching of ANY event history
  * yields exactly the batch sessionization — every closed session
  * emitted once, the open tail carried in state. The fixture specs
  * prove the streaming WIRING (file source, watermark, checkpoint
  * resume); this quantifies the per-key state machine itself, where a
  * session closed twice, a gap compared against the wrong endpoint, or
  * a tie mis-ordered at a batch cut would escape any single fixture.
  * Timestamps collide and sessions straddle cuts by construction
  * (tiny time domain, cuts on the globally sorted sequence); the fold
  * runs on Spark's public TestGroupState, no cluster in the loop.
  */
object StatefulSessionsProperties
    extends Properties("graft.statefulsessions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val gapUs = 10L * 1000000L // 10 s gap

  private def tsOf(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }
  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  private case class Hist(evs: List[Ev], cuts: List[Int])

  private val histGen: Gen[Hist] = for {
    n <- Gen.choose(1, 40)
    evs <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 2L)
      // seconds domain ~6 gap-lengths wide: sessions split, merge and
      // straddle cuts; duplicates force the (ts, value) tie order
      s <- Gen.choose(0L, 60L)
      v <- Gen.choose(0, 12).map(_ / 4.0)
    } yield Ev(u, tsOf(s * 1000000L), v))
    cuts <- Gen.nonEmptyListOf(Gen.choose(1, 9)).map(_.take(5))
  } yield Hist(evs, cuts)

  /** Batch truth: per user, sort by (ts, value), split where the gap
    * exceeds gapUs; last session is the open tail, the rest closed.
    * Addition runs in the same sorted order as updateKey, so the
    * double sums are bit-identical, not approximately equal.
    */
  private def brute(evs: List[Ev])
      : (List[(Long, Long, Long, Long, Double)], Map[Long, Open]) = {
    val closed = List.newBuilder[(Long, Long, Long, Long, Double)]
    val open = Map.newBuilder[Long, Open]
    evs.groupBy(_.user_id).toSeq.sortBy(_._1).foreach { case (u, es) =>
      val sorted = es.sortBy(e => (micros(e.ts), e.value))
      var cur: Option[Open] = None
      sorted.foreach { e =>
        val t = micros(e.ts)
        cur = cur match {
          case Some(o) if t - o.last <= gapUs =>
            Some(Open(o.start, t, o.n + 1, o.sum + e.value))
          case Some(o) =>
            closed += ((u, o.start, o.last, o.n, o.sum))
            Some(Open(t, t, 1L, e.value))
          case None => Some(Open(t, t, 1L, e.value))
        }
      }
      cur.foreach(o => open += u -> o)
    }
    (closed.result(), open.result())
  }

  property("updateKey folded over any time-ordered batching == batch sessionization") =
    forAll(histGen) { h =>
      // global (ts, value) sort, then cut into batches: a time-ordered
      // feed, the operator's documented arrival contract
      val sorted = h.evs.sortBy(e => (micros(e.ts), e.value))
      val batches = {
        val out = scala.collection.mutable.ArrayBuffer[List[Ev]]()
        var rest = sorted
        var i = 0
        while (rest.nonEmpty) {
          val sz = h.cuts(i % h.cuts.length)
          out += rest.take(sz); rest = rest.drop(sz); i += 1
        }
        out.toList
      }
      val state = scala.collection.mutable.Map.empty[Long, Open]
      val emitted = List.newBuilder[(Long, Long, Long, Long, Double)]
      batches.foreach { b =>
        b.groupBy(_.user_id).foreach { case (u, es) =>
          val gs = TestGroupState.create[Open](
            org.apache.spark.api.java.Optional.ofNullable(
              state.get(u).orNull),
            GroupStateTimeout.NoTimeout, 0L,
            org.apache.spark.api.java.Optional.empty[Long],
            hasTimedOut = false)
          val out = StatefulSessions
            .updateKey(gapUs)(u, es.iterator, gs).toList
          emitted ++= out.map(s => (s.user_id, micros(s.session_start),
            micros(s.session_end), s.n_events, s.session_value))
          if (gs.exists) state(u) = gs.get else state.remove(u)
        }
      }
      val (wantClosed, wantOpen) = brute(h.evs)
      emitted.result().sorted == wantClosed.sorted &&
        state.toMap == wantOpen
    }
}
