package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.operators.TopKState

/** Generative proof of TopKState's central claim: for ANY signed
  * history (inserts + deletes of previously inserted ids) folded
  * through ANY batching, the certified top-k read equals the
  * brute-force recompute over the surviving rows — the buffer+θ
  * invariant plus the refill cannot be wrong for any interleaving a
  * hand fixture happened to miss. Deliberately small B (4) and k (2)
  * against up to ~35 rows per group so evictions, θ promotions,
  * below-θ discards, drains and refills all actually occur across
  * the generated cases.
  */
object TopKStateProperties extends Properties("graft.topkstate") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val K = 2
  private val B = 4

  // a history: per id, an insert (group, value) and optionally a
  // delete scheduled a few events later; values collide on purpose
  // (ties resolved by id — part of the order contract under test)
  private case class Ev(g: String, id: Long, v: Long, sign: Long)
  private val history: Gen[List[Ev]] = for {
    n <- Gen.choose(6, 35)
    evs <- Gen.sequence[List[(Ev, Option[(Int, Ev)])], (Ev, Option[(Int, Ev)])](
      (1 to n).toList.map { i =>
        for {
          g <- Gen.oneOf("a", "b")
          v <- Gen.choose(0L, 12L)
          del <- Gen.option(Gen.choose(0, 6))
        } yield {
          val ins = Ev(g, i.toLong, v, 1L)
          (ins, del.map(gap => (gap, ins.copy(sign = -1L))))
        }
      })
  } yield {
    // deletes land `gap` inserts after their own insert (clamped to
    // the end) — always after the insert, like a real retraction feed
    val ins = evs.map(_._1)
    val n = ins.length
    val byPos = evs.zipWithIndex.flatMap { case ((_, od), idx) =>
        od.map { case (gap, d) => (math.min(n, idx + 1 + gap), d) }
      }.groupBy(_._1)
    val out = scala.collection.mutable.ArrayBuffer[Ev]()
    ins.zipWithIndex.foreach { case (e, idx) =>
      out += e
      byPos.get(idx + 1).foreach(ds => out ++= ds.map(_._2))
    }
    out.toList
  }

  private val splitsGen: Gen[List[Int]] =
    Gen.nonEmptyListOf(Gen.choose(1, 9)).map(_.take(5))

  private val runId = new java.util.concurrent.atomic.AtomicLong(0L)

  // State rides the operator's PRODUCTION transport — a parquet
  // round-trip per batch, exactly q273's BatchState shape. The previous
  // harness carried state via localCheckpoint(true); in Spark 4.1
  // Dataset.checkpoint copies the ORIGIN plan's statistics/constraints
  // onto the wrapped LogicalRDD (LogicalRDD.fromDataset →
  // rewriteStatsAndConstraints), so checkpoint-of-checkpoint loops
  // compound sizeInBytes multiplicatively (BigInt digits grow
  // exponentially per batch: minutes of stats arithmetic per step by
  // batch ~35) and feed every later batch's planner stats/constraints
  // derived from a plan the data no longer comes from — the round-14
  // gate falsification (seed KsAomgVvSDtGi1mIvcGtpiUv11UjXe1XoNELlly
  // wNgM=) reproduced exactly; the SAME history and batching through
  // the parquet transport matches the reference trace at every batch
  // (TopKStateReproSpec pins it). The operator under test is unchanged.
  private def runSplits(evs: List[Ev],
                        cuts: List[Int]): Seq[(String, Long, Long, Long)] = {
    import spark.implicits._
    val all = evs.map(e => (e.g, e.id, e.v, e.sign))
      .toDF("g", "id", "v", "sign")
    // carve the history into batches by the generated cut sizes
    val batches = {
      val out = scala.collection.mutable.ArrayBuffer[List[Ev]]()
      var rest = evs
      var i = 0
      while (rest.nonEmpty) {
        val sz = cuts(i % cuts.length)
        out += rest.take(sz); rest = rest.drop(sz); i += 1
      }
      out.toList
    }
    val stateDir = graft.util.TmpDirs.perProcess(
      s"topk_props_state_${runId.incrementAndGet()}")
    // try/finally (r15 ADVICE): a falsified property or an exception
    // mid-batch must not leak per-iteration state dirs across hundreds
    // of ScalaCheck runs.
    try {
      var (buf, meta) = TopKState.emptyState(all, Seq("g"))
      batches.zipWithIndex.foreach { case (b, i) =>
        val (b2, m2) = TopKState.step(buf, meta,
          b.map(e => (e.g, e.id, e.v, e.sign)).toDF("g", "id", "v", "sign"),
          Seq("g"), B)
        // versioned dirs: batch i's state is still read by batch i+1's plan
        b2.write.mode("overwrite").parquet(s"$stateDir/buf$i")
        m2.write.mode("overwrite").parquet(s"$stateDir/meta$i")
        buf = spark.read.parquet(s"$stateDir/buf$i")
        meta = spark.read.parquet(s"$stateDir/meta$i")
      }
      TopKState.topkWithRefill(buf, meta, all, Seq("g"), K)
        .orderBy("g", "rnk").collect()
        .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
  }

  private def brute(evs: List[Ev]): Seq[(String, Long, Long, Long)] = {
    val deleted = evs.filter(_.sign == -1L).map(_.id).toSet
    evs.filter(e => e.sign == 1L && !deleted.contains(e.id))
      .groupBy(_.g).toSeq.flatMap { case (g, rows) =>
        rows.sortBy(e => (-e.v, e.id)).take(K).zipWithIndex
          .map { case (e, i) => (g, (i + 1).toLong, e.id, e.v) }
      }.sortBy(t => (t._1, t._2))
  }

  property("certified top-k == brute force for any history under any batching") =
    forAll(history, splitsGen) { (evs, cuts) =>
      runSplits(evs, cuts) == brute(evs)
    }
}
