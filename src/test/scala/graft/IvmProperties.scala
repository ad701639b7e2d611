package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.warehouse.Warehouse

/** Generative proofs for the three IVM algebras (q200 / q262 / q264):
  * for ANY consistent CDC history (inserts plus deletes of
  * previously-inserted rows) folded through ANY batching, the
  * maintained state must equal the from-scratch recompute over the
  * surviving multiset. The fixtures in JoinOpsSpec pin one history
  * each; these properties quantify over histories — key collisions,
  * value collisions, re-inserted-then-re-deleted duplicates, empty
  * batches and fully-retracted groups all occur across the generated
  * cases, which is exactly where a sign-algebra slip (a delete
  * applied twice, a ΔA⋈ΔB term missed, a zero-support key kept or a
  * live key compacted) would surface.
  */
object IvmProperties extends Properties("graft.ivm") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  /** One row's life: inserted in batch `ins`, optionally deleted in a
    * strictly later batch. Keys/values are drawn from tiny domains so
    * multisets carry real multiplicity (the same (k, v) alive twice,
    * deleted once — the case where row-identity bookkeeping would be
    * wrong and multiset algebra is required).
    */
  private case class Life(k: String, v: Long, ins: Int, del: Option[Int])

  private def historyGen(nBatches: Int): Gen[List[Life]] = for {
    n <- Gen.choose(1, 28)
    lives <- Gen.listOfN(n, for {
      k <- Gen.oneOf("k0", "k1", "k2", "k3")
      v <- Gen.choose(-9L, 9L)
      ins <- Gen.choose(0, nBatches - 1)
      del <- if (nBatches - 1 > 0)
        Gen.option(Gen.choose(math.min(ins + 1, nBatches - 1), nBatches - 1))
          .map(_.filter(_ > ins))
      else Gen.const(None)
    } yield Life(k, v, ins, del))
  } yield lives

  property("applyAggDelta chain == recompute for any history and batching") =
    forAll(Gen.choose(2, 5).flatMap(nb => historyGen(nb).map((nb, _)))) {
      case (nb, lives) =>
        import spark.implicits._
        // batch 0 is the standing base; 1..nb-1 are CDC batches of
        // 'I' inserts and 'D' re-emissions of existing rows
        val base = lives.filter(_.ins == 0).map(l => (l.k, l.v))
        var state = Warehouse.aggState(
          base.toDF("k", "v"), Seq("k"), col("v"))
        for (b <- 1 until nb) {
          val batch =
            lives.filter(_.ins == b).map(l => (l.k, l.v, "I")) ++
            lives.filter(_.del.contains(b)).map(l => (l.k, l.v, "D"))
          state = Warehouse.applyAggDelta(state,
            batch.toDF("k", "v", "op"), Seq("k"), col("op"), col("v"))
        }
        val got = state.as[(String, Long, Long)].collect().toSet
        val surviving = lives.filter(_.del.isEmpty)
        val truth = surviving.groupBy(_.k).map { case (k, ls) =>
          (k, ls.size.toLong, ls.map(_.v).sum)
        }.toSet
        got == truth
    }

  /** joinViewDelta: ANY bases, ANY signed deltas on both sides
    * (retractions drawn from the base rows they retract, each at most
    * once). Shared join keys on both deltas force the ΔA⋈ΔB cross
    * term to carry weight — drop it, or get a sign product wrong, and
    * some generated case diverges from the post-change recompute.
    */
  private case class JoinCase(a0: List[(String, String)],
                              b0: List[(String, Long)],
                              daIns: List[(String, String)],
                              daDel: List[(String, String)],
                              dbIns: List[(String, Long)],
                              dbDel: List[(String, Long)])

  private val joinGen: Gen[JoinCase] = {
    val key = Gen.oneOf("j0", "j1", "j2")
    val grp = Gen.oneOf("g0", "g1")
    for {
      a0 <- Gen.listOf(Gen.zip(key, grp)).map(_.take(12))
      b0 <- Gen.listOf(Gen.zip(key, Gen.choose(-9L, 9L))).map(_.take(12))
      daIns <- Gen.listOf(Gen.zip(key, grp)).map(_.take(6))
      daDelFlags <- Gen.listOfN(a0.size, Gen.prob(0.3))
      dbIns <- Gen.listOf(Gen.zip(key, Gen.choose(-9L, 9L))).map(_.take(6))
      dbDelFlags <- Gen.listOfN(b0.size, Gen.prob(0.3))
    } yield JoinCase(a0, b0, daIns,
      a0.zip(daDelFlags).collect { case (r, true) => r },
      dbIns,
      b0.zip(dbDelFlags).collect { case (r, true) => r })
  }

  property("joinViewDelta == from-scratch join view on the post-change tables") =
    forAll(joinGen) { jc =>
      import spark.implicits._
      val a0 = jc.a0.toDF("k", "g")
      val b0 = jc.b0.toDF("k", "v")
      val da = (jc.daIns.map { case (k, g) => (k, g, 1L) } ++
        jc.daDel.map { case (k, g) => (k, g, -1L) }).toDF("k", "g", "sign")
      val db = (jc.dbIns.map { case (k, v) => (k, v, 1L) } ++
        jc.dbDel.map { case (k, v) => (k, v, -1L) }).toDF("k", "v", "sign")
      val got = Warehouse.joinViewDelta(a0, da, b0, db, "k",
          Seq("g"), col("v"))
        .as[(String, Long, Long)].collect().toSet
      // post-change multisets, joined the slow way
      val a1 = (jc.a0 ++ jc.daIns).diff(jc.daDel)
      val b1 = (jc.b0 ++ jc.dbIns).diff(jc.dbDel)
      val truth = (for {
        (ka, g) <- a1; (kb, v) <- b1 if ka == kb
      } yield (g, v)).groupBy(_._1).map { case (g, rows) =>
        (g, rows.size.toLong, rows.map(_._2).sum)
      }.toSet
      got == truth
    }

  property("support-state distinct IVM: any batch split merges to the recompute; zero-support keys compacted") =
    forAll(Gen.choose(2, 5).flatMap(nb => historyGen(nb).map((nb, _)))) {
      case (nb, lives) =>
        import spark.implicits._
        // one signed support partial per batch (inserts +1, deletes −1)
        val partials = (0 until nb).map { b =>
          val rows =
            lives.filter(_.ins == b).map(l => (l.k, l.v, 1L)) ++
            lives.filter(_.del.contains(b)).map(l => (l.k, l.v, -1L))
          Warehouse.supportState(
            rows.toDF("k", "v", "sign"), Seq("k"), col("v"))
        }
        // batch-split invariance: all-at-once merge == pairwise fold
        val allAtOnce = Warehouse.mergeSupportState(partials, Seq("k"))
        val folded = partials.reduce((s, p) =>
          Warehouse.mergeSupportState(Seq(s, p), Seq("k")))
        val stateA = allAtOnce.as[(String, Long, Long)].collect().toSet
        val stateB = folded.as[(String, Long, Long)].collect().toSet
        // compaction: the merged state holds EXACTLY the surviving
        // (group, value) keys with their multiplicity — no zero-support
        // residue from fully-retracted values, no live key dropped
        val surviving = lives.filter(_.del.isEmpty)
        val supportTruth = surviving.groupBy(l => (l.k, l.v))
          .map { case ((k, v), ls) => (k, v, ls.size.toLong) }.toSet
        // derived view == brute-force distinct over the survivors
        val got = Warehouse.distinctViewFromSupport(allAtOnce, Seq("k"))
          .as[(String, Long, Long, Long)].collect().toSet
        val viewTruth = surviving.groupBy(_.k).map { case (k, ls) =>
          (k, ls.map(_.v).distinct.size.toLong, 0L, ls.size.toLong)
        }.toSet
        stateA == stateB && stateA == supportTruth && got == viewTruth
    }

  /** The approximate counterpart (q277): per-group HLL register state
    * under ANY batch split AND duplicate batch replays must merge to
    * the one-pass state — max is associative, commutative and
    * idempotent, so at-least-once redelivery is a provable no-op.
    * Insert-only lives (no deletes) because max has no inverse; that
    * boundary is the operator's documented contract, not a test gap.
    */
  property("hll register state: any batch split + duplicate replays merge to the one-pass state") =
    forAll(for {
      nb <- Gen.choose(2, 4)
      n <- Gen.choose(1, 30)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("g0", "g1")
        k <- Gen.choose(0L, 50L)
        b <- Gen.choose(0, nb - 1)
      } yield (g, k, b))
      replay <- Gen.choose(0, nb - 1)
    } yield (nb, rows, replay)) { case (nb, rows, replay) =>
      import spark.implicits._
      import graft.operators.Sketches
      val partials = (0 until nb).map { b =>
        Sketches.hllState(
          rows.filter(_._3 == b).map(r => (r._1, r._2)).toDF("g", "k"),
          Seq("g"), col("k"), p = 4)
      }
      val merged = Sketches.mergeHllState(
        partials :+ partials(replay), Seq("g"))
      val onePass = Sketches.hllState(
        rows.map(r => (r._1, r._2)).toDF("g", "k"), Seq("g"), col("k"),
        p = 4)
      val a = merged.as[(String, Long, Long)].collect().toSet
      val b = onePass.as[(String, Long, Long)].collect().toSet
      val estA = Sketches.hllEstimateFromState(merged, Seq("g"), p = 4)
        .as[(String, Long, Long)].collect().toSet
      val estB = Sketches.hllEstimateFromState(onePass, Seq("g"), p = 4)
        .as[(String, Long, Long)].collect().toSet
      a == b && estA == estB
    }

  /** The signed CMS (q278): linearity means the merged cell state of
    * ANY batching of ANY consistent signed history equals the one-pass
    * sketch of the surviving multiset — retractions included, which is
    * what HLL's max cannot do — and every key's estimate dominates its
    * true count (cells are true + Σ colliding net counts, all ≥ 0).
    * Width 8 on a 20-key domain forces real collisions, so the
    * dominance is tested where it is not vacuously equality.
    */
  property("signed CMS: any batching merges to the one-pass sketch; estimates dominate true counts") =
    forAll(Gen.choose(2, 4).flatMap(nb => historyGen(nb).map((nb, _)))) {
      case (nb, lives) =>
        import spark.implicits._
        import graft.operators.Sketches
        val (d, w) = (3, 8)
        val partials = (0 until nb).map { b =>
          val rows =
            lives.filter(_.ins == b).map(l => (s"${l.k}:${l.v}", 1L)) ++
            lives.filter(_.del.contains(b)).map(l => (s"${l.k}:${l.v}", -1L))
          Sketches.cmsState(rows.toDF("key", "sign"), col("key"), d, w)
        }
        val merged = Sketches.mergeCmsState(partials)
        val surviving = lives.filter(_.del.isEmpty)
          .map(l => (s"${l.k}:${l.v}", 1L))
        val onePass = Sketches.cmsState(
          surviving.toDF("key", "sign"), col("key"), d, w)
        val a = merged.as[(Int, Int, Long)].collect().toSet
        val b = onePass.as[(Int, Int, Long)].collect().toSet
        val truth = surviving.groupBy(_._1).map { case (k, ls) =>
          (k, ls.size.toLong)
        }
        val dominated = truth.isEmpty || {
          val probes = truth.keys.toSeq.toDF("key")
          Sketches.cmsEstimateFor(merged, probes, col("key"), d, w)
            .as[(String, Long)].collect()
            .forall { case (k, est) => est >= truth(k) }
        }
        a == b && dominated
    }
}
