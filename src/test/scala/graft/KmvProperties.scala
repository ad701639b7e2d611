package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Generative proofs for the KMV set-operation sketch (q184/q188):
  *
  *  1. Under k (|A ∪ B| < k) the sketch is EXACT — est_union and
  *     est_intersect equal the true cardinalities for ANY two key
  *     sets, overlapping, disjoint, nested or empty-on-one-side. The
  *     exactness claim is the operator's own header; the fixtures pin
  *     two shapes, this quantifies it.
  *
  *  2. At or over k, the invariants that survive estimation hold for
  *     ANY input: n_kept == k, est_intersect == (n_both_in_k ·
  *     est_union) div k (the Beyer et al. scaling, exact integer
  *     arithmetic), and 0 ≤ n_both_in_k ≤ k.
  */
object KmvProperties extends Properties("graft.kmv") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private case class Sets(a: Set[String], b: Set[String], k: Int)

  private val setsGen: Gen[Sets] = for {
    k <- Gen.choose(4, 12)
    na <- Gen.choose(0, 14)
    nb <- Gen.choose(0, 14)
    a <- Gen.listOfN(na, Gen.choose(0, 30).map(i => s"k$i"))
    b <- Gen.listOfN(nb, Gen.choose(0, 30).map(i => s"k$i"))
  } yield Sets(a.toSet, b.toSet, k)

  private def run(s: Sets) = {
    import spark.implicits._
    val rows = s.a.toSeq.map(("a", _)) ++ s.b.toSeq.map(("b", _))
    // at least one row required for a schema'd frame; empty-both is
    // vacuous for the sketch (no scopes to pool)
    if (rows.isEmpty) None
    else Some(Sketches.kmvIntersect(rows.toDF("scope", "kk"),
        col("kk"), col("scope"), "a", "b", s.k)
      .collect().head)
  }

  property("under k the sketch is exact for any pair of key sets") =
    forAll(setsGen) { s0 =>
      val s = s0.copy(k = math.max(s0.k, (s0.a ++ s0.b).size + 1))
      run(s).forall { r =>
        val union = (s.a ++ s.b).size.toLong
        val inter = (s.a intersect s.b).size.toLong
        r.getLong(0) == union && // n_kept = whole union under k
          r.getLong(3) == union && // est_union exact
          r.getLong(4) == inter && // est_intersect exact
          r.getLong(5) == union && r.getLong(6) == inter // audit cols
      }
    }

  property("at k the scaling identity and bounds hold for any input") =
    forAll(setsGen) { s0 =>
      val union = (s0.a ++ s0.b).size
      // force the estimating branch: k <= |union| (skip vacuous cases)
      union < 2 || {
        val s = s0.copy(k = math.max(2, math.min(s0.k, union)))
        run(s).forall { r =>
          val (nKept, nBoth, estU, estI) =
            (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
          nKept == s.k &&
            nBoth >= 0 && nBoth <= s.k &&
            estI == (BigInt(nBoth) * estU / s.k).toLong &&
            estU >= 1
        }
      }
    }
}
