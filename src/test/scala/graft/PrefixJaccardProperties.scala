package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Generative proof of prefixJaccard's losslessness contract (q174):
  * the PPJoin prefix filter + length-ratio prune + half-up threshold
  * band must equal the brute-force all-pairs gram Jaccard for ANY
  * corpus, gram size and threshold. The tiny vocabulary forces dense
  * shared grams (prefix postings collide constantly) and the mutated
  * near-dups cluster pair similarities around the threshold — the
  * regime where an off-by-one in the prefix length
  * (|x| − ceil(t_eff·|x|) + 1) or a prune that admits only to thr
  * instead of t_eff = thr − 0.00005 would silently drop a pair that
  * the rounded-4dp verify would have kept (the round-9 advisor hole,
  * now quantified over corpora instead of pinned by one fixture).
  */
object PrefixJaccardProperties extends Properties("graft.prefixjaccard") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  /** Brute force mirroring the operator's exact pipeline: words =
    * lower/trim/split-\s+, distinct n-word shingles, docs with < n
    * words absent, J rounded HALF_UP to 4dp (Spark's round), kept at
    * rounded ≥ thr.
    */
  private def grams(s: String, n: Int): Option[Set[String]] = {
    val ws = s.trim.toLowerCase.split("\\s+").toSeq
    if (ws.length < n) None
    else Some(ws.sliding(n).map(_.mkString(" ")).toSet)
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private case class Corpus(docs: List[String], n: Int, thr: Double)

  private val corpusGen: Gen[Corpus] = for {
    n <- Gen.choose(1, 3)
    thr <- Gen.oneOf(0.2, 0.3333, 0.35, 0.5, 0.6, 0.6667, 0.75)
    nd <- Gen.choose(4, 10)
    base <- Gen.listOfN(nd, for {
      len <- Gen.choose(1, 8)
      ws <- Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff"))
    } yield ws.mkString(" "))
    // derive near-dups by single-word edits so pair similarities land
    // on and just around the threshold instead of far from it
    muts <- Gen.listOfN(3, for {
      src <- Gen.choose(0, nd - 1)
      op <- Gen.oneOf(0, 1, 2) // drop last word / replace first / append
      w <- Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    } yield (src, op, w))
  } yield {
    val derived = muts.map { case (src, op, w) =>
      val ws = base(src).split(" ").toList
      op match {
        case 0 if ws.length > 1 => ws.init.mkString(" ")
        case 1 => (w :: ws.tail).mkString(" ")
        case _ => (ws :+ w).mkString(" ")
      }
    }
    Corpus(base ++ derived, n, thr)
  }

  property("prefix-filtered join == brute-force gram Jaccard for any corpus, n and thr") =
    forAll(corpusGen) { c =>
      import spark.implicits._
      val rows = c.docs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val got = Dedup.prefixJaccard(rows.toDF("doc_id", "text"),
          col("doc_id"), col("text"), n = c.n, thr = c.thr, maxPost = 10000)
        .select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val sets = rows.map { case (i, s) => i -> grams(s, c.n) }
        .collect { case (i, Some(g)) => i -> g }
      val truth = (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
        j = round4(sa.intersect(sb).size.toDouble / sa.union(sb).size)
        if j >= c.thr
      } yield (ia, ib, j)).toSet
      got == truth
    }
}
