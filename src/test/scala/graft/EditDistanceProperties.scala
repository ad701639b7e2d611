package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Generative proof of editDistanceJoin's losslessness: the PassJoin
  * pigeonhole (one of d+1 segments survives verbatim, displaced <= d)
  * plus the exact verify must equal the brute-force pair scan for
  * ANY corpus and ANY d — a small alphabet forces heavy segment
  * collisions and near-miss pairs at every distance, which is
  * exactly where a subtly-wrong shift window would lose a pair.
  */
object EditDistanceProperties extends Properties("graft.editdistance") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val t = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = t
      }
    }
    dp(a.length)
  }

  private val corpus: Gen[(List[String], Int)] = for {
    d <- Gen.choose(1, 3)
    n <- Gen.choose(4, 14)
    // base strings long enough to fill d+1 segments after edits
    strs <- Gen.listOfN(n, for {
      len <- Gen.choose(d + 3, 14)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString)
    // derive a few near-dups by mutating corpus members: the generated
    // pairs then cluster around the d boundary instead of being far apart
    muts <- Gen.listOfN(3, for {
      src <- Gen.choose(0, n - 1)
      at <- Gen.choose(0, 2)
      op <- Gen.oneOf(0, 1, 2) // substitute / delete / insert
      ch <- Gen.oneOf('a', 'b', 'c')
    } yield (src, at, op, ch))
  } yield {
    val derived = muts.map { case (src, at, op, ch) =>
      val s = strs(src)
      val i = math.min(at, s.length - 1)
      op match {
        case 0 => s.updated(i, ch)
        case 1 if s.length > d + 1 => s.substring(0, i) + s.substring(i + 1)
        case _ => s.substring(0, i) + ch + s.substring(i)
      }
    }
    ((strs ++ derived).filter(_.length >= d + 1), d)
  }

  property("pigeonhole join == brute force for any corpus and d") =
    forAll(corpus) { case (strs, d) =>
      import spark.implicits._
      val rows = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val got = Dedup.editDistanceJoin(rows.toDF("doc_id", "text"),
          col("doc_id"), col("text"), d)
        .as[(Long, Long, Long)].collect().toSet
      val truth = (for {
        (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
        dist = lev(sa, sb) if dist <= d
      } yield (ia, ib, dist.toLong)).toSet
      got == truth
    }
}
