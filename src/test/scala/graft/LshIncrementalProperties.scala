package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Generative proof of minhashLshIncremental's losslessness claim
  * (Dedup.scala: the incremental algebra equals the full recompute
  * EXACTLY because bucket sizes only grow under insertion — every
  * both-base survivor was stored, every delta-touching pair probes a
  * merged under-cap bucket, and a bucket crossing the cap retires its
  * stored pairs). The DedupSpec fixtures pin one cap crossing and one
  * in-cap delta by hand; this property quantifies over corpora,
  * base/delta splits AND caps — tiny vocabularies make band buckets
  * collide constantly and small caps make the retirement branch fire
  * across the generated cases, which is exactly where a stored pair
  * kept past its bucket's cap (or a delta pair missed in a merged
  * bucket) would diverge from the recompute.
  */
object LshIncrementalProperties
    extends Properties("graft.lshincremental") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = TestSpark.spark

  private case class LshCase(docs: List[(String, Boolean)], n: Int,
                             bands: Int, thr: Double, maxBucket: Int)

  private val lshGen: Gen[LshCase] = for {
    n <- Gen.choose(1, 2)
    bands <- Gen.oneOf(2, 4, 8) // numPerm fixed at 8; all divide it
    thr <- Gen.oneOf(0.2, 0.5)
    maxBucket <- Gen.oneOf(2, 3, 8)
    nd <- Gen.choose(4, 9)
    docs <- Gen.listOfN(nd, for {
      len <- Gen.choose(n, 6)
      ws <- Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd"))
      delta <- Gen.prob(0.4)
    } yield (ws.mkString(" "), delta))
  } yield LshCase(docs, n, bands, thr, maxBucket)

  property("incremental == full recompute for any corpus, split and cap") =
    forAll(lshGen) { c =>
      import spark.implicits._
      val rows = c.docs.zipWithIndex.map { case ((s, d), i) =>
        (i.toLong, s, d)
      }
      val df = rows.toDF("doc_id", "text", "is_delta")
      val full = Dedup.minhashLsh(df, col("doc_id"), col("text"),
          n = c.n, numPerm = 8, bands = c.bands, thr = c.thr,
          maxBucket = c.maxBucket)
        .select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val inc = Dedup.minhashLshIncremental(df, col("doc_id"),
          col("text"), col("is_delta"), n = c.n, numPerm = 8,
          bands = c.bands, thr = c.thr, maxBucket = c.maxBucket)
        .select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      spark.catalog.clearCache()
      inc == full
    }
}
