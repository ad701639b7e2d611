package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit semantics for the retrieval pack (the oracle gate covers q100/
  * q116 end-to-end; these pin the arithmetic contracts in isolation).
  */
class RetrievalSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "spark join window spark spark"), // hits all 3 terms, tf-heavy
      (2L, "spark alpha beta gamma delta"),  // hits 1 term
      (3L, "nothing relevant here at all"),  // hits none -> absent
      (4L, "join window join epsilon zeta"))
      .toDF("doc_id", "text")
  }

  test("bm25ScoreBp: only hit documents emitted; more hits => higher score") {
    val byDoc = Retrieval.bm25ScoreBp(docs, col("doc_id"), col("text"),
        Seq("spark", "join", "window"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!byDoc.contains(3L), "zero-hit doc must be absent")
    assert(byDoc(1L)._1 === 3L && byDoc(4L)._1 === 2L && byDoc(2L)._1 === 1L)
    assert(byDoc(1L)._2 > byDoc(2L)._2, "3-term hit outscores 1-term hit")
  }

  test("rrfFuse: integer 1e6 div (k+rank) terms; one-sided ids keep 0") {
    import spark.implicits._
    val a = Seq((10L, 1), (20L, 2)).toDF("id", "r")
    val b = Seq((20L, 1), (30L, 2)).toDF("id", "r")
    val got = Retrieval.rrfFuse(a, "id", "r", b, "id", "r", k = 60)
      .select("id", "rrf_score").as[(Long, Long)].collect().toMap
    assert(got(10L) === 1000000L / 61)            // text only, rank 1
    assert(got(20L) === 1000000L / 62 + 1000000L / 61)
    assert(got(30L) === 1000000L / 62)            // vector only, rank 2
  }

  test("tfidfGramCosineJoin: identical docs score ~10000 bp; disjoint absent") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // identical to 1
      (3L, "zeta eta theta iota kappa"))      // shares nothing
      .toDF("doc_id", "text")
    val got = Retrieval.tfidfGramCosineJoin(d, col("doc_id"), col("text"),
        n = 3, maxDf = 20, minBp = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet === Set((1L, 2L)), "only the identical pair pairs up")
    // cos^2 of identical vectors: X div (X div 10^4) >= 10^4 (floor math)
    assert(got((1L, 2L)) >= 10000L && got((1L, 2L)) < 10100L)
  }

  test("tfidfGramCosineJoin: grams above maxDf generate no candidates") {
    import spark.implicits._
    // every doc shares the same 3-gram; df=4 > maxDf=3 -> no pairs
    val d = (1L to 4L).map(i => (i, s"common shared gram tail$i"))
      .toDF("doc_id", "text")
    val got = Retrieval.tfidfGramCosineJoin(d, col("doc_id"), col("text"),
      n = 3, maxDf = 3, minBp = 0L)
    assert(got.count() === 0L)
  }

  test("topNRanks: TakeOrdered cutoff and ranks agree with the order") {
    import spark.implicits._
    val d = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 1L)).toDF("id", "s")
    val got = Retrieval.topNRanks(d, col("s"), col("id"), 3, "rk")
      .select("id", "rk").as[(Long, Int)].collect().toMap
    // 9 (id 2), 9 (id 3), 5 (id 1); id 4 cut
    assert(got === Map(2L -> 1, 3L -> 2, 1L -> 3))
  }

  test("conjunctiveTopK: AND semantics, integer tf-idf ranking") {
    import spark.implicits._
    // docs: 1 has both terms (ant x2, bee x1); 2 has both once; 3 has
    // only ant; 4 neither. N=4; df(ant)=3, df(bee)=2.
    // idf(ant) = (100*5) div 4 = 125; idf(bee) = 500 div 3 = 166
    // score(1) = 2*125 + 1*166 = 416; score(2) = 125 + 166 = 291
    val d = Seq(
      (1L, "ant ant bee"), (2L, "ant bee moth"),
      (3L, "ant moth moth"), (4L, "moth moth moth"))
      .toDF("doc_id", "text")
    val got = Retrieval.conjunctiveTopK(d, col("doc_id"), col("text"),
        Seq("ant", "bee"), k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 416L), (2L, 291L)))
  }

  test("conjunctiveTopK: a term matching nothing empties the result") {
    import spark.implicits._
    val d = Seq((1L, "ant bee")).toDF("doc_id", "text")
    val got = Retrieval.conjunctiveTopK(d, col("doc_id"), col("text"),
      Seq("ant", "unicorn"), k = 10).collect()
    assert(got.isEmpty)
  }

  test("invertedTopKPartitioned: probe is partition-pruned and rank-correct") {
    import spark.implicits._
    val idx = graft.util.TmpDirs.perProcess("graft_test_inv_idx")
    val d = Seq((1L, "ant ant bee"), (2L, "ant bee moth"),
      (3L, "moth moth")).toDF("doc_id", "text")
    val probe = Retrieval.invertedTopKPartitioned(d, col("doc_id"),
      col("text"), queryTerm = "ant", k = 10, buckets = 4, indexDir = idx)
    // N=3, df(ant)=2 -> idf = 400 div 3 = 133; doc1 tf=2 -> 266, doc2 -> 133
    val got = probe.as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 266L), (2L, 133L)))
    // the probe scan must prune at the partition level
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"probe not partition-pruned:\n$plan")
    // and the index at rest is one directory per term bucket
    assert(new java.io.File(idx).listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("bucket=")))
  }

  test("phraseTopK: adjacency only, counted per occurrence, order-sensitive") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c a b"),   // "a b" twice
      (2L, "b a"),         // reversed — no hit
      (3L, "a x b"),       // gap — no hit
      (4L, "a b"))         // once
      .toDF("doc_id", "text")
    val got = Retrieval.phraseTopK(d, col("doc_id"), col("text"),
      Seq("a", "b"), k = 10).as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L), (4L, 1L)))
  }

  test("phraseTopK: three-term phrase needs all offsets to line up") {
    import spark.implicits._
    val d = Seq(
      (1L, "x y z x y z"), // twice
      (2L, "x y x z"),     // "x y" but no z after -> no hit
      (3L, "y z x"))       // wrong order -> no hit
      .toDF("doc_id", "text")
    val got = Retrieval.phraseTopK(d, col("doc_id"), col("text"),
      Seq("x", "y", "z"), k = 10).as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L)))
  }

  test("bm25ScoreBpDyn: identical scores to the literal-term form") {
    import spark.implicits._
    val terms = Seq("spark", "join", "window").toDF("term")
    val fixed = Retrieval.bm25ScoreBp(docs, col("doc_id"), col("text"),
        Seq("spark", "join", "window"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val dyn = Retrieval.bm25ScoreBpDyn(docs, col("doc_id"), col("text"),
        terms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(dyn === fixed)
  }

  test("prfExpand: rm3 = 2*seed + exp; seed terms never expand") {
    // seed hits doc 1 only; docs 1,2 share "alpha" (len>=3) -> alpha is
    // an expansion term and rescores doc 2 even though the seed missed it
    import spark.implicits._
    val d = Seq(
      (1L, "spark alpha alpha beta"),
      (2L, "alpha gamma gamma gamma"),
      (3L, "delta delta delta delta"))
      .toDF("doc_id", "text")
    val got = Retrieval.prfExpand(d, col("doc_id"), col("text"),
        Seq("spark"), k = 10, m = 2, minTermLen = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    got.values.foreach { case (s, e, rm3) => assert(rm3 === 2 * s + e) }
    assert(got(1L)._1 > 0L, "seed hit keeps its seed score")
    assert(got.contains(2L) && got(2L)._1 === 0L && got(2L)._2 > 0L,
      "expansion-only doc enters with seed_bp = 0")
    assert(!got.contains(3L), "doc hitting neither vocabulary is absent")
  }
}
