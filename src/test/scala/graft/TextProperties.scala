package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** ScalaCheck properties for the text/dedup surface. */
object TextProperties extends Properties("graft.text") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val word: Gen[String] =
    Gen.resize(6, Gen.nonEmptyListOf(Gen.alphaLowerChar)).map(_.mkString)
  private val wordSeq: Gen[List[String]] =
    Gen.resize(30, Gen.listOf(word))

  /** The winnowing guarantee (Schleimer et al.): two documents sharing a
    * run of at least n+w-1 = 6 consecutive words share >= 1 fingerprint.
    */
  property("winnowing: shared 6-word run => shared fingerprint") =
    forAll(wordSeq, wordSeq, Gen.listOfN(6, word)) { (padA, padB, run) =>
      import spark.implicits._
      val docA = (padA ++ run).mkString(" ")
      val docB = (run ++ padB).mkString(" ")
      val fps = Seq(docA, docB).toDF("text")
        .select(graft.functions.TextFunctions
          .winnowFingerprints(col("text"), n = 3, w = 4).as("f"))
        .collect().map(_.getSeq[Long](0).toSet)
      fps(0).intersect(fps(1)).nonEmpty
    }

  /** The native gram kernel is bit-identical to the composed zip_with
    * form on arbitrary word lists (including lists shorter than n).
    */
  property("wordGrams: native kernel == composed expression chain") =
    forAll(wordSeq, Gen.choose(1, 5)) { (doc, n) =>
      import spark.implicits._
      val df = Seq(doc.mkString(" ")).toDF("text")
        .select(graft.functions.TextFunctions.words(col("text")).as("ws"))
      val composed = df.select(graft.functions.TextFunctions
        .wordGrams(col("ws"), n)).head().getSeq[String](0)
      val native = df.select(graft.functions.WordGramsNative
        .gramsCol(col("ws"), n)).head().getSeq[String](0)
      native == composed
    }

  /** The containment guarantee: a document whose words appear as a
    * consecutive run inside another document has containment 1.0 in
    * the contained→containing direction (every gram of the small doc
    * exists in the large one), regardless of the padding.
    */
  property("containment: embedded doc is fully contained") =
    forAll(Gen.resize(10, Gen.listOfN(5, word)), wordSeq, wordSeq) {
      (run, padA, padB) =>
      import spark.implicits._
      val df = Seq(
        (1L, run.mkString(" ")),
        (2L, (padA ++ run ++ padB).mkString(" "))).toDF("doc_id", "text")
      val got = graft.operators.Dedup.containment(df, col("doc_id"),
          col("text"), n = 3, thr = 0.99, maxDf = 1000000)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      got.get((1L, 2L)).contains(1.0)
    }

  /** The native per-row MinHash signature kernel equals the
    * explode+aggregate formulation on arbitrary documents.
    */
  property("minhash signature: native kernel == aggregate formulation") =
    forAll(Gen.resize(5, Gen.nonEmptyListOf(wordSeq))) { docsWords =>
      import spark.implicits._
      val df = docsWords.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val native = graft.operators.Dedup
        .gramSets(df, col("doc_id"), col("text"), 3)
        .select(col("doc_id"), graft.functions.MinHashNative
          .signatureCol(col("grams"), 16).as("sig"))
        .filter(col("sig").isNotNull)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val agg = graft.operators.Dedup
        .minhashSignaturesAgg(df, col("doc_id"), col("text"), 3, 16)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      native == agg
    }

  /** The native per-row SimHash kernel equals the explode+aggregate
    * formulation on arbitrary documents (including docs with empty or
    * no tokens, which both must drop).
    */
  property("simhash: native kernel == aggregate formulation") =
    forAll(Gen.resize(5, Gen.nonEmptyListOf(wordSeq))) { docsWords =>
      import spark.implicits._
      val df = docsWords.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      def asMap(out: org.apache.spark.sql.DataFrame) =
        out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      asMap(graft.operators.Dedup.simhashFingerprints(
        df, col("doc_id"), col("text"))) ==
        asMap(graft.operators.Dedup.simhashFingerprintsAgg(
          df, col("doc_id"), col("text")))
    }

  /** The native winnow kernel is bit-identical to the composed
    * expression form on arbitrary documents (including docs shorter
    * than one gram or one window).
    */
  property("winnowing: native kernel == composed expression chain") =
    forAll(wordSeq) { doc =>
      import spark.implicits._
      val df = Seq(doc.mkString(" ")).toDF("text")
      val composed = df.select(graft.functions.TextFunctions
          .winnowFingerprints(col("text"), n = 3, w = 4))
        .head().getSeq[Long](0)
      val native = df.select(graft.functions.Winnow
          .fingerprintsCol(col("text"), n = 3, w = 4))
        .head().getSeq[Long](0)
      native == composed
    }

  /** Exact dedup conserves rows: the copy counts sum to the input size. */
  property("exact dedup: sum(n_copies) == row count") =
    forAll(Gen.resize(30, Gen.listOf(Gen.oneOf("a b c", "d e f", "g h i")))) { texts =>
      import spark.implicits._
      texts.isEmpty || {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val total = graft.operators.Dedup.exact(df, col("text"), col("doc_id"))
          .agg(sum("n_copies")).head().getLong(0)
        total == texts.size.toLong
      }
    }

  /** chunkTokens covers every token: the windows, replayed over the
    * doc's word array, reconstruct exactly the token positions 1..n
    * (no gap, no phantom), and consecutive starts differ by the stride.
    */
  property("chunkTokens: windows tile the document exactly") =
    forAll(Gen.choose(1, 90), Gen.choose(2, 12), Gen.choose(0, 10)) {
      (nWords, chunkSize, overlapRaw) =>
      val overlap = math.min(overlapRaw, chunkSize - 1)
      import spark.implicits._
      val text = (1 to nWords).map(i => s"w$i").mkString(" ")
      val rows = graft.operators.Curation.chunkTokens(
          Seq((1L, text)).toDF("doc_id", "text"),
          col("doc_id"), col("text"), chunkSize, overlap)
        .orderBy("chunk_start").collect()
      val starts = rows.map(_.getInt(1)).toList
      val lens = rows.map(_.getInt(2)).toList
      val covered = starts.zip(lens)
        .flatMap { case (s, l) => s until (s + l) }.toSet
      covered == (1 to nWords).toSet &&
        starts.zip(starts.drop(1)).forall { case (a, b) =>
          b - a == chunkSize - overlap }
    }

  /** dupClusters' two physical strategies reach the same fixpoint as an
    * in-test reference union-find, on arbitrary random graphs.
    */
  property("dupClusters: local and distributed agree with reference union-find") =
    forAll(Gen.resize(25,
      Gen.listOf(Gen.zip(Gen.choose(0L, 14L), Gen.choose(0L, 14L))))) { edges0 =>
      import spark.implicits._
      val edges = edges0.filter { case (a, b) => a != b }
      edges.isEmpty || {
        // reference: naive union-find with min-label relabel
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val expected = nodes.map(n => n -> find(n)).toMap
        val df = edges.toDF("doc_a", "doc_b")
        def run(localLimit: Long) =
          graft.operators.Dedup.dupClusters(df, localEdgeLimit = localLimit)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        run(Long.MaxValue) == expected && run(0L) == expected
      }
    }

  /** The capped chunk-bucket simhash candidate machinery equals the
    * replaced (uncapped) chunk self-join whenever no bucket exceeds the
    * cap — and the cap branch itself is exercised: with maxBucket = 1
    * every multi-doc bucket is dropped, so no pair can survive.
    */
  property("simhashPairs: capped buckets == uncapped self-join reference") =
    forAll(Gen.resize(6, Gen.nonEmptyListOf(
      Gen.resize(8, Gen.listOf(Gen.oneOf("aa", "bb", "cc", "dd", "ee")))))) {
      docsWords =>
      import spark.implicits._
      val df = docsWords.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      def asSet(out: org.apache.spark.sql.DataFrame) =
        out.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val capped = asSet(graft.operators.Dedup.simhashPairs(
        df, col("doc_id"), col("text"), maxDist = 3, maxBucket = 1000))
      val ref = asSet(graft.operators.Dedup.simhashPairsJoinRef(
        df, col("doc_id"), col("text"), maxDist = 3))
      val choked = asSet(graft.operators.Dedup.simhashPairs(
        df, col("doc_id"), col("text"), maxDist = 3, maxBucket = 1))
      capped == ref && choked.isEmpty
    }

  /** The bounded posting-bucket pair machinery (gramBuckets +
    * bucketPairs, via BoundedLongListAgg) computes exactly the DF-capped
    * pairwise Jaccard a direct reference computation produces — on
    * random corpora drawn from a tiny alphabet (maximal overlap) with
    * aggressive DF caps, so both the cap branch and the pair emission
    * are exercised.
    */
  property("ngramJaccard: bounded-bucket machinery == reference pair math") =
    forAll(
      Gen.resize(6, Gen.nonEmptyListOf(
        Gen.resize(8, Gen.listOf(Gen.oneOf("aa", "bb", "cc", "dd", "ee"))))),
      Gen.choose(1, 4)) { (docsWords, maxDf) =>
      import spark.implicits._
      val df = docsWords.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup
        .ngramJaccard(df, col("doc_id"), col("text"),
          n = 2, thr = 0.0, maxDf = maxDf)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      // reference: gram sets from the (already property-tested) kernel,
      // DF cap + pair Jaccard recomputed directly in Scala
      val gsets = graft.operators.Dedup
        .gramSets(df, col("doc_id"), col("text"), 2)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
        .toMap
      val dfCount = gsets.values.toSeq.flatten
        .groupBy(identity).view.mapValues(_.size).toMap
      val kept = gsets.view
        .mapValues(_.filter(g => dfCount(g) <= maxDf)).toMap
      val ids = kept.keys.toSeq.sorted
      val expected = (for {
        a <- ids; b <- ids if a < b
        shared = kept(a).intersect(kept(b)).size if shared > 0
      } yield {
        val j = BigDecimal(shared.toDouble /
            (kept(a).size + kept(b).size - shared))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (a, b) -> j
      }).toMap
      got == expected
    }

  /** The CDC kernel's cut program against an independent Scala
    * reference (not the composed Spark form — a second implementation
    * of the spec): chunks partition the doc at minLen=1, every cut
    * follows a hash-zero 4-char window, and the kernel agrees
    * chunk-for-chunk on arbitrary ASCII text and (mask, minLen).
    */
  property("cdc kernel == reference cut program on arbitrary ascii") =
    forAll(Gen.resize(300, Gen.listOf(Gen.choose(32.toChar, 126.toChar)))
        .map(_.mkString),
      Gen.choose(2, 97), Gen.choose(1, 12)) { (text, mask, minLen) =>
      import spark.implicits._
      def ref(t: String): Seq[String] = {
        if (t.length < 4) return Seq.empty
        val cuts = (0 until t.length - 3).filter { i =>
          (t(i) * 29791L + t(i + 1) * 961L + t(i + 2) * 31L +
            t(i + 3)) % mask == 0
        }.map(_ + 4)
        val bounds = 0 +: cuts :+ t.length
        bounds.sliding(2).collect {
          case Seq(s, e) if e > s => t.substring(s, e)
        }.filter(_.length >= minLen).toSeq
      }
      val got = graft.operators.Dedup.cdcChunks(
          Seq(1L -> text).toDF("doc_id", "text"),
          col("doc_id"), col("text"), mask, minLen)
        .collect().map(_.getString(1)).toSeq
      got == ref(text)
    }
}
