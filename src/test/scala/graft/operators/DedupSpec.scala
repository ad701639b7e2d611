package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit-level dedup semantics on hand-built corpora (the oracle gate
  * covers the full algorithms at sf0.01; these pin the edge cases).
  */
class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts, keeps min id") {
    val d = Dedup.exact(
      docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z"),
      col("text"), col("doc_id"))
    val byKeep = d.collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byKeep === Map(1L -> 2L, 3L -> 1L))
  }

  test("dupClusters: chain a-b, b-c plus isolated pair d-e -> two components") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("dupClusters on an empty pair set returns an empty result") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.dupClusters(empty).count() === 0)
  }

  test("dupClusters converges on a cycle") {
    import spark.implicits._
    val pairs = Seq((5L, 6L), (6L, 7L), (7L, 5L)).toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(pairs).collect().map(_.getLong(1)).distinct
    assert(got === Array(5L))
  }

  test("dupClusters fails loudly when the round cap is hit before the fixpoint") {
    import spark.implicits._
    // 12-node path: diameter 11 > the 4 hops that maxRounds=2 allows;
    // localEdgeLimit=0 forces the distributed loop (the local union-find
    // has no round cap)
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      Dedup.dupClusters(pairs, maxRounds = 2, localEdgeLimit = 0).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("dupClusters: distributed loop and local union-find agree exactly") {
    import spark.implicits._
    // chains, a cycle, an isolated pair, overlapping cliques
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (7L, 5L),
      (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L), (22L, 23L))
      .toDF("doc_a", "doc_b")
    val local = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.dupClusters(pairs, localEdgeLimit = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local === dist)
    assert(local(23L) === 20L && local(7L) === 5L && local(11L) === 10L)
  }

  test("ngramJaccard finds near-identical docs and respects the threshold") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat", // high overlap
      3L -> "completely different text with no overlap at all")
    val pairs = Dedup.ngramJaccard(d, col("doc_id"), col("text"),
      n = 3, thr = 0.4, maxDf = 100).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
  }

  test("ngramJaccard DF cap removes corpus-wide shingles from the metric") {
    // 'x y z' appears in every doc; with maxDf=2 it is dropped, leaving
    // docs 1/2 sharing nothing -> no pair survives
    val d = docs(1L -> "x y z a b c", 2L -> "x y z d e f", 3L -> "x y z")
    val without = Dedup.ngramJaccard(d, col("doc_id"), col("text"),
      n = 3, thr = 0.1, maxDf = 2).collect()
    assert(!without.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    val withHot = Dedup.ngramJaccard(d, col("doc_id"), col("text"),
      n = 3, thr = 0.1, maxDf = 100).collect()
    assert(withHot.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("minhashLsh: identical docs always collide; verify stage is exact") {
    val d = docs(
      1L -> "one two three four five six seven eight",
      2L -> "one two three four five six seven eight",
      3L -> "nine ten eleven twelve thirteen fourteen")
    val pairs = Dedup.minhashLsh(d, col("doc_id"), col("text"),
      n = 3, numPerm = 16, bands = 4, thr = 0.9, maxBucket = 100).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ===
      Seq((1L, 2L, 1.0)))
  }

  test("simhash: identical docs -> identical fingerprints, hamming 0") {
    val d = docs(1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta")
    val fps = Dedup.simhashFingerprints(d, col("doc_id"), col("text"))
      .collect().map(_.getLong(1))
    assert(fps(0) === fps(1))
    val pairs = Dedup.simhashPairs(d, col("doc_id"), col("text"),
        maxDist = 3, maxBucket = 100)
      .collect()
    assert(pairs.length === 1 && pairs.head.getInt(2) === 0)
  }

  test("embeddingNearDupLsh agrees with the exact form on found pairs") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array.fill(64)(1.0f)),
      (2L, Array.fill(64)(1.0f)),                       // identical to 1
      (3L, Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val lsh = Dedup.embeddingNearDupLsh(vecs, col("vec_id"), col("embedding"),
      thr = 0.9, bands = 10, bitsPerBand = 6, maxBucket = 10000).collect()
    assert(lsh.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ===
      Seq((1L, 2L, 1.0)))
  }

  test("hammingPairs: generic fingerprints through the chunk machinery") {
    import spark.implicits._
    // fp 1 and 2 differ in 2 bits (hamming 2); fp 3 differs from 1 in 30
    val f1 = 0x0F0F0F0F0F0FL
    val f2 = f1 ^ 0x3L
    val f3 = f1 ^ 0x3FFF3FFF3FFFL
    val fp = Seq((1L, f1), (2L, f2), (3L, f3)).toDF("id", "fp60")
    val got = Dedup.hammingPairs(fp, col("id"), col("fp60"),
      maxDist = 3, maxBucket = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got === Seq((1L, 2L, 2)))
  }

  test("hammingPairs == simhashPairs when fed simhash fingerprints") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy dog again and again",
      3L -> "an entirely different document about completely other things")
    val direct = Dedup.simhashPairs(d, col("doc_id"), col("text"),
      maxDist = 3, maxBucket = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaGeneric = Dedup.hammingPairs(
      Dedup.simhashFingerprints(d, col("doc_id"), col("text")),
      col("doc_id"), col("simhash"), maxDist = 3, maxBucket = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(direct === viaGeneric)
    assert(direct.contains((1L, 2L, 0)))
  }

  test("substringRuns finds a shared span inside distinct documents") {
    // a 7-token span shared by docs 1 and 2, embedded in distinct text;
    // doc 3 shares nothing. w=4 → the span yields 4 consecutive dup
    // windows (positions differ per doc), merged into one run of 7.
    val span = "the quick brown fox jumps over fences"
    val d = docs(
      1L -> s"alpha beta $span gamma delta epsilon",
      2L -> s"one two three four $span five",
      3L -> "totally different words with no overlap at all here")
    val runs = Dedup.substringRuns(d, col("doc_id"), col("text"),
        w = 4, maxDf = 100)
      .orderBy("doc_id", "run_start").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(runs.toSeq === Seq((1L, 3, 4, 7), (2L, 5, 4, 7)))
  }

  test("substringRuns plan: one bounded-agg shuffle + one run-merge window") {
    val d = docs(1L -> "a b c d e", 2L -> "a b c d f")
    val plan = Dedup.substringRuns(d, col("doc_id"), col("text"),
      w = 3, maxDf = 10).queryExecution.executedPlan.toString
    // exactly: hash exchange into the bounded bucket agg, hash exchange
    // for the per-doc run window, and the final agg's exchange — NO
    // join anywhere (positions ride inside the buckets)
    assert(!plan.contains("Join"), plan)
    assert("bounded_long_list".r.findAllIn(plan).nonEmpty, plan)
  }

  test("substringRuns: a window hash over maxDf occurrences is dropped") {
    // the same 4-token text in 3 docs = 3 occurrences of one window
    // hash; cap 2 drops it entirely (the boilerplate guard)
    val d = docs(1L -> "a b c d", 2L -> "a b c d", 3L -> "a b c d")
    assert(Dedup.substringRuns(d, col("doc_id"), col("text"),
      w = 4, maxDf = 2).count() === 0)
    assert(Dedup.substringRuns(d, col("doc_id"), col("text"),
      w = 4, maxDf = 3).count() === 3)
  }

  private def cleanRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))

  test("substringClean keeps the canonical span copy, splices the rest") {
    val span = "the quick brown fox jumps over fences"
    val d = docs(
      1L -> s"alpha beta $span gamma delta epsilon",
      2L -> s"one two three four $span five",
      3L -> "totally different words with no overlap at all here")
    val got = cleanRows(Dedup.substringClean(d, col("doc_id"), col("text"),
      w = 4, maxDf = 100))
    // doc 1 holds every canonical occurrence (min doc_id) → untouched;
    // doc 2 loses exactly the 7 span tokens (positions 5-11)
    assert(got.toSeq === Seq(
      (1L, 12, 0, s"alpha beta $span gamma delta epsilon"),
      (2L, 12, 7, "one two three four five"),
      (3L, 9, 0, "totally different words with no overlap at all here")))
  }

  test("substringClean empties exact duplicates down to one copy") {
    val d = docs(1L -> "a b c d", 2L -> "a b c d", 3L -> "a b c d")
    val got = cleanRows(Dedup.substringClean(d, col("doc_id"), col("text"),
      w = 4, maxDf = 100))
    assert(got.toSeq === Seq(
      (1L, 4, 0, "a b c d"), (2L, 4, 4, ""), (3L, 4, 4, "")))
  }

  test("substringClean: a window past the maxDf cap is removed nowhere") {
    // 3 occurrences, cap 2 → the boilerplate guard keeps all copies
    val d = docs(1L -> "a b c d", 2L -> "a b c d", 3L -> "a b c d")
    val got = cleanRows(Dedup.substringClean(d, col("doc_id"), col("text"),
      w = 4, maxDf = 2))
    assert(got.forall(_._3 === 0))
  }

  test("editSimilarity: identical prefixes 10000bp; divergence past the cap invisible") {
    import spark.implicits._
    val long = ("x " * 70).trim // 139 chars — differs only past 120
    val d = docs(
      1L -> "kitten sits here",
      2L -> "sitten sits here", // lev 1 of 16 chars
      3L -> (long + " TAIL_A"),
      4L -> (long + " TAIL_B"))
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val got = Dedup.editSimilarity(d, col("doc_id"), col("text"), pairs, 120)
      .select("doc_a", "edit_dist", "edit_sim_bp")
      .as[(Long, Long, Long)].collect()
      .map { case (a, e, s) => a -> (e, s) }.toMap
    // lev("kitten...","sitten...") = 1; halfUp(1/16*1e4) = 625
    assert(got(1L) === ((1L, 10000L - 625L)))
    // both truncate to the same 120-char prefix → distance 0, sim 10000
    assert(got(3L) === ((0L, 10000L)))
  }

  test("prefixJaccard is lossless: equals brute-force gram Jaccard at the threshold") {
    import spark.implicits._
    // boilerplate tail ("copyright acme corp") shared by every doc —
    // under the DF-cap strategy those hot grams need the cap; under
    // prefix filtering they sort last in every doc's rare-first order
    // and prune themselves, losing nothing
    val texts = Map(
      1L -> "alpha beta gamma delta copyright acme corp",
      2L -> "alpha beta gamma delta epsilon copyright acme corp",
      3L -> "one two three four copyright acme corp",
      4L -> "one two three four copyright acme corp", // dup of 3 → J=1
      5L -> "something else entirely copyright acme corp")
    val d = docs(texts.toSeq.sortBy(_._1): _*)
    val got = Dedup.prefixJaccard(d, col("doc_id"), col("text"),
        n = 3, thr = 0.35, maxPost = 1000)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().sorted.toSeq
    // brute force over all pairs of exact 3-gram sets at thr=0.35
    def grams(s: String) =
      s.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val want = (for {
      a <- texts.keys; b <- texts.keys if a < b
      sa = grams(texts(a)); sb = grams(texts(b))
      j = math.rint(sa.intersect(sb).size.toDouble /
        sa.union(sb).size * 10000) / 10000
      if j >= 0.35
    } yield (a, b, j)).toSeq.sorted
    assert(want.nonEmpty && want.exists(_._3 < 1.0),
      s"fixture must exercise a non-trivial near-dup pair: $want")
    assert(got === want)
  }

  test("sortedNeighborhoodPairs: prefix-sorted neighbors pair; far rows don't") {
    import spark.implicits._
    // docs 1/2 share a prefix and 80%+ of grams -> adjacent in sort
    // order, verified; doc 3 shares the 2-char block but nothing else;
    // doc 4 lives in a different block entirely
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "alpha beta gamma delta epsilon zeta theta"),
      (3L, "almost nothing in common here at all"),
      (4L, "zulu oscar november completely different"))
      .toDF("doc_id", "text")
    val got = Dedup.sortedNeighborhoodPairs(d, col("doc_id"), col("text"),
        n = 3, keyLen = 24, blockLen = 2, win = 6, minBp = 2000L)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    // grams(1) = 5, grams(2) = 5, shared = 4 -> 10000*4 div 6 = 6666
    assert(got === Seq((1L, 2L, 6666L)))
  }

  test("sortedNeighborhoodPairs: window bound limits pairing distance") {
    import spark.implicits._
    // five docs in one block, sort order = doc_id (identical prefix key
    // would tie — vary the 24-char key tail); win=2 pairs only adjacent
    // ranks, so 1-3 never pairs even though their Jaccard is high
    val mk = (i: Long, tail: String) => (i, s"aa b$i $tail")
    val d = Seq(
      mk(1L, "common gram run one two three four"),
      mk(2L, "unrelated filler text completely else"),
      mk(3L, "common gram run one two three four"))
      .toDF("doc_id", "text")
    val got = Dedup.sortedNeighborhoodPairs(d, col("doc_id"), col("text"),
        n = 3, keyLen = 24, blockLen = 2, win = 2, minBp = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.contains((1L, 3L)),
      "rank distance 2 must not pair under win=2")
  }

  test("weightedJaccardPairs: repetition shifts the multiset score, set score blind") {
    import spark.implicits._
    // a = "x y z x y z" -> 3-grams [x y z, y z x, z x y, x y z]:
    //   tf {x y z: 2, y z x: 1, z x y: 1}, Ta = 4
    // b = "x y z q q q" -> [x y z, y z q, z q q, q q q], Tb = 4
    // shared Σmin = min(2,1) = 1 -> wJ = 1/(4+4-1) = 1/7 = 1428 bp
    val docs = Seq((1L, "x y z x y z"), (2L, "x y z q q q"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val got = Dedup.weightedJaccardPairs(pairs, docs,
        col("doc_id"), col("text"), n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq((1L, 2L, 1L, 1428L)))
  }

  test("weightedJaccardPairs: zero-overlap pair scores 0, not null") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "p q r s"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val got = Dedup.weightedJaccardPairs(pairs, docs,
        col("doc_id"), col("text"), n = 3)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq((0L, 0L)))
  }

  /** Mirror of cdcChunks' cut rule for spec oracles: cut after the 4-char
    * window ending at i+3 whenever its base-31 hash ≡ 0 (mod mask).
    */
  private def cdcOracle(text: String, mask: Int, minLen: Int): Seq[String] = {
    val cuts = (0 until math.max(0, text.length - 3)).filter { i0 =>
      val h = text(i0) * 29791 + text(i0 + 1) * 961 +
        text(i0 + 2) * 31 + text(i0 + 3)
      h % mask == 0
    }.map(_ + 4) // 1-based position of the cut end
    val bounds = 0 +: cuts :+ text.length
    bounds.sliding(2).collect {
      case Seq(s, e) if e > s => text.substring(s, e)
    }.filter(_.length >= minLen).toSeq
  }

  test("cdcChunks: chunks equal the reference cut program; concat restores") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "spark join window batch stream merge sort filter scan table",
      "abc") // under the 4-char window -> dropped entirely
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Dedup.cdcChunks(d, col("doc_id"), col("text"),
        mask = 16, minLen = 1)
      .as[(Long, String)].collect().groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSeq }
    texts.zipWithIndex.foreach { case (t, i) =>
      if (t.length >= 4)
        assert(got(i.toLong) === cdcOracle(t, 16, 1), s"doc $i")
      else assert(!got.contains(i.toLong))
    }
    // minLen = 1 keeps every segment, so chunks concatenate to the doc
    texts.filter(_.length >= 4).zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong).mkString === t)
    }
  }

  test("prefixJaccard length filter: lossless vs brute force incl. ratio-pruned pairs") {
    // doc 2 is doc 1 plus a long tail: high overlap but size ratio
    // below thr, so the in-fan-out length filter prunes the pair —
    // which is exactly right, since J <= min/max < thr; docs 3/4 are
    // near-identical and must survive. Brute force is the judge.
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val d = docs(
      1L -> base,
      2L -> (base + " " + ("iota kappa lambda mu nu xi omicron pi rho " * 4)),
      3L -> "one two three four five six seven eight nine ten",
      4L -> "one two three four five six seven eight nine zzz")
    val got = Dedup.prefixJaccard(d, col("doc_id"), col("text"),
        n = 3, thr = 0.6, maxPost = 1000)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the same gram sets
    val sets = Dedup.gramSets(d, col("doc_id"), col("text"), 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val ids = sets.keys.toSeq.sorted
    val want = (for {
      a <- ids; b <- ids if a < b
      s = sets(a).intersect(sets(b)).size
      j = s.toDouble / (sets(a).size + sets(b).size - s)
      if BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP) >= 0.6
    } yield (a, b)).toSet
    assert(got === want)
    assert(want.contains((3L, 4L)) && !want.exists(p => p._1 == 1L))
  }

  test("prefixJaccard half-up band: ratio just below thr that ROUNDS to thr survives") {
    // The verify stage thresholds round(J, 4) >= thr, so the smallest
    // qualifying exact J is thr - 0.00005. A containment pair with
    // size ratio in [thr - 0.00005, thr) sits exactly in that band:
    // J = 11999/20000 = 0.59995 < 0.6, round(J, 4) = 0.6. Both the
    // prefix-length bound and the size-ratio filter must admit it
    // (they prune on t_eff = (2·thrBp − 1)/20000, not thr) — the
    // round-9 advisor's losslessness hole. Minimality: for thr = 0.6
    // the band [0.59995, 0.6) contains no fraction with denominator
    // < 20000, so the fixture needs gram sets this large.
    import spark.implicits._
    val wordsB = (1 to 20002).map(i => f"w$i%06d")
    val textB = wordsB.mkString(" ")               // 20000 3-grams
    val textA = wordsB.take(12001).mkString(" ")   // 11999, all shared
    val d = docs(1L -> textA, 2L -> textB)
    val got = Dedup.prefixJaccard(d, col("doc_id"), col("text"),
        n = 3, thr = 0.6, maxPost = 100000)
      .select("doc_a", "doc_b", "n_a", "n_b", "shared", "jaccard")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 11999L, 20000L, 11999L, 0.6)))
  }

  test("prefixJaccard packed-long contract violations fail loudly") {
    import spark.implicits._
    val d = Seq((-5L, "alpha beta gamma delta"),
                (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.prefixJaccard(d, col("doc_id"), col("text"),
        n = 3, thr = 0.5, maxPost = 100).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("packed-long contract violated")),
      s"expected the pack-time raise_error, got: $e")
  }

  test("prefixJaccard pair-budget guard refuses loudly at admission time") {
    import spark.implicits._
    // 4 identical docs -> every prefix token posts all 4 -> bound
    // Sum C(4,2) >= 6 per token: a budget of 1 must refuse BEFORE the
    // fan-out, naming the escalation path; a generous budget admits
    // and the result is unchanged
    val t = "alpha beta gamma delta epsilon"
    val d = Seq((1L, t), (2L, t), (3L, t), (4L, t)).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.prefixJaccard(d, col("doc_id"), col("text"),
        n = 3, thr = 0.5, maxPost = 100, pairBudget = 1L)
    }
    assert(e.getMessage.contains("candidate-pair bound") &&
      e.getMessage.contains("minhashLsh"),
      s"guard must report the bound and the escalation path: $e")
    val ok = Dedup.prefixJaccard(d, col("doc_id"), col("text"),
      n = 3, thr = 0.5, maxPost = 100).collect()
    assert(ok.length === 6, "all C(4,2) identical pairs must verify")
  }

  test("minhashLshIncremental: cap crossing retires stored pairs; equals full recompute") {
    // identical texts share every band signature, so each text cluster
    // is one bucket per band; maxBucket = 3
    val t = "spark join window batch stream merge sort filter scan table"
    val o = "completely different words appear inside this other document body now"
    val d = docs(1L -> t, 2L -> t, 3L -> t, 10L -> o, 11L -> o, 99L -> t)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = Dedup.minhashLshIncremental(d, col("doc_id"), col("text"),
      isDelta = col("doc_id") === 99L,
      n = 3, numPerm = 16, bands = 4, thr = 0.5, maxBucket = 3)
    val full = Dedup.minhashLsh(d, col("doc_id"), col("text"),
      n = 3, numPerm = 16, bands = 4, thr = 0.5, maxBucket = 3)
    // base t-bucket sat EXACTLY at the cap (pairs 1-2/1-3/2-3 stored);
    // the delta copy crosses it -> those pairs retire, matching the
    // full recompute dropping the degenerate bucket
    assert(pairs(full) === Set((10L, 11L)))
    assert(pairs(inc) === pairs(full))
    val st = inc.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getString(3)).toMap
    assert(st((10L, 11L)) === "kept")
  }

  test("tuneBanding: S-curve argmin at the midpoint, hand-computed fixed-point table") {
    // P(thr) per divisor pair of numPerm=16 under the truncating bp
    // chain (x -> x*base div 10000), worked by hand:
    //   thr=0.5: (1,16) p=0, (2,8) p=78, (4,4) p=2276, (8,2) p=9000,
    //            (16,1) p=10000 -> argmin |2p-10^4| = (4,4)
    //   thr=0.8: (2,8) p=3072 wins over (16,1) p=8000, (4,4) p=8786
    //   thr=0.2: (8,2) p=2789 wins over (16,1) p=2000, (4,4) p=64
    assert(Dedup.tuneBanding(16, 0.5) === ((4, 4, 2276L)))
    assert(Dedup.tuneBanding(16, 0.8) === ((2, 8, 3072L)))
    assert(Dedup.tuneBanding(16, 0.2) === ((8, 2, 2789L)))
    // monotone sanity: raising the target threshold never increases
    // the chosen band count (fewer bands = pickier generator)
    val picks = Seq(0.2, 0.35, 0.5, 0.65, 0.8, 0.95)
      .map(t => Dedup.tuneBanding(16, t)._1)
    assert(picks === picks.sorted.reverse, s"bands not monotone: $picks")
  }

  test("minhashLshRetire: cascade + resurrection; insert-then-delete round-trips exactly") {
    val t = "spark join window batch stream merge sort filter scan table"
    val o = "completely different words appear inside this other document body now"
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val args = (3, 16, 4, 0.5, 3) // n, numPerm, bands, thr, maxBucket
    // corpus after the q251 insert: t-bucket {1,2,3,99} is OVER the cap
    // (nothing stored). Deleting 99 drops it back to 3 -> the three t
    // pairs RESURRECT; the o pair survives as 'kept'; any pair touching
    // 99 stays gone (cascade).
    val withDelta = docs(1L -> t, 2L -> t, 3L -> t, 10L -> o, 11L -> o,
      99L -> t)
    val ret = Dedup.minhashLshRetire(withDelta, col("doc_id"), col("text"),
      isDeleted = col("doc_id") === 99L,
      n = args._1, numPerm = args._2, bands = args._3, thr = args._4,
      maxBucket = args._5)
    val base = Dedup.minhashLsh(
      docs(1L -> t, 2L -> t, 3L -> t, 10L -> o, 11L -> o),
      col("doc_id"), col("text"),
      n = args._1, numPerm = args._2, bands = args._3, thr = args._4,
      maxBucket = args._5)
    // exact round-trip: insert crossed the cap (q251 test: pairs
    // retired), delete restores the base recompute bit-for-bit
    assert(pairs(base) === Set((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L)))
    assert(pairs(ret) === pairs(base))
    val st = ret.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getString(3)).toMap
    assert(st((10L, 11L)) === "kept")
    assert(st((1L, 2L)) === "resurrected" &&
      st((1L, 3L)) === "resurrected" && st((2L, 3L)) === "resurrected")
  }

  test("minhashLshIncremental: delta inside the cap adds 'new' pairs, keeps base") {
    val t = "spark join window batch stream merge sort filter scan table"
    val o = "completely different words appear inside this other document body now"
    val d = docs(1L -> t, 2L -> t, 10L -> o, 11L -> o, 50L -> o)
    val inc = Dedup.minhashLshIncremental(d, col("doc_id"), col("text"),
        isDelta = col("doc_id") === 50L,
        n = 3, numPerm = 16, bands = 4, thr = 0.5, maxBucket = 3)
      .collect().map(r =>
        ((r.getLong(0), r.getLong(1)), r.getString(3))).toMap
    assert(inc === Map(
      (1L, 2L) -> "kept", (10L, 11L) -> "kept",
      (10L, 50L) -> "new", (11L, 50L) -> "new"))
  }

  test("cdcChunks native kernel is chunk-for-chunk equal to the composed form") {
    import spark.implicits._
    // real corpus (sf0.001 documents) + adversarial hand cases: doc at
    // exactly the 4-char window, cut landing on the final position,
    // minLen swallowing boundary fragments
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val hand = Seq(
      900L -> "abcd", 901L -> "abcde", 902L -> ("xy" * 200),
      903L -> "the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text")
    val d = real.unionByName(hand)
    for ((mask, minLen) <- Seq((64, 8), (16, 1), (7, 3))) {
      def pull(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, String)].collect().groupBy(_._1)
          .map { case (k, v) => k -> v.map(_._2).toSeq }
      val native = pull(Dedup.cdcChunks(d, col("doc_id"), col("text"),
        mask, minLen))
      val composed = pull(Dedup.cdcChunksComposed(d, col("doc_id"),
        col("text"), mask, minLen))
      assert(native === composed, s"mask=$mask minLen=$minLen")
    }
  }

  test("cdcChunks: boundaries re-synchronize after a prefix insertion") {
    import spark.implicits._
    val base = "spark join window batch stream merge sort filter scan " +
      "table group agg hash shuffle broadcast exchange partition prune"
    val edited = "XQZV" + base // 4-char insertion at the front
    val d = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(d, col("doc_id"), col("text"),
        mask = 16, minLen = 1)
      .as[(Long, String)].collect().groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSeq }
    // every base chunk after the first boundary reappears verbatim in
    // the edited doc — the fixed-width chunker property CDC exists to beat
    val tail = chunks(1L).drop(1)
    val editedSet = chunks(2L).toSet
    assert(tail.nonEmpty && tail.forall(editedSet.contains),
      s"tail chunks must survive the edit: $tail vs $editedSet")
  }

  test("editDistanceJoin: lossless pigeonhole candidates at exactly d, across lengths, under shifts") {
    import spark.implicits._
    val rows = Seq(
      1L -> "abcdefghijklmnop",        // base, len 16
      2L -> "Xbcdefghijklmnop",        // 1 substitution
      3L -> "XbcdefghijklmnoY",        // 2 substitutions
      4L -> "XbcYefghijklmnoZ",        // 3 substitutions — exactly d
      5L -> "XbcYefgWijklmnoZ",        // 4 substitutions — just over d
      6L -> "abcdefghijklm",           // 3 deletions at the tail (ed 3)
      7L -> "ZZZabcdefghijklmnop",     // 3-char head insertion: every
                                       //   segment SHIFTED by d (ed 3)
      8L -> "zzzzzzzzzzzzzzzz")        // unrelated, same length
    val out = Dedup.editDistanceJoin(rows.toDF("doc_id", "text"),
        col("doc_id"), col("text"), d = 3)
      .as[(Long, Long, Long)].collect().toSet
    // brute-force truth over the fixture
    def lev(a: String, b: String): Int = {
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
    val truth = (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      dist = lev(sa, sb) if dist <= 3
    } yield (ia, ib, dist.toLong)).toSet
    assert(out === truth,
      s"pigeonhole join diverged from brute force:\nout=$out\ntruth=$truth")
    assert(truth.exists(_._3 == 3L), "fixture must exercise dist == d exactly")
    assert(truth.contains((1L, 7L, 3L)),
      "the d-shifted head-insertion pair is the candidate-window edge case")
  }

  test("editDistanceJoin: saturated segment buckets refuse at admission with the measured bound") {
    import spark.implicits._
    // 40 near-identical strings: every segment bucket saturates, the
    // exact bound exceeds the budget BEFORE the join fan-out runs
    val rows = (1L to 40L).map(i => (i, f"abcdefghijklmnop$i%02d"))
    val e = intercept[IllegalArgumentException] {
      Dedup.editDistanceJoin(rows.toDF("doc_id", "text"),
        col("doc_id"), col("text"), d = 3, candBudget = 100L)
    }
    assert(e.getMessage.contains("candidate bound") &&
      e.getMessage.contains("candBudget=100"),
      s"guard must name the measured bound and the budget: ${e.getMessage}")
    // the same corpus passes under an adequate budget
    assert(Dedup.editDistanceJoin(rows.toDF("doc_id", "text"),
        col("doc_id"), col("text"), d = 3).count() >= 39,
      "consecutive ids differ by <= 2 edits — the pairs must survive")
  }

  test("editDistanceJoin: strings shorter than d+1 refuse loudly") {
    import spark.implicits._
    val e = intercept[Exception] {
      Dedup.editDistanceJoin(
          Seq(1L -> "abc", 2L -> "ab").toDF("doc_id", "text"),
          col("doc_id"), col("text"), d = 3)
        .collect()
    }
    assert(e.getMessage.contains("pigeonhole") ||
      Option(e.getCause).exists(_.getMessage.contains("pigeonhole")),
      s"short strings must hit the raise_error guard: ${e.getMessage}")
  }
}
