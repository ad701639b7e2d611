package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.IntMath._
import graft.functions.TextFunctions.{hash60, words}

/** Retrieval scoring shared by the BM25 (q100) and hybrid-fusion (q116)
  * queries: Okapi BM25 with NO float in the scoring path, and the
  * reciprocal-rank-fusion combiner for text + vector rank lists.
  *
  * BM25 (k1 = 6/5, b = 3/4) as exact integer arithmetic: clearing the
  * denominators of tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with
  * avgdl = T/N gives tf_norm = 44·tf·T / (20·tf·T + 6·T + 18·dl·N); the
  * idf is the rational (N+1)/(df+1) (no transcendental, so both engines
  * agree bit-for-bit — log damping traded for cross-engine exactness).
  * Per-term contribution = halfUp(idf_bp · tfnorm_bp / 10⁴), summed as
  * longs. Long bounds hold through ~1e9 corpus tokens per stat
  * partition; beyond that the same formulas run in DECIMAL(38).
  *
  * Scale shape: the isin(query terms) filter runs BEFORE the (doc, term)
  * agg — the posting lists of the query's terms, not the corpus
  * vocabulary, reach the shuffle; df/N/T collapse to broadcast rows; the
  * per-doc score is one map-side-combined agg.
  */
object Retrieval {

  /** Per-document BM25: (doc_id, nh = #query terms hit, score_bp =
    * BM25 x 10^4 as a long). Only documents hitting >= 1 query term
    * appear (BM25 of the rest is 0).
    */
  def bm25ScoreBp(df: DataFrame, id: Column, text: Column,
                  qterms: Seq[String]): DataFrame = {
    val w = df.select(id.as("doc_id"), words(text).as("ws"))
    val tf = w.select(col("doc_id"), explode(col("ws")).as("term"))
      .filter(col("term").isin(qterms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    bm25Core(w, tf)
  }

  /** [[bm25ScoreBp]] with a DATA-DEPENDENT term set: the query terms
    * arrive as a (small) DataFrame instead of a literal list, so a
    * data-derived vocabulary (PRF expansion, a learned synonym table)
    * can drive the scorer without a driver round-trip. The membership
    * test becomes a broadcast semi-shaped join on the token stream —
    * same posting-list-only shuffle as the literal form.
    */
  def bm25ScoreBpDyn(df: DataFrame, id: Column, text: Column,
                     terms: DataFrame): DataFrame = {
    val w = df.select(id.as("doc_id"), words(text).as("ws"))
    val tf = w.select(col("doc_id"), explode(col("ws")).as("term"))
      .join(broadcast(terms.select(col("term"))), "term")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    bm25Core(w, tf)
  }

  private def bm25Core(w: DataFrame, tf: DataFrame): DataFrame = {
    val dl = w.select(col("doc_id"), size(col("ws")).cast("long").as("dl"))
    val g = dl.agg(sum("dl").as("t"), count(lit(1)).as("n"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val den = lit(20L) * col("tf") * col("t") + lit(6L) * col("t") +
      lit(18L) * col("dl") * col("n")
    val idfBp = halfUp(col("n") + 1L, col("df") + 1L, 10000L)
    val tfnBp = halfUp(lit(44L) * col("tf") * col("t"), den, 10000L)
    val contrib = intDiv(lit(2L) * idfBp * tfnBp + 10000L, lit(20000L))
    tf.join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(g))
      .select(col("doc_id"), contrib.as("c"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nh"), sum("c").as("score_bp"))
  }

  /** PSEUDO-RELEVANCE-FEEDBACK expansion (the RM3 shape): score the
    * seed query, harvest expansion terms from the top-`k` documents
    * (highest total tf inside the feedback set, tie term asc, seed
    * terms and terms shorter than `minTermLen` excluded), rescore with
    * the expansion vocabulary, and fuse as rm3 = 2·seed + 1·expansion —
    * integer weights, so the fused score stays exact.
    *
    * Scale shape: the feedback set is a TakeOrdered top-k (never a
    * global sort); expansion-term harvest joins the token stream
    * against the BROADCAST top-k doc list; both scoring passes are the
    * bm25 posting-list shape; the final fusion is one full-outer join
    * on doc_id between two already-aggregated score tables.
    */
  def prfExpand(df: DataFrame, id: Column, text: Column,
                seed: Seq[String], k: Int, m: Int,
                minTermLen: Int): DataFrame = {
    val seedScores = bm25ScoreBp(df, id, text, seed)
      .select(col("doc_id"), col("score_bp").as("seed_bp"))
    val top = seedScores
      .orderBy(col("seed_bp").desc, col("doc_id")).limit(k)
      .select("doc_id")
    val tok = df.select(id.as("doc_id"), explode(words(text)).as("term"))
    val expTerms = tok.join(broadcast(top), "doc_id")
      .filter(!col("term").isin(seed: _*) &&
        length(col("term")) >= minTermLen)
      .groupBy("term").agg(count(lit(1)).as("tfq"))
      .orderBy(col("tfq").desc, col("term")).limit(m)
      .select("term")
    val expScores = bm25ScoreBpDyn(df, id, text, expTerms)
      .select(col("doc_id"), col("score_bp").as("exp_bp"))
    seedScores.join(expScores, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("seed_bp"), lit(0L)).as("seed_bp"),
        coalesce(col("exp_bp"), lit(0L)).as("exp_bp"))
      .withColumn("rm3_bp",
        lit(2L) * col("seed_bp") + col("exp_bp"))
  }

  /** TF-IDF-WEIGHTED gram cosine similarity self-join — the weighted
    * sibling of q23's set-Jaccard join: pairs are scored by the cosine
    * of their tf·idf n-gram vectors, so a pair sharing RARE grams
    * outranks one sharing boilerplate, which set semantics cannot
    * express. All arithmetic exact:
    *
    *   w(doc, gram) = tf · ((100·(N+1)) div (df+1))  for 2 ≤ df ≤ maxDf
    *                = 0                               otherwise
    *   cos²_bp      = (dot·dot) div ((‖a‖²·‖b‖²) div 10⁴) — DECIMAL(38)
    *
    * The df cap is PART OF THE CONTRACT, not an approximation knob
    * bolted on: grams with df > maxDf are exactly the low-idf
    * boilerplate the weighting already discounts (and df = 1 grams pair
    * with nobody), so the vector space is DEFINED over the
    * mid-frequency band and the oracle replays the identical program.
    * That choice is what makes the join one-shuffle: because only
    * banded grams carry weight, the dot product decomposes into
    * per-gram pair contributions wa·wb emitted straight off each
    * posting list (≤ C(maxDf, 2) pairs per gram — the PPJoin-flavored
    * emission), summed by pair key. No candidate set is ever rejoined
    * to corpus-sized vector tables — the earlier full-vector verify
    * shape cost 14 s at sf0.1 in exactly that rejoin; this form runs
    * the same data in ~3 s with identical banded semantics.
    *
    * The squared cosine in basis points avoids sqrt (libm) — both
    * engines evaluate the identical integral program (q100's bargain).
    * DECIMAL(38,0) headroom: w ≤ tf·50·(N+1); dot² stays under 10³⁸
    * through ~10⁵ docs at these doc lengths — beyond that the idf scale
    * (100) drops a digit; the bound is loud here, not silently wrong.
    *
    * Scale shape: ONE gram-keyed shuffle whose fan-out is hard-bounded
    * by the df band (hot grams never enter a posting list); the pair
    * aggregation and the two norm joins are keyed on doc ids. df/N ride
    * as broadcasts.
    */
  def tfidfGramCosineJoin(df: DataFrame, id: Column, text: Column,
                          n: Int, maxDf: Int, minBp: Long): DataFrame = {
    val grams = df.select(id.as("doc_id"), words(text).as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"),
        // Shingle hashing at the explode (r15, guide §2.3 narrower
        // types — the q23 gramBuckets precedent): every downstream
        // key — the tf agg, the df agg, the idf broadcast probe and
        // the posting self-join — groups/joins an 8-byte xxhash64
        // instead of a ~25-byte gram string (≈3× fewer shuffled key
        // bytes, long compares instead of string compares). A 64-bit
        // collision merges two grams' tf/df — P ≈ G²/2⁶⁵, ~1e-11 at
        // 10M distinct grams — the same accepted tradeoff MinHash
        // makes hashing shingles; the gram string itself never
        // reaches the output (pairs are scored, not labeled).
        explode(graft.functions.WordGramsNative.gramsCol(col("ws"), n))
          .as("gram0"))
      .select(col("doc_id"), xxhash64(col("gram0")).as("gram"))
    val tf = grams.groupBy("doc_id", "gram").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val tfk = tf.join(broadcast(dfreq), "gram")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("gram"),
        (col("tf") * expr("(100 * (n_docs + 1)) div (df + 1)"))
          .cast("decimal(38,0)").as("w"))
    val norms = tfk.groupBy("doc_id").agg(sum(col("w") * col("w")).as("n2"))
    val dot = tfk.as("a").join(tfk.as("b"), "gram")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (col("a.w") * col("b.w")).as("c"))
      .groupBy("doc_a", "doc_b").agg(sum(col("c")).as("dot"))
    dot
      .join(norms.select(col("doc_id").as("doc_a"), col("n2").as("n2a")),
        "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("n2").as("n2b")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr("(dot * dot) div ((n2a * n2b) div 10000)").cast("long")
          .as("cos2_bp"))
      .filter(col("cos2_bp") >= minBp)
  }

  /** CONJUNCTIVE (boolean-AND) retrieval with rarest-first posting
    * intersection: documents containing ALL query terms, ranked by the
    * summed integer tf·idf (q100/q182's rational idf — no libm). The
    * posting lists are intersected starting from the RAREST term — the
    * classic conjunctive-query optimization: every subsequent semi-join
    * probes a candidate set already no larger than the smallest df, so
    * intersection cost is bounded by min(df), not corpus size. The
    * term→df table is `|terms|` rows; collecting it to order the chain
    * is the same bounded-driver-data bargain as a broadcast join.
    *
    * Scale shape: the token explode is scanned ONCE into per-(doc,term)
    * tf (terms filtered at the scan — the isin pushes down); the
    * rarest-first chain is |terms|−1 semi-joins keyed on doc_id; the
    * final score join touches only surviving candidates; df/N ride as
    * broadcasts. Top-k via TakeOrderedAndProject.
    */
  def conjunctiveTopK(df: DataFrame, id: Column, text: Column,
                      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "conjunctiveTopK needs at least one term")
    val toks = df.select(id.as("doc_id"), explode(words(text)).as("term"))
      .filter(col("term").isin(terms: _*))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    // |terms| rows to the driver, solely to fix the intersection order
    val dfByTerm = dfreq.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ordered = terms.distinct.sortBy(t => (dfByTerm.getOrElse(t, 0L), t))
    def postings(t: String) =
      tf.filter(col("term") === t).select("doc_id")
    val cand = ordered.tail.foldLeft(postings(ordered.head)) { (acc, t) =>
      acc.join(postings(t), Seq("doc_id"), "left_semi")
    }
    tf.join(cand, Seq("doc_id"), "left_semi")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(nDocs))
      .groupBy("doc_id")
      .agg(sum(col("tf") * expr("(100 * (n_docs + 1)) div (df + 1)"))
        .cast("long").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** POSITIONAL phrase search: rank documents by exact-phrase frequency
    * ("term₁ immediately before term₂ …"), the positional-index query
    * the bag-of-words scorers above cannot answer. The index unit is the
    * positional posting (doc_id, position) per term; a phrase hit is an
    * equi-join of the phrase terms' postings on (doc_id, position −
    * offset) — the classic positional-intersection plan.
    *
    * Scale shape: the `isin(phrase terms)` filter runs on the exploded
    * stream BEFORE anything shuffles, so only the phrase terms' postings
    * (not the corpus token stream) reach the joins — at any corpus size
    * a query touches |phrase| posting lists. The intersection joins are
    * equi-joins keyed on (doc_id, adjusted position); the final count is
    * one map-side-combined agg + TakeOrderedAndProject.
    */
  def phraseTopK(df: DataFrame, id: Column, text: Column,
                 phrase: Seq[String], k: Int): DataFrame = {
    require(phrase.length >= 2, "phraseTopK needs a phrase of >= 2 terms")
    val pos = df
      .select(id.as("doc_id"), posexplode(words(text)).as(Seq("pos", "term")))
      .filter(col("term").isin(phrase: _*))
    def postings(t: String, offset: Int) =
      pos.filter(col("term") === t)
        .select(col("doc_id"), (col("pos") - offset).as("anchor"))
    val hits = phrase.zipWithIndex.tail.foldLeft(postings(phrase.head, 0)) {
      case (acc, (t, i)) => acc.join(postings(t, i), Seq("doc_id", "anchor"))
    }
    hits.groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("phrase_tf"))
      .orderBy(col("phrase_tf").desc, col("doc_id"))
      .limit(k)
  }

  /** PERSISTED inverted index with a partition-pruned probe — q175's
    * billion-scale serving layout applied to LEXICAL retrieval: the
    * postings table (term, doc, integer tf·idf weight) is written ONCE
    * partitioned by a term-hash bucket, and a term lookup reads back
    * through a PartitionFilter — non-probed buckets pruned at the FILE
    * level, so a query touches 1/`buckets` of the index regardless of
    * corpus size. The probe-side bucket is computed on the driver with
    * the same md5 derivation the build used (one scalar, not a job).
    *
    * Scale shape: the build is the q119 index build plus one
    * partitioned write (the shuffle pays once, at layout time); the
    * probe is a pruned scan + TakeOrderedAndProject. RetrievalSpec
    * asserts the PartitionFilters plan property, exactly like
    * SimilaritySpec does for the IVF index.
    */
  def invertedTopKPartitioned(df: DataFrame, id: Column, text: Column,
                              queryTerm: String, k: Int, buckets: Int,
                              indexDir: String): DataFrame = {
    require(buckets >= 1, "invertedTopKPartitioned needs buckets >= 1")
    val spark = df.sparkSession
    val toks = df.select(id.as("doc_id"), explode(words(text)).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
      .select(col("term"), col("doc_id"),
        (col("tf") * expr("(100 * (n_docs + 1)) div (df + 1)"))
          .cast("long").as("w"),
        pmod(hash60(col("term"), 0), lit(buckets.toLong)).as("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(indexDir)
    // driver-side replica of hash60(term, 0) — one scalar, no job
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"0#$queryTerm".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    val bucket = java.lang.Long.remainderUnsigned(
      java.lang.Long.parseLong(hex, 16), buckets.toLong)
    spark.read.parquet(indexDir)
      .filter(col("bucket") === bucket && col("term") === queryTerm)
      .select(col("doc_id"), col("w"))
      .orderBy(col("w").desc, col("doc_id"))
      .limit(k)
  }

  /** Reciprocal-rank fusion of two (id, rank) lists: score =
    * Σ 1e6 div (k + rank) over the lists containing the id — the
    * standard RRF with the 1/(k+r) terms scaled to exact integers (1e6
    * div is the identical truncating division on both engines; k = 60,
    * Cormack et al.'s constant). Inputs are top-N lists (a broadcast
    * handful of rows each), so the full-outer fusion join is trivially
    * small at any corpus size — the heavy lifting happened in the
    * rankers.
    */
  def rrfFuse(a: DataFrame, aId: String, aRank: String,
              b: DataFrame, bId: String, bRank: String,
              k: Int = 60): DataFrame = {
    val l = a.select(col(aId).as("id"), col(aRank).as("rank_a"))
    val r = b.select(col(bId).as("id"), col(bRank).as("rank_b"))
    l.join(r, Seq("id"), "full_outer")
      .select(col("id"), col("rank_a"), col("rank_b"),
        (coalesce(intDiv(lit(1000000L), lit(k.toLong) + col("rank_a")), lit(0L)) +
          coalesce(intDiv(lit(1000000L), lit(k.toLong) + col("rank_b")), lit(0L)))
          .as("rrf_score"))
  }

  /** `rrfFuse` variant that CARRIES payload columns through the fusion:
    * inputs are (id, rank, payload…) frames; output keeps every payload
    * column from both sides plus rank_a / rank_b / rrf_score. Use this
    * for corpus-sized full-list fusion — one key-keyed full-outer join
    * (one shuffle per side), with no post-fuse payload re-join and thus
    * no lazy re-derivation of the rankers.
    */
  def rrfFuseCarry(a: DataFrame, aId: String, aRank: String,
                   b: DataFrame, bId: String, bRank: String,
                   k: Int = 60): DataFrame = {
    val l = a.withColumnRenamed(aId, "id").withColumnRenamed(aRank, "rank_a")
    val r = b.withColumnRenamed(bId, "id").withColumnRenamed(bRank, "rank_b")
    l.join(r, Seq("id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(intDiv(lit(1000000L), lit(k.toLong) + col("rank_a")), lit(0L)) +
          coalesce(intDiv(lit(1000000L), lit(k.toLong) + col("rank_b")), lit(0L)))
  }

  /** Ranks the top `n` rows of `df` by (`score` desc, `tie` asc) —
    * TakeOrdered prunes to n rows BEFORE the single-partition
    * row_number window, so the global window only ever sees n rows.
    */
  def topNRanks(df: DataFrame, score: Column, tie: Column, n: Int,
                rankName: String): DataFrame =
    df.orderBy(score.desc, tie.asc).limit(n)
      .withColumn(rankName, row_number().over(
        Window.orderBy(score.desc, tie.asc)))
}
