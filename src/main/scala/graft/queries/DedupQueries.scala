package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.util.Tables

/** Dedup operator pack over the `documents` / `embeddings` tables.
  * Each query replays the exact same algorithm in the DuckDB oracle
  * (identical md5-derived hashes, identical shingling, identical
  * thresholds applied to identically-rounded values), so LSH candidate
  * generation is verified end-to-end, not just "rows > 0".
  */
object DedupQueries {

  /** Shared oracle CTEs: normalized words and distinct 3-gram sets.
    * Mirrors TextFunctions.normText/words/distinctGrams exactly.
    */
  private val gramCtes =
    """WITH w AS (
      |  SELECT doc_id,
      |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
      |  FROM documents),
      |d AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(generate_series(1, len(ws) - 2),
      |      i -> array_to_string(ws[i:i+2], ' '))) AS grams
      |  FROM w WHERE len(ws) >= 3)""".stripMargin

  /** The q24 permutation constants, inlined from the same source of
    * truth the Spark side uses (TextFunctions.permConst).
    */
  private val permValues: String =
    (0 until 16).map { s =>
      val (a, b, c) = graft.functions.TextFunctions.permConst(s)
      s"($s, ${a}, ${b}, ${c})"
    }.mkString(", ")

  /** Shared MinHash+LSH candidate chain (q24 and q37 replay the same
    * algorithm; `j` holds verified-jaccard inputs per candidate pair).
    */
  private lazy val minhashCtes: String =
    s"""g AS (SELECT doc_id, unnest(grams) AS gram FROM d),
       |h AS (SELECT doc_id,
       |  ('0x' || substring(md5('0#' || gram), 1, 15))::BIGINT AS h FROM g),
       |perms(s, a, b, c) AS (VALUES $permValues),
       |sigs AS (
       |  SELECT h.doc_id, p.s,
       |    min((p.a * (h.h % 1073741824) + p.b * (h.h // 1073741824) + p.c)
       |        % 2147483647) AS mh
       |  FROM h, perms p
       |  GROUP BY h.doc_id, p.s),
       |bands AS (
       |  SELECT doc_id, s // 4 AS band_id,
       |    md5(string_agg(mh::VARCHAR, ',' ORDER BY s)) AS band_sig
       |  FROM sigs GROUP BY doc_id, band_id),
       |guard AS (SELECT * FROM bands
       |  QUALIFY count(*) OVER (PARTITION BY band_id, band_sig) <= 100),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM guard a JOIN guard b
       |    ON a.band_id = b.band_id AND a.band_sig = b.band_sig
       |    AND a.doc_id < b.doc_id),
       |j AS (
       |  SELECT doc_a, doc_b,
       |    CAST(len(list_filter(sa.grams, x -> list_contains(sb.grams, x))) AS DOUBLE) AS shared,
       |    len(sa.grams) AS na, len(sb.grams) AS nb
       |  FROM cand JOIN d sa ON doc_a = sa.doc_id JOIN d sb ON doc_b = sb.doc_id)""".stripMargin

  val qs: Seq[Q] = Seq(

    // Exact dedup: hash-groupBy on the full text. Scale: single shuffle
    // on the key; partial agg (min/count) combines map-side.
    Q("q22_dedup_exact",
      (s, d) => Tables(s, d, "documents")
        .groupBy("text")
        .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
        .select("keep_doc_id", "n_copies")
        .orderBy("keep_doc_id"),
      Some("""SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_doc_id""".stripMargin),
      "exact duplicate groups (hash-groupBy)"),

    // Word-3-gram Jaccard pairs over DF-capped gram sets (maxDf=20: the
    // skew guard against hot shingles whose f² join pairs would make one
    // key quadratic at corpus scale). Correctness anchor for the exact
    // pairing path; q24 is the sublinear scale path.
    Q("q23_dedup_ngram_jaccard",
      (s, d) => Dedup.ngramJaccard(Tables(s, d, "documents"),
          col("doc_id"), col("text"), n = 3, thr = 0.5, maxDf = 20)
        .orderBy("doc_a", "doc_b"),
      Some(s"""$gramCtes,
        |g AS (SELECT doc_id, unnest(grams) AS gram FROM d),
        |hot AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 20),
        |k AS (SELECT g.doc_id, g.gram FROM g ANTI JOIN hot USING (gram)),
        |sz AS (SELECT doc_id, count(*) AS n FROM k GROUP BY doc_id),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(count(*) AS DOUBLE) AS shared
        |  FROM k a JOIN k b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT doc_a, doc_b,
        |    round(shared / (sa.n + sb.n - shared), 4) AS jaccard
        |  FROM p JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id)
        |SELECT * FROM j WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin),
      "n-gram Jaccard with gram document-frequency cap (skew-guarded)"),

    // MinHash(16 perms, one md5 per gram + cheap permutations) +
    // LSH(4 bands x 4 rows) candidates with a bucket-size cap, verified
    // by exact Jaccard. Scale: signatures per-row with no shuffle;
    // candidate join keyed on (band, bandSig) — never O(n^2); degenerate
    // buckets (>100 docs) dropped before pairing.
    Q("q24_dedup_minhash_lsh",
      (s, d) => Dedup.minhashLsh(Tables(s, d, "documents"),
          col("doc_id"), col("text"), n = 3, numPerm = 16, bands = 4,
          thr = 0.5, maxBucket = 100)
        .orderBy("doc_a", "doc_b"),
      Some(s"""$gramCtes,
        |$minhashCtes
        |SELECT doc_a, doc_b, round(shared / (na + nb - shared), 4) AS jaccard
        |FROM j WHERE round(shared / (na + nb - shared), 4) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin),
      "MinHash+LSH near-dup (1-md5 permutation scheme, capped band buckets, exact-Jaccard verify)"),

    // SimHash 60-bit fingerprints; hamming<=3 pairs via 4x15-bit chunk
    // pigeonhole buckets, each bucket capped at 100 docs (the same
    // degenerate-key guard as q24/q26 — the oracle replays the cap via
    // the QUALIFY window below).
    Q("q25_dedup_simhash",
      (s, d) => Dedup.simhashPairs(Tables(s, d, "documents"),
          col("doc_id"), col("text"), maxDist = 3, maxBucket = 100)
        .orderBy("doc_a", "doc_b"),
      Some("""WITH w AS (
        |  SELECT doc_id,
        |    unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS word
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, ('0x' || substring(md5('0#' || word), 1, 15))::BIGINT AS h
        |  FROM w WHERE len(word) > 0),
        |bits AS (
        |  SELECT doc_id, t.i, CAST(sum(((h >> t.i) & 1) * 2 - 1) AS BIGINT) AS s
        |  FROM h, generate_series(0, 59) AS t(i)
        |  GROUP BY doc_id, t.i),
        |fp AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY doc_id),
        |ch AS (
        |  SELECT doc_id, simhash, t.c, (simhash >> (t.c * 15)) & 32767 AS chunk
        |  FROM fp, generate_series(0, 3) AS t(c)),
        |guard AS (SELECT * FROM ch
        |  QUALIFY count(*) OVER (PARTITION BY c, chunk) <= 100),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.simhash AS sim_a, b.simhash AS sim_b
        |  FROM guard a JOIN guard b
        |    ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin),
      "SimHash near-dup (chunk-bucket candidates, hamming verify)"),

    // Embedding near-dup, banded sign-LSH default (the 100 TB path):
    // 10 bands x 6 sign bits over disjoint dims, candidates = band
    // collisions (shuffle join on band keys — NO full-table broadcast,
    // never the global O(n^2) pair space), verified with exact cosine.
    // Recall is <1 by design (≈58% at thr 0.45 on this data; rises
    // sharply with the threshold) — the oracle replays the identical
    // banding, so the contract is verified end to end.
    Q("q26_dedup_embedding",
      // threshold 0.45 ~= the 99.99th percentile of pair similarity in the
      // synthetic embeddings (max ~0.51) — high enough to be "near-dup",
      // low enough that the query output is non-trivial.
      (s, d) => Dedup.embeddingNearDupLsh(Tables(s, d, "embeddings"),
          col("vec_id"), col("embedding"), thr = 0.45,
          bands = 10, bitsPerBand = 6, maxBucket = 1000)
        .orderBy("id_a", "id_b"),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |bands AS (
        |  SELECT vec_id, v, b.b AS band,
        |    (SELECT CAST(sum(CASE WHEN v[b.b * 6 + i + 1] > 0
        |                    THEN 1::BIGINT << i ELSE 0 END) AS BIGINT)
        |     FROM generate_series(0, 5) AS t(i)) AS sig
        |  FROM e, generate_series(0, 9) AS b(b)),
        |guarded AS (
        |  SELECT vec_id, band, sig FROM bands
        |  QUALIFY count(*) OVER (PARTITION BY band, sig) <= 1000),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM guarded a JOIN guarded b
        |    ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id),
        |j AS (
        |  SELECT id_a, id_b,
        |    round(list_cosine_similarity(ea.v, eb.v), 4) AS cos_sim
        |  FROM cand JOIN e ea ON id_a = ea.vec_id JOIN e eb ON id_b = eb.vec_id)
        |SELECT * FROM j WHERE cos_sim >= 0.45 ORDER BY id_a, id_b""".stripMargin),
      "embedding near-dup via banded sign-LSH + exact-cosine verify (scale default)"),

    // Exact pairwise anchor on a deterministic 1/5 sample: verifies the
    // exact-cosine path (the LSH verify stage) against the oracle without
    // running the full quadratic pair space at bench scale.
    Q("q36_dedup_embedding_exact",
      (s, d) => Dedup.embeddingNearDup(
          Tables(s, d, "embeddings").filter(col("vec_id") % 5 === 0),
          col("vec_id"), col("embedding"), thr = 0.4)
        .orderBy("id_a", "id_b"),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings WHERE vec_id % 5 = 0),
        |j AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT * FROM j WHERE cos_sim >= 0.4 ORDER BY id_a, id_b""".stripMargin),
      "embedding cosine near-dup (exact pairwise anchor, sampled)"),

    // Dedup CLUSTERS: connected components over the MinHash near-dup
    // pair graph — the step that turns pairwise similarity into keep/
    // drop decisions. Spark: Pregel-style min-label propagation (one
    // shuffle join + agg per iteration, iterations = component
    // diameter); oracle: DuckDB recursive CTE reaching the same unique
    // fixpoint.
    Q("q37_dedup_clusters",
      (s, d) => Dedup.dupClusters(
          Dedup.minhashLsh(Tables(s, d, "documents"),
            col("doc_id"), col("text"), n = 3, numPerm = 16, bands = 4,
            thr = 0.5, maxBucket = 100))
        .orderBy("doc_id"),
      Some(s"""${gramCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
        |$minhashCtes,
        |pairs AS (
        |  SELECT doc_a, doc_b FROM j
        |  WHERE round(shared / (na + nb - shared), 4) >= 0.5),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION
        |  SELECT doc_b, doc_a FROM pairs),
        |cc AS (
        |  SELECT src AS id, src AS label FROM edges
        |  UNION
        |  SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.id = e.src)
        |SELECT id AS doc_id, min(label) AS cluster_id
        |FROM cc GROUP BY id ORDER BY doc_id""".stripMargin),
      "near-dup clusters: connected components of the LSH pair graph"),

    // q68 — the dedup last mile: PRUNE the corpus to one representative
    // per near-dup cluster (min doc_id) plus all unclustered docs —
    // what a pretraining build actually keeps. Same candidate chain as
    // q37; the prune itself is one anti-join against the non-
    // representative members.
    Q("q68_neardup_prune",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val clusters = Dedup.dupClusters(
          Dedup.minhashLsh(docs, col("doc_id"), col("text"),
            n = 3, numPerm = 16, bands = 4, thr = 0.5, maxBucket = 100))
        val drop = clusters.filter(col("doc_id") =!= col("cluster_id"))
          .select("doc_id")
        docs.join(drop, Seq("doc_id"), "left_anti")
          .select("doc_id", "lang").orderBy("doc_id")
      },
      Some(s"""${gramCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
        |$minhashCtes,
        |pairs AS (
        |  SELECT doc_a, doc_b FROM j
        |  WHERE round(shared / (na + nb - shared), 4) >= 0.5),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION
        |  SELECT doc_b, doc_a FROM pairs),
        |cc AS (
        |  SELECT src AS id, src AS label FROM edges
        |  UNION
        |  SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.id = e.src),
        |drop AS (SELECT id AS doc_id FROM cc GROUP BY id
        |  HAVING min(label) <> id)
        |SELECT d.doc_id, d.lang FROM documents d
        |ANTI JOIN drop USING (doc_id)
        |ORDER BY doc_id""".stripMargin),
      "near-dup pruning: keep one representative per cluster + unclustered docs"),

    // q69 — asymmetric containment: doc_a's gram set covered >= 60% by
    // doc_b's (catches quotes/boilerplate subsets that symmetric
    // Jaccard misses when the containing doc is much larger). Both
    // directions emitted; same DF cap as q23.
    Q("q69_containment",
      (s, d) => Dedup.containment(Tables(s, d, "documents"),
          col("doc_id"), col("text"), n = 3, thr = 0.6, maxDf = 20)
        .orderBy("doc_a", "doc_b"),
      Some(s"""$gramCtes,
        |g AS (SELECT doc_id, unnest(grams) AS gram FROM d),
        |hot AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 20),
        |k AS (SELECT g.doc_id, g.gram FROM g ANTI JOIN hot USING (gram)),
        |sz AS (SELECT doc_id, count(*) AS n FROM k GROUP BY doc_id),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(count(*) AS DOUBLE) AS shared
        |  FROM k a JOIN k b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs2 AS (
        |  SELECT doc_a, doc_b, shared FROM p
        |  UNION ALL
        |  SELECT doc_b, doc_a, shared FROM p),
        |c AS (
        |  SELECT doc_a, doc_b, round(shared / sz.n, 4) AS containment
        |  FROM pairs2 JOIN sz ON doc_a = sz.doc_id)
        |SELECT * FROM c WHERE containment >= 0.6
        |ORDER BY doc_a, doc_b""".stripMargin),
      "asymmetric gram containment (quote/boilerplate subset detection)"),

    // q70 — the MinHash accuracy audit (q54/q63 pattern for the
    // signature sketch): for every verified near-dup pair, the
    // signature-agreement estimate (matching components / 16) is
    // emitted alongside the exact Jaccard. `close` is computed from
    // BOTH values identically on both engines, so the audit itself is
    // oracle-checked; 0.35 ≈ 3σ for 16 permutations at j≈0.5.
    Q("q70_minhash_estimate",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val pairs = Dedup.minhashLsh(docs, col("doc_id"), col("text"),
          n = 3, numPerm = 16, bands = 4, thr = 0.5, maxBucket = 100)
        val sigs = Dedup.gramSets(docs, col("doc_id"), col("text"), 3)
          .select(col("doc_id"),
            graft.functions.MinHashNative.signatureCol(col("grams"), 16)
              .as("sig"))
        pairs
          .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sa")), "doc_a")
          .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sb")), "doc_b")
          .select(col("doc_a"), col("doc_b"), col("jaccard"),
            round(aggregate(zip_with(col("sa"), col("sb"),
                (x, y) => (x === y).cast("int")), lit(0),
              (acc, x) => acc + x).cast("double") / 16.0, 4).as("est_jaccard"))
          .withColumn("close",
            abs(col("est_jaccard") - col("jaccard")) <= 0.35)
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""$gramCtes,
        |$minhashCtes,
        |pairs AS (
        |  SELECT doc_a, doc_b, round(shared / (na + nb - shared), 4) AS jaccard
        |  FROM j WHERE round(shared / (na + nb - shared), 4) >= 0.5),
        |est AS (
        |  SELECT p.doc_a, p.doc_b,
        |    round(CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS DOUBLE)
        |      / 16, 4) AS est_jaccard
        |  FROM pairs p
        |  JOIN sigs sa ON p.doc_a = sa.doc_id
        |  JOIN sigs sb ON p.doc_b = sb.doc_id AND sa.s = sb.s
        |  GROUP BY 1, 2)
        |SELECT p.doc_a, p.doc_b, p.jaccard, e.est_jaccard,
        |  abs(e.est_jaccard - p.jaccard) <= 0.35 AS close
        |FROM pairs p JOIN est e ON p.doc_a = e.doc_a AND p.doc_b = e.doc_b
        |ORDER BY p.doc_a, p.doc_b""".stripMargin),
      "MinHash signature-estimate vs exact Jaccard accuracy audit"),

    // q73 — exact SUBSTRING-level dedup: maximal runs of token windows
    // (w=15) duplicated across >= 2 distinct documents — the repeated-
    // span contamination that document-granularity dedup (q22-q26)
    // cannot see. Window hashes shared by > 200 occurrences are dropped
    // by the BoundedLongList cap (the boilerplate skew guard, replayed
    // in the oracle's HAVING).
    Q("q73_substring_runs",
      (s, d) => Dedup.substringRuns(Tables(s, d, "documents"),
          col("doc_id"), col("text"), w = 15, maxDf = 200)
        .orderBy("doc_id", "run_start"),
      Some("""WITH w AS (SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents),
        |p0 AS (SELECT doc_id, ws,
        |    unnest(generate_series(1, len(ws) - 14)) AS pos
        |  FROM w WHERE len(ws) >= 15),
        |p AS (SELECT doc_id, pos,
        |    ('0x' || substring(md5('0#' ||
        |      array_to_string(ws[pos:pos+14], ' ')), 1, 15))::BIGINT AS h
        |  FROM p0),
        |shared AS (SELECT h FROM p GROUP BY h
        |  HAVING count(*) <= 200 AND count(DISTINCT doc_id) >= 2),
        |d AS (SELECT doc_id, pos FROM p JOIN shared USING (h)),
        |r AS (SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM d)
        |SELECT doc_id, CAST(min(pos) AS INTEGER) AS run_start,
        |  CAST(count(*) AS INTEGER) AS n_windows,
        |  CAST(max(pos) - min(pos) + 15 AS INTEGER) AS span_tokens
        |FROM r GROUP BY doc_id, grp ORDER BY doc_id, run_start""".stripMargin),
      "substring-level dedup: maximal cross-document duplicated token-window runs"),

    // q78 — the substring-dedup LAST MILE: the CLEANED corpus. q73
    // detects duplicated spans; this removes them — every token covered
    // by a non-canonical duplicated window (canonical = min (doc_id,
    // pos) per window hash, the q68 min-representative rule) is spliced
    // out, so exactly one copy of each duplicated span survives. Same
    // w=15 / maxDf=200 contract as q73, replayed in the oracle
    // (canonical selection included — via the identical doc_id·2²⁶+pos
    // packing arithmetic).
    Q("q78_substring_clean",
      (s, d) => Dedup.substringClean(Tables(s, d, "documents"),
          col("doc_id"), col("text"), w = 15, maxDf = 200)
        .orderBy("doc_id"),
      Some("""WITH w AS (SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents),
        |p0 AS (SELECT doc_id, ws,
        |    unnest(generate_series(1, len(ws) - 14)) AS pos
        |  FROM w WHERE len(ws) >= 15),
        |p AS (SELECT doc_id, pos,
        |    ('0x' || substring(md5('0#' ||
        |      array_to_string(ws[pos:pos+14], ' ')), 1, 15))::BIGINT AS h
        |  FROM p0),
        |dup AS (SELECT h FROM p GROUP BY h
        |  HAVING count(*) <= 200 AND count(DISTINCT doc_id) >= 2),
        |occ AS (SELECT p.doc_id, p.pos, p.h FROM p JOIN dup USING (h)),
        |canon AS (SELECT h, min(doc_id * 67108864 + pos) AS cdp
        |  FROM occ GROUP BY h),
        |marked AS (SELECT o.doc_id, o.pos FROM occ o JOIN canon c ON o.h = c.h
        |  WHERE o.doc_id * 67108864 + o.pos <> c.cdp),
        |b AS (SELECT doc_id, pos,
        |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
        |           THEN 1
        |         WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 15
        |           THEN 1 ELSE 0 END AS brk
        |  FROM marked),
        |g AS (SELECT doc_id, pos,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM b),
        |ranges AS (SELECT doc_id, min(pos) AS lo, max(pos) + 14 AS hi
        |  FROM g GROUP BY doc_id, grp),
        |tok AS (SELECT doc_id, ws,
        |    unnest(generate_series(1, len(ws))) AS tp FROM w),
        |keep AS (SELECT t.doc_id, t.tp, t.ws[t.tp] AS tokn FROM tok t
        |  WHERE NOT EXISTS (SELECT 1 FROM ranges r
        |    WHERE r.doc_id = t.doc_id AND t.tp BETWEEN r.lo AND r.hi))
        |SELECT w.doc_id, CAST(len(w.ws) AS INTEGER) AS n_tokens,
        |  CAST(len(w.ws) - count(k.tp) AS INTEGER) AS n_removed,
        |  coalesce(string_agg(k.tokn, ' ' ORDER BY k.tp), '') AS clean_text
        |FROM w LEFT JOIN keep k USING (doc_id)
        |GROUP BY w.doc_id, len(w.ws)
        |ORDER BY w.doc_id""".stripMargin),
      "substring-dedup removal: cleaned corpus with one canonical copy of every duplicated span"),

    // q90 — SemDeDup-style SEMANTIC dedup (cluster-then-prune): every
    // vector is assigned to its nearest label-centroid (the IVF
    // build/assign machinery — 6dp centroids, 4dp-rounded-cosine argmax,
    // min-label ties), then any vector whose cosine to a LOWER-id member
    // of the SAME cluster reaches 0.4 is marked a semantic duplicate
    // (min-representative rule, q68). Pairing happens only inside
    // clusters — Σ|cluster|² instead of n² — which is the published
    // algorithm's entire cost model; in-cluster candidate lists ride the
    // hard-capped BoundedLongList (cap 4000 = the recall contract,
    // replayed by the oracle's HAVING).
    Q("q90_semdedup",
      (s, d) => Dedup.semDedup(Tables(s, d, "embeddings"),
        col("vec_id"), col("embedding"), col("label"),
        thr = 0.4, maxBucket = 4000),
      Some("""WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v, label AS lbl FROM embeddings
        |  WHERE list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) > 0),
        |c AS (SELECT lbl, t.dim, round(avg(v[t.dim]), 6) AS cd
        |  FROM e, generate_series(1, 64) AS t(dim) GROUP BY lbl, t.dim),
        |cw AS (SELECT lbl AS c_lbl, list(cd ORDER BY dim) AS cv FROM c GROUP BY lbl),
        |a AS (SELECT vec_id, v, c_lbl AS bucket,
        |    round(list_cosine_similarity(v, cv), 4) AS sim
        |  FROM e, cw
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_lbl) = 1),
        |ok AS (SELECT bucket FROM a GROUP BY bucket HAVING count(*) <= 4000),
        |p AS (SELECT y.vec_id AS ib
        |  FROM a x JOIN a y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
        |  JOIN ok ON x.bucket = ok.bucket
        |  WHERE round(list_cosine_similarity(x.v, y.v), 4) >= 0.4),
        |dr AS (SELECT DISTINCT ib FROM p)
        |SELECT a.vec_id, a.bucket, (dr.ib IS NULL) AS kept
        |FROM a LEFT JOIN dr ON a.vec_id = dr.ib
        |ORDER BY a.vec_id""".stripMargin),
      "SemDeDup semantic dedup: nearest-centroid clustering + in-cluster cosine prune"),

    // q107 — near-dup prune with a QUALITY representative: q68 keeps
    // each cluster's min doc_id; a real curation pipeline keeps its
    // BEST member — here the longest (n_chars desc, doc_id tiebreak),
    // the "prefer the most complete copy" heuristic. Same candidate
    // chain + connected components as q37/q68; the representative
    // choice runs on the TopKPerKey node (≤1 row per (cluster,
    // partition) reaches the exchange).
    Q("q107_neardup_prune_quality",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val clusters = Dedup.dupClusters(
          Dedup.minhashLsh(docs, col("doc_id"), col("text"),
            n = 3, numPerm = 16, bands = 4, thr = 0.5, maxBucket = 100))
        val withLen = clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
        val reps = graft.plans.TopK.perKey(withLen, Seq("cluster_id"),
            "n_chars", desc = true, tiebreak = Seq("doc_id"), k = 1)
          .select(col("doc_id"), lit(true).as("rep"))
        val drop = clusters.join(reps, Seq("doc_id"), "left_anti")
          .select("doc_id")
        docs.join(drop, Seq("doc_id"), "left_anti")
          .select("doc_id", "n_chars").orderBy("doc_id")
      },
      Some(s"""${gramCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
        |$minhashCtes,
        |pairs AS (
        |  SELECT doc_a, doc_b FROM j
        |  WHERE round(shared / (na + nb - shared), 4) >= 0.5),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION
        |  SELECT doc_b, doc_a FROM pairs),
        |cc AS (
        |  SELECT src AS id, src AS label FROM edges
        |  UNION
        |  SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.id = e.src),
        |cl AS (SELECT id AS doc_id, min(label) AS cluster_id
        |  FROM cc GROUP BY id),
        |wl AS (SELECT cl.doc_id, cl.cluster_id, d2.n_chars
        |  FROM cl JOIN documents d2 USING (doc_id)),
        |reps AS (SELECT doc_id FROM wl
        |  QUALIFY row_number() OVER (PARTITION BY cluster_id
        |    ORDER BY n_chars DESC, doc_id) = 1),
        |dr AS (SELECT doc_id FROM cl ANTI JOIN reps USING (doc_id))
        |SELECT doc_id, n_chars FROM documents ANTI JOIN dr USING (doc_id)
        |ORDER BY doc_id""".stripMargin),
      "near-dup prune keeping each cluster's longest member (quality representative)"),

    // q108 — BLOOM-PREFILTERED incremental dedup: the nightly "which
    // batch rows are new?" anti-join against a persisted history,
    // routed through a broadcast Bloom sketch of the history keys —
    // sketch-rejected rows are definitely new (no false negatives) and
    // skip the join entirely; only might-contain candidates pay the
    // exact verify. Semantics == the plain anti-join (the oracle), the
    // sketch only routes rows. History = every 3rd document's text;
    // note duplicate texts drop NON-history docs too — exactly what
    // the anti-join contract says.
    Q("q108_bloom_incremental_dedup",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val history = docs.filter(col("doc_id") % 3 === 0).select(col("text"))
        graft.operators.BloomPrefilter.antiJoin(
            docs.select("doc_id", "text", "n_chars"), col("text"),
            history, col("text"), expectedItems = 10000L, fpp = 0.03)
          .select("doc_id", "n_chars").orderBy("doc_id")
      },
      Some("""SELECT doc_id, n_chars FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM documents h
        |  WHERE h.doc_id % 3 = 0 AND h.text = d.text)
        |ORDER BY doc_id""".stripMargin),
      "bloom-prefiltered incremental dedup: sketch-routed exact anti-join vs history"),

    // q117 — edit-distance verification of LSH candidates: the q24
    // MinHash candidate generator (thr=0 — every surviving bucket pair)
    // re-scored at the CHARACTER level with levenshtein over 120-char
    // prefixes, in exact integer basis points. Shingle Jaccard and edit
    // similarity disagree exactly where token-identical documents
    // diverge in characters — emitting both is the audit. The prefix
    // cap is the documented O(len²)-per-pair scale guard; both engines'
    // levenshtein is the unit-cost DP (identical integers).
    Q("q117_editdist_verify",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val cand = Dedup.minhashLsh(docs, col("doc_id"), col("text"),
          n = 3, numPerm = 16, bands = 4, thr = 0.0, maxBucket = 100)
        Dedup.editSimilarity(docs, col("doc_id"), col("text"), cand, 120)
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""$gramCtes,
        |$minhashCtes,
        |pairs AS (SELECT doc_a, doc_b,
        |    round(shared / (na + nb - shared), 4) AS jaccard FROM j),
        |p AS (SELECT doc_id, substring(text, 1, 120) AS pre FROM documents)
        |SELECT doc_a, doc_b, jaccard,
        |  CAST(levenshtein(a.pre, b.pre) AS BIGINT) AS edit_dist,
        |  CAST(10000 - (2 * levenshtein(a.pre, b.pre) * 10000
        |      + greatest(len(a.pre), len(b.pre)))
        |    // (2 * greatest(len(a.pre), len(b.pre))) AS BIGINT) AS edit_sim_bp
        |FROM pairs JOIN p a ON doc_a = a.doc_id JOIN p b ON doc_b = b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin),
      "LSH candidates re-verified by exact-integer levenshtein similarity (120-char prefix)"),

    // q125 — GRAM NOVELTY (marginal-contribution curation signal): for
    // each document, the fraction of its distinct 3-grams whose FIRST
    // corpus occurrence (min doc_id) is this document — "how much new
    // content does this doc add to everything before it". Boilerplate
    // scores near 0, fresh content near 10000bp; the greedy
    // de-duplicated-corpus-value measure, per-doc and exact-integer.
    //
    // Scale shape: one gram-keyed shuffle builds the first-seer table;
    // the novelty join re-uses the same gram partitioning (join key ==
    // agg key, no extra exchange under AQE); the per-doc rollup is one
    // map-side-combined agg. No pair joins anywhere — novelty is a
    // gram-level property, cheaper than any pairwise dedup.
    Q("q125_gram_novelty",
      (s, d) => Dedup.gramNovelty(Tables(s, d, "documents"),
          col("doc_id"), col("text"), 3)
        .orderBy("doc_id"),
      Some(s"""$gramCtes,
        |g AS (SELECT doc_id, unnest(grams) AS gram FROM d),
        |f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_novel,
        |  CAST((2 * sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
        |      * 10000 + count(*)) // (2 * count(*)) AS BIGINT) AS novelty_bp
        |FROM g JOIN f USING (gram)
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin),
      "per-doc 3-gram novelty vs all earlier docs (first-seer join, exact basis points)"),

    // q135 — INCREMENTAL novelty vs a FROZEN history: the nightly-batch
    // variant of q125 — each new document scored by the fraction of its
    // distinct 3-grams absent from the history corpus (doc_id % 3 == 0).
    // Deliberately the shuffle-join sibling of q58's broadcast
    // decontamination: a history gram universe at corpus scale cannot
    // broadcast, so the membership probe is a gram-keyed LEFT join
    // against the deduped history gram table — same partitioning as the
    // batch gram explode, one exchange each side. (At 100 TB the q108
    // Bloom prefilter composes in front to skip definitely-new grams.)
    Q("q135_incremental_novelty",
      (s, d) => {
        import graft.functions.IntMath
        val docs = Tables(s, d, "documents")
        val grams = graft.functions.TextFunctions.distinctGrams(col("text"), 3)
        val batchG = docs.filter(col("doc_id") % 3 =!= 0)
          .select(col("doc_id"), explode(grams).as("gram"))
        val histG = docs.filter(col("doc_id") % 3 === 0)
          .select(explode(grams).as("gram")).distinct()
          .withColumn("seen", lit(1))
        batchG.join(histG, Seq("gram"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_new"))
          .select(col("doc_id"), col("n_grams"), col("n_new"),
            IntMath.bp(col("n_new"), col("n_grams")).as("novelty_bp"))
          .orderBy("doc_id")
      },
      Some(s"""$gramCtes,
        |bg AS (SELECT doc_id, unnest(grams) AS gram FROM d WHERE doc_id % 3 <> 0),
        |hg AS (SELECT DISTINCT unnest(grams) AS gram FROM d WHERE doc_id % 3 = 0)
        |SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN hg.gram IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new,
        |  CAST((2 * sum(CASE WHEN hg.gram IS NULL THEN 1 ELSE 0 END) * 10000
        |    + count(*)) // (2 * count(*)) AS BIGINT) AS novelty_bp
        |FROM bg LEFT JOIN hg ON bg.gram = hg.gram
        |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin),
      "incremental batch novelty vs frozen history grams (shuffle membership probe)"),

    // q139 — CROSS-SOURCE OVERLAP matrix: which source pairs share the
    // most distinct 3-grams — the provenance diagnostic run before
    // mixing sources (two crawls of the same sites will light up here
    // long before doc-level dedup fires). The source set per gram is
    // bounded by the source CARDINALITY (20), so the pair explode is
    // <= C(|sources|,2) per gram — never corpus-quadratic; the oracle
    // replays via a gram self-join, the formulation this one replaces.
    Q("q139_source_overlap",
      (s, d) => {
        val g = Tables(s, d, "documents")
          .select(col("source"),
            explode(graft.functions.TextFunctions
              .distinctGrams(col("text"), 3)).as("gram"))
          .distinct()
        val ss = g.groupBy("gram").agg(collect_set("source").as("ss"))
          .filter(size(col("ss")) > 1)
        ss.select(explode(col("ss")).as("s_a"), col("ss"))
          .select(col("s_a"), explode(col("ss")).as("s_b"))
          .filter(col("s_a") < col("s_b"))
          .groupBy("s_a", "s_b")
          .agg(count(lit(1)).as("n_shared_grams"))
          .orderBy(col("n_shared_grams").desc, col("s_a"), col("s_b"))
          .limit(20)
      },
      Some(s"""$gramCtes,
        |gs AS (SELECT DISTINCT dd.source, g.gram
        |  FROM (SELECT doc_id, unnest(grams) AS gram FROM d) g
        |  JOIN documents dd ON g.doc_id = dd.doc_id)
        |SELECT a.source AS s_a, b.source AS s_b, count(*) AS n_shared_grams
        |FROM gs a JOIN gs b ON a.gram = b.gram AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY n_shared_grams DESC, s_a, s_b LIMIT 20""".stripMargin),
      "source-pair shared-gram overlap matrix (bounded source-set explode, no self-join)"),

    // q167 — DEDUP THRESHOLD sensitivity: how many candidate pairs the
    // q24 MinHash machinery verifies at Jaccard >= 0.3 / 0.5 / 0.7 /
    // 0.9, from ONE candidate generation pass — the parameter-sweep
    // report that decides the production threshold (too low = real
    // content merged, too high = boilerplate survives). The exact
    // verify runs once; the sweep is four filters over its output.
    Q("q167_dedup_threshold_sweep",
      (s, d) => {
        val pairs = Dedup.minhashLsh(Tables(s, d, "documents"),
          col("doc_id"), col("text"), n = 3, numPerm = 16, bands = 4,
          thr = 0.0, maxBucket = 100)
        val thrs = Seq(3000, 5000, 7000, 9000)
        pairs.select(explode(array(thrs.map(t =>
            struct(lit(t).as("thr_bp"),
              when(col("jaccard") * 10000 >= t, 1L).otherwise(0L)
                .as("hit"))): _*)).as("x"))
          .groupBy(col("x.thr_bp").as("thr_bp"))
          .agg(sum(col("x.hit")).as("n_pairs"))
          .orderBy("thr_bp")
      },
      Some(s"""$gramCtes,
        |$minhashCtes,
        |pairs AS (SELECT round(shared / (na + nb - shared), 4) AS jaccard
        |  FROM j)
        |SELECT t.thr_bp, CAST(sum(CASE WHEN jaccard * 10000 >= t.thr_bp
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs
        |FROM pairs, (VALUES (3000), (5000), (7000), (9000)) AS t(thr_bp)
        |GROUP BY t.thr_bp ORDER BY t.thr_bp""".stripMargin),
      "MinHash dedup threshold sweep: verified pair counts at 4 Jaccard cutoffs, one pass"),

    // q168 — NORMALIZATION IDEMPOTENCE audit: normText applied twice
    // must equal normText applied once, corpus-wide — the
    // property-as-a-query that catches a non-idempotent cleaning rule
    // (the classic "trim after collapse re-exposes whitespace" bug
    // class) in production, where a unit test only covers its fixture.
    // 1-row output: total, violations (0), all_idempotent.
    Q("q168_norm_idempotence",
      (s, d) => {
        import graft.functions.TextFunctions.normText
        Tables(s, d, "documents")
          .select((normText(col("text")) =!=
            normText(normText(col("text")))).cast("long").as("viol"))
          .agg(count(lit(1)).as("n_docs"), sum("viol").as("n_violations"))
          .select(col("n_docs"), col("n_violations"),
            (col("n_violations") === 0).as("all_idempotent"))
      },
      Some("""WITH n1 AS (SELECT
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS a
        |  FROM documents),
        |n2 AS (SELECT a,
        |    regexp_replace(lower(trim(a)), '\s+', ' ', 'g') AS b FROM n1)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN a <> b THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violations,
        |  sum(CASE WHEN a <> b THEN 1 ELSE 0 END) = 0 AS all_idempotent
        |FROM n2""".stripMargin),
      "corpus-wide idempotence proof of the normalization chain (property as a query)"),

    // q174 — PREFIX-FILTERED set-similarity join (PPJoin/AllPairs
    // candidate strategy) over 3-gram sets: q23's Jaccard join with
    // the DF cap REMOVED — only each doc's rare-gram PREFIX under the
    // global df order is indexed (hot boilerplate grams sort last and
    // prune themselves), candidates verified by exact Jaccard over the
    // full gram sets. The oracle is the direct CAP-FREE all-pairs
    // exact Jaccard at the threshold: equality proves the prefix
    // filter dropped nothing — the lossless counterpart to q23's
    // accepted cap distortion. maxPost is set above the corpus doc
    // count, i.e. provably slack — pure lossless mode.
    Q("q174_prefix_jaccard",
      (s, d) => Dedup.prefixJaccard(Tables(s, d, "documents"),
          col("doc_id"), col("text"), n = 3, thr = 0.6, maxPost = 1000000)
        .orderBy("doc_a", "doc_b"),
      Some(s"""$gramCtes,
        |g AS (SELECT doc_id, unnest(grams) AS gram FROM d),
        |sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    count(*) AS shared
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, sa.n AS n_a, sb.n AS n_b,
        |  CAST(shared AS BIGINT) AS shared,
        |  round(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared), 4)
        |    AS jaccard
        |FROM p JOIN sz sa ON doc_a = sa.doc_id
        |       JOIN sz sb ON doc_b = sb.doc_id
        |WHERE round(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared), 4)
        |  >= 0.6
        |ORDER BY doc_a, doc_b""".stripMargin),
      "prefix-filtered gram-set similarity join: lossless PPJoin-style candidates (q23 without the cap)"),

    // q176 — LEAKAGE-FREE train/val/test split: q106's frozen hash
    // gate keyed on the near-dup CLUSTER ROOT (q37's components), so a
    // paraphrase of a test document cannot hide in train — the eval-
    // contamination guard every benchmark-bearing corpus needs. The
    // output is the per-split census PLUS the audit the invariant
    // implies: n_leaky_pairs (near-dup pairs straddling two splits)
    // MUST be zero, and the oracle re-derives clusters, gates, and the
    // audit independently — both engines must agree it is.
    Q("q176_leakage_free_split",
      (s, d) => {
        import graft.operators.Curation
        val docs = Tables(s, d, "documents")
        val pairs = Dedup.minhashLsh(docs, col("doc_id"), col("text"),
          n = 3, numPerm = 16, bands = 4, thr = 0.5, maxBucket = 100)
        val clusters = Dedup.dupClusters(pairs)
        val split = Curation.leakageFreeSplit(docs.select(col("doc_id")),
          col("doc_id"), clusters.select(col("doc_id"), col("cluster_id")),
          trainPerMille = 800, valPerMille = 100, seed = 7)
        val leaks = pairs
          .join(split.select(col("doc_id").as("doc_a"), col("split").as("sa")),
            "doc_a")
          .join(split.select(col("doc_id").as("doc_b"), col("split").as("sb")),
            "doc_b")
          .agg(count(lit(1)).as("n_dup_pairs"),
            sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L))
              .as("n_leaky_pairs"))
        split.groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            count(col("cluster_id")).as("n_clustered_docs"))
          .crossJoin(broadcast(leaks))
          .select(col("split"), col("n_docs"), col("n_clustered_docs"),
            col("n_dup_pairs"), col("n_leaky_pairs"))
          .orderBy("split")
      },
      Some(s"""${gramCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
        |$minhashCtes,
        |pairs AS (
        |  SELECT doc_a, doc_b FROM j
        |  WHERE round(shared / (na + nb - shared), 4) >= 0.5),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION
        |  SELECT doc_b, doc_a FROM pairs),
        |cc AS (
        |  SELECT src AS id, src AS label FROM edges
        |  UNION
        |  SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.id = e.src),
        |cl AS (SELECT id AS doc_id, min(label) AS cluster_id
        |  FROM cc GROUP BY id),
        |sp AS (SELECT dd.doc_id, cl.cluster_id,
        |    ('0x' || substring(md5('7#' ||
        |      CAST(coalesce(cl.cluster_id, dd.doc_id) AS VARCHAR)), 1, 15))::BIGINT
        |      % 1000 AS gate
        |  FROM documents dd LEFT JOIN cl USING (doc_id)),
        |sp2 AS (SELECT doc_id, cluster_id,
        |    CASE WHEN gate < 800 THEN 'train'
        |         WHEN gate < 900 THEN 'val' ELSE 'test' END AS split
        |  FROM sp),
        |leaks AS (SELECT CAST(count(*) AS BIGINT) AS n_dup_pairs,
        |    CAST(sum(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_leaky_pairs
        |  FROM pairs JOIN sp2 a ON pairs.doc_a = a.doc_id
        |             JOIN sp2 b ON pairs.doc_b = b.doc_id)
        |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(cluster_id) AS BIGINT) AS n_clustered_docs,
        |  n_dup_pairs, n_leaky_pairs
        |FROM sp2, leaks
        |GROUP BY split, n_dup_pairs, n_leaky_pairs ORDER BY split""".stripMargin),
      "leakage-free split: hash gate on near-dup cluster roots, zero-straddle audit oracle-proven"),

    // q182 — TF-IDF-WEIGHTED gram cosine join: the weighted sibling of
    // q23's set-Jaccard — pairs scored by the cosine of their tf·idf
    // 3-gram vectors over the MID-FREQUENCY BAND (2 ≤ df ≤ 20; hot
    // grams carry zero weight BY CONTRACT — they are the low-idf
    // boilerplate the weighting discounts anyway, and banding is what
    // lets the dot product stream straight off bounded posting lists in
    // one gram-keyed shuffle, PPJoin-style, instead of rejoining
    // candidates to corpus-sized vector tables). Exact integral program
    // on both engines: integer idf (100·(N+1)) div (df+1), squared
    // cosine in basis points via DECIMAL(38,0) / HUGEINT — sqrt traded
    // away like every no-libm score here.
    Q("q182_tfidf_cosine_join",
      (s, d) => graft.operators.Retrieval.tfidfGramCosineJoin(
          Tables(s, d, "documents"), col("doc_id"), col("text"),
          n = 3, maxDf = 20, minBp = 2500L)
        .orderBy("doc_a", "doc_b"),
      Some("""WITH w AS (SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |      ' ') AS ws
        |  FROM documents),
        |g AS (SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws) - 2),
        |      i -> array_to_string(ws[i:i+2], ' '))) AS gram
        |  FROM w WHERE len(ws) >= 3),
        |tf AS (SELECT doc_id, gram, count(*) AS tf FROM g GROUP BY 1, 2),
        |dfq AS (SELECT gram, count(*) AS df FROM tf GROUP BY 1
        |  HAVING count(*) BETWEEN 2 AND 20),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |tfk AS (SELECT tf.doc_id, tf.gram,
        |    CAST(tf.tf * ((100 * (nd.n_docs + 1)) // (dfq.df + 1))
        |      AS HUGEINT) AS w
        |  FROM tf JOIN dfq USING (gram), nd),
        |norms AS (SELECT doc_id, sum(w * w) AS n2 FROM tfk GROUP BY 1),
        |dt AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    sum(a.w * b.w) AS dot
        |  FROM tfk a JOIN tfk b
        |    ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |sc AS (SELECT dt.doc_a, dt.doc_b,
        |    CAST((dt.dot * dt.dot) // ((na.n2 * nb.n2) // 10000)
        |      AS BIGINT) AS cos2_bp
        |  FROM dt JOIN norms na ON na.doc_id = dt.doc_a
        |          JOIN norms nb ON nb.doc_id = dt.doc_b)
        |SELECT doc_a, doc_b, cos2_bp FROM sc WHERE cos2_bp >= 2500
        |ORDER BY doc_a, doc_b""".stripMargin),
      "banded tf-idf gram cosine join — one-shuffle PPJoin-style pair emission, integer-exact"),

    // q187 — SORTED-NEIGHBORHOOD dedup (SNM): the third classic
    // blocking family next to LSH (q24) and posting lists (q23) — sort
    // within 2-char blocks by a 24-char normalized-prefix key, pair
    // each doc with its next 5 neighbors in sort order (declarative:
    // probe-rank explode + ONE (block, rank) equi-join, no window
    // self-join), verify with exact distinct-gram Jaccard in bp.
    // Catches prefix-sharing near-dups (mirrored/versioned docs) that
    // gram banding drowns in candidates for.
    Q("q187_sorted_neighborhood",
      (s, d) => graft.operators.Dedup.sortedNeighborhoodPairs(
          Tables(s, d, "documents"), col("doc_id"), col("text"),
          n = 3, keyLen = 24, blockLen = 2, win = 6, minBp = 2000L)
        .orderBy("doc_a", "doc_b"),
      Some("""WITH b AS (SELECT doc_id,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |      ' ') AS ws
        |  FROM documents
        |  WHERE regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
        |    IS NOT NULL
        |    AND length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |      > 0),
        |rk AS (SELECT doc_id, substring(t, 1, 2) AS blk,
        |    row_number() OVER (PARTITION BY substring(t, 1, 2)
        |      ORDER BY substring(t, 1, 24), doc_id) AS rn
        |  FROM b),
        |pr AS (SELECT blk, doc_id AS id_a,
        |    unnest(generate_series(rn + 1, rn + 5)) AS rn2
        |  FROM rk),
        |pairs AS (SELECT least(pr.id_a, rk.doc_id) AS doc_a,
        |    greatest(pr.id_a, rk.doc_id) AS doc_b
        |  FROM pr JOIN rk ON rk.blk = pr.blk AND rk.rn = pr.rn2),
        |g0 AS (SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws) - 2),
        |      i -> array_to_string(ws[i:i+2], ' '))) AS gram
        |  FROM b WHERE len(ws) >= 3),
        |g AS (SELECT DISTINCT doc_id, gram FROM g0),
        |gc AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY 1),
        |sh AS (SELECT p.doc_a, p.doc_b, count(*) AS shared
        |  FROM pairs p JOIN g ga ON ga.doc_id = p.doc_a
        |               JOIN g gb ON gb.doc_id = p.doc_b
        |                 AND gb.gram = ga.gram
        |  GROUP BY 1, 2),
        |j AS (SELECT sh.doc_a, sh.doc_b, sh.shared,
        |    (10000 * sh.shared) // (ca.ng + cb.ng - sh.shared) AS jacc_bp
        |  FROM sh JOIN gc ca ON ca.doc_id = sh.doc_a
        |          JOIN gc cb ON cb.doc_id = sh.doc_b)
        |SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared,
        |  CAST(jacc_bp AS BIGINT) AS jacc_bp
        |FROM j WHERE jacc_bp >= 2000 ORDER BY doc_a, doc_b""".stripMargin),
      "sorted-neighborhood blocking + exact gram-Jaccard verify, window-free pairing"),

    // q227 — ENTITY-RESOLUTION pipeline with lineage accounting: the
    // full ER staircase composed from the tested blocks — q187's
    // sorted-neighborhood blocking + gram-Jaccard verify feeds q37's
    // connected components, and the output is the stage-count summary a
    // production merge job publishes (the q62/q140 lineage discipline):
    // corpus size, verified match pairs, matched records, entity
    // clusters, and survivors after keeping one canonical record per
    // cluster. Every count is a 1-row agg crossJoined broadcast-style;
    // the heavy lifting is the (already scale-shaped) blocking pass and
    // the bounded-driver/Pregel CC.
    Q("q227_er_pipeline",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val matches = Dedup.sortedNeighborhoodPairs(docs,
          col("doc_id"), col("text"),
          n = 3, keyLen = 24, blockLen = 2, win = 6, minBp = 2000L).cache()
        val clusters = Dedup.dupClusters(matches)
        val nDocs = docs.agg(count(lit(1)).as("n_docs"))
        val nPairs = matches.agg(count(lit(1)).as("n_match_pairs"))
        val cl = clusters.agg(
          countDistinct("cluster_id").as("n_clusters"),
          count(lit(1)).as("n_matched_docs"))
        nDocs.crossJoin(nPairs).crossJoin(cl)
          .select(col("n_docs"), col("n_match_pairs"),
            col("n_matched_docs"), col("n_clusters"),
            (col("n_docs") - (col("n_matched_docs") - col("n_clusters")))
              .as("n_survivors"))
      },
      Some("""WITH RECURSIVE b AS (SELECT doc_id,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |      ' ') AS ws
        |  FROM documents
        |  WHERE regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
        |    IS NOT NULL
        |    AND length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |      > 0),
        |rk AS (SELECT doc_id, substring(t, 1, 2) AS blk,
        |    row_number() OVER (PARTITION BY substring(t, 1, 2)
        |      ORDER BY substring(t, 1, 24), doc_id) AS rn
        |  FROM b),
        |pr AS (SELECT blk, doc_id AS id_a,
        |    unnest(generate_series(rn + 1, rn + 5)) AS rn2
        |  FROM rk),
        |pairs AS (SELECT least(pr.id_a, rk.doc_id) AS doc_a,
        |    greatest(pr.id_a, rk.doc_id) AS doc_b
        |  FROM pr JOIN rk ON rk.blk = pr.blk AND rk.rn = pr.rn2),
        |g0 AS (SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws) - 2),
        |      i -> array_to_string(ws[i:i+2], ' '))) AS gram
        |  FROM b WHERE len(ws) >= 3),
        |g AS (SELECT DISTINCT doc_id, gram FROM g0),
        |gc AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY 1),
        |sh AS (SELECT p.doc_a, p.doc_b, count(*) AS shared
        |  FROM pairs p JOIN g ga ON ga.doc_id = p.doc_a
        |               JOIN g gb ON gb.doc_id = p.doc_b
        |                 AND gb.gram = ga.gram
        |  GROUP BY 1, 2),
        |m AS (SELECT sh.doc_a, sh.doc_b
        |  FROM sh JOIN gc ca ON ca.doc_id = sh.doc_a
        |          JOIN gc cb ON cb.doc_id = sh.doc_b
        |  WHERE (10000 * sh.shared) // (ca.ng + cb.ng - sh.shared) >= 2000),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM m
        |  UNION SELECT doc_b, doc_a FROM m),
        |cc AS (SELECT src AS id, src AS label FROM edges
        |  UNION SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.id = e.src),
        |lab AS (SELECT id, min(label) AS lbl FROM cc GROUP BY id),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |np AS (SELECT CAST(count(*) AS BIGINT) AS n_match_pairs FROM m),
        |ncl AS (SELECT CAST(count(DISTINCT lbl) AS BIGINT) AS n_clusters,
        |    CAST(count(*) AS BIGINT) AS n_matched_docs FROM lab)
        |SELECT nd.n_docs, np.n_match_pairs, ncl.n_matched_docs,
        |  ncl.n_clusters,
        |  nd.n_docs - (ncl.n_matched_docs - ncl.n_clusters) AS n_survivors
        |FROM nd, np, ncl""".stripMargin),
      "entity-resolution pipeline lineage: blocking -> verify -> components -> survivors"),

    // q231 — WEIGHTED (multiset) Jaccard refine: q187's set-Jaccard
    // survivors re-scored with term frequencies — Σmin/Σmax
    // distinguishes a doc repeating a shared phrase from one using it
    // once, and Σmax never materializes the union (Ta + Tb − Σmin).
    // Same posting-join shape as the set verify, tf payloads, exact bp.
    Q("q231_weighted_jaccard",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val pairs = Dedup.sortedNeighborhoodPairs(docs,
          col("doc_id"), col("text"),
          n = 3, keyLen = 24, blockLen = 2, win = 6, minBp = 2000L)
        Dedup.weightedJaccardPairs(pairs, docs,
            col("doc_id"), col("text"), n = 3)
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH b AS (SELECT doc_id,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |      ' ') AS ws
        |  FROM documents
        |  WHERE regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
        |    IS NOT NULL
        |    AND length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |      > 0),
        |rk AS (SELECT doc_id, substring(t, 1, 2) AS blk,
        |    row_number() OVER (PARTITION BY substring(t, 1, 2)
        |      ORDER BY substring(t, 1, 24), doc_id) AS rn
        |  FROM b),
        |pr AS (SELECT blk, doc_id AS id_a,
        |    unnest(generate_series(rn + 1, rn + 5)) AS rn2
        |  FROM rk),
        |pairs AS (SELECT least(pr.id_a, rk.doc_id) AS doc_a,
        |    greatest(pr.id_a, rk.doc_id) AS doc_b
        |  FROM pr JOIN rk ON rk.blk = pr.blk AND rk.rn = pr.rn2),
        |g0 AS (SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws) - 2),
        |      i -> array_to_string(ws[i:i+2], ' '))) AS gram
        |  FROM b WHERE len(ws) >= 3),
        |g AS (SELECT DISTINCT doc_id, gram FROM g0),
        |gc AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY 1),
        |sh AS (SELECT p.doc_a, p.doc_b, count(*) AS shared
        |  FROM pairs p JOIN g ga ON ga.doc_id = p.doc_a
        |               JOIN g gb ON gb.doc_id = p.doc_b
        |                 AND gb.gram = ga.gram
        |  GROUP BY 1, 2),
        |m AS (SELECT sh.doc_a, sh.doc_b
        |  FROM sh JOIN gc ca ON ca.doc_id = sh.doc_a
        |          JOIN gc cb ON cb.doc_id = sh.doc_b
        |  WHERE (10000 * sh.shared) // (ca.ng + cb.ng - sh.shared) >= 2000),
        |tfq AS (SELECT doc_id, gram, count(*) AS tf FROM g0 GROUP BY 1, 2),
        |tq AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS t
        |  FROM tfq GROUP BY 1),
        |sm AS (SELECT m.doc_a, m.doc_b,
        |    CAST(sum(least(a.tf, bb.tf)) AS BIGINT) AS smin
        |  FROM m JOIN tfq a ON a.doc_id = m.doc_a
        |         JOIN tfq bb ON bb.doc_id = m.doc_b AND bb.gram = a.gram
        |  GROUP BY 1, 2)
        |SELECT m.doc_a, m.doc_b,
        |  CAST(coalesce(sm.smin, 0) AS BIGINT) AS smin,
        |  CAST((10000 * coalesce(sm.smin, 0)) //
        |    (ta.t + tb.t - coalesce(sm.smin, 0)) AS BIGINT) AS wjacc_bp
        |FROM m LEFT JOIN sm USING (doc_a, doc_b)
        |  JOIN tq ta ON ta.doc_id = m.doc_a
        |  JOIN tq tb ON tb.doc_id = m.doc_b
        |ORDER BY doc_a, doc_b""".stripMargin),
      "weighted multiset Jaccard refine — Σmin join over shared grams, union never materialized"),

    // q234 — CANONICAL-PER-CLUSTER selection: the keep-list q227's
    // lineage summary counts — each near-dup cluster keeps its longest
    // document (n_chars desc, doc_id tiebreak), the concrete keep/drop
    // decision a dedup pass publishes. One window over the
    // cluster-membership table (cluster-sized, tiny next to the corpus).
    Q("q234_cluster_canonical",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val matches = Dedup.sortedNeighborhoodPairs(docs,
          col("doc_id"), col("text"),
          n = 3, keyLen = 24, blockLen = 2, win = 6, minBp = 2000L)
        val clusters = Dedup.dupClusters(matches)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("cluster_id")
          .orderBy(col("n_chars").desc, col("doc_id"))
        clusters
          .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
          .withColumn("rn", row_number().over(w))
          .groupBy("cluster_id")
          .agg(count(lit(1)).cast("long").as("cluster_size"),
            max(when(col("rn") === 1, col("doc_id"))).cast("long")
              .as("canonical_doc"))
          .orderBy("cluster_id")
      },
      Some("""WITH RECURSIVE b AS (SELECT doc_id,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |      ' ') AS ws
        |  FROM documents
        |  WHERE regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
        |    IS NOT NULL
        |    AND length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |      > 0),
        |rk AS (SELECT doc_id, substring(t, 1, 2) AS blk,
        |    row_number() OVER (PARTITION BY substring(t, 1, 2)
        |      ORDER BY substring(t, 1, 24), doc_id) AS rn
        |  FROM b),
        |pr AS (SELECT blk, doc_id AS id_a,
        |    unnest(generate_series(rn + 1, rn + 5)) AS rn2
        |  FROM rk),
        |pairs AS (SELECT least(pr.id_a, rk.doc_id) AS doc_a,
        |    greatest(pr.id_a, rk.doc_id) AS doc_b
        |  FROM pr JOIN rk ON rk.blk = pr.blk AND rk.rn = pr.rn2),
        |g0 AS (SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws) - 2),
        |      i -> array_to_string(ws[i:i+2], ' '))) AS gram
        |  FROM b WHERE len(ws) >= 3),
        |g AS (SELECT DISTINCT doc_id, gram FROM g0),
        |gc AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY 1),
        |sh AS (SELECT p.doc_a, p.doc_b, count(*) AS shared
        |  FROM pairs p JOIN g ga ON ga.doc_id = p.doc_a
        |               JOIN g gb ON gb.doc_id = p.doc_b
        |                 AND gb.gram = ga.gram
        |  GROUP BY 1, 2),
        |m AS (SELECT sh.doc_a, sh.doc_b
        |  FROM sh JOIN gc ca ON ca.doc_id = sh.doc_a
        |          JOIN gc cb ON cb.doc_id = sh.doc_b
        |  WHERE (10000 * sh.shared) // (ca.ng + cb.ng - sh.shared) >= 2000),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM m
        |  UNION SELECT doc_b, doc_a FROM m),
        |cc AS (SELECT src AS id, src AS label FROM edges
        |  UNION SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.id = e.src),
        |lab AS (SELECT id AS doc_id, min(label) AS cluster_id
        |  FROM cc GROUP BY id),
        |jm AS (SELECT lab.cluster_id, lab.doc_id, d.n_chars,
        |    row_number() OVER (PARTITION BY lab.cluster_id
        |      ORDER BY d.n_chars DESC, lab.doc_id) AS rn
        |  FROM lab JOIN documents d USING (doc_id))
        |SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size,
        |  CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
        |    AS canonical_doc
        |FROM jm GROUP BY cluster_id ORDER BY cluster_id""".stripMargin),
      "canonical-per-cluster keep list — longest document wins, id tiebreak"),

    // q243 — CONTENT-DEFINED CHUNK dedup: Rabin-style rolling-hash cuts
    // (4-char base-31 window, boundary at hash ≡ 0 mod 64 → ~64-char
    // expected chunks) make chunk boundaries survive insertions, so
    // chunk-level exact dedup catches the shared tails a fixed-width
    // chunker (q51) loses after any edit. Top duplicated chunks across
    // documents — the cross-doc boilerplate CDC exists to find. Pure
    // per-row array codegen until the single chunk groupBy
    // (operators/Dedup.cdcChunks).
    Q("q243_cdc_chunk_dedup",
      (s, d) => graft.operators.Dedup.cdcChunks(
          Tables(s, d, "documents"), col("doc_id"), col("text"))
        .groupBy("chunk")
        .agg(countDistinct("doc_id").cast("long").as("n_docs"),
          count(lit(1)).cast("long").as("n_occ"))
        .withColumn("chunk_len", length(col("chunk")).cast("long"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("n_occ").desc, col("chunk"))
        .limit(15),
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS ln
        |  FROM documents WHERE text IS NOT NULL AND length(text) >= 4),
        |c AS (SELECT doc_id, text, ln,
        |    list_transform(list_filter(range(1, ln - 2),
        |      i -> (ord(text[i]) * 29791 + ord(text[i+1]) * 961 +
        |            ord(text[i+2]) * 31 + ord(text[i+3])) % 64 = 0),
        |      x -> x + 3) AS cuts
        |  FROM d),
        |z AS (SELECT doc_id, text,
        |    unnest(list_zip(list_prepend(0, cuts), list_append(cuts, ln)))
        |      AS seg
        |  FROM c),
        |ch AS (SELECT doc_id,
        |    substr(text, seg[1] + 1, seg[2] - seg[1]) AS chunk
        |  FROM z WHERE seg[2] > seg[1]),
        |agg AS (SELECT chunk,
        |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |    CAST(count(*) AS BIGINT) AS n_occ,
        |    CAST(length(chunk) AS BIGINT) AS chunk_len
        |  FROM ch WHERE length(chunk) >= 8 GROUP BY 1)
        |SELECT chunk, n_docs, n_occ, chunk_len FROM agg WHERE n_docs >= 2
        |ORDER BY n_docs DESC, n_occ DESC, chunk LIMIT 15""".stripMargin),
      "content-defined chunking dedup — rolling-hash cuts stable under edits, top shared chunks"),

    // q250 — LSH BANDING QUALITY scoreboard: recall/precision of q24's
    // candidate GENERATOR (pre-verify band collisions) against q23's
    // capped-exact ground truth (all pairs with Jaccard ≥ 0.5 over the
    // df-capped gram sets). The q249 audit discipline applied to
    // dedup: the banding's miss rate is measured and reported, never
    // assumed — this is the number that decides bands×rows at a new
    // corpus. Precision is naturally low (banding trades precision for
    // scan savings; the verify stage restores exactness) — reporting
    // it honestly is the point. Both pair sets full-outer-join on the
    // pair key; one aggregate; exact integer quotients over provably
    // nonzero denominators (q23/q24 are non-empty on this corpus).
    Q("q250_lsh_quality",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val truth = Dedup.ngramJaccard(docs, col("doc_id"), col("text"),
            n = 3, thr = 0.5, maxDf = 20)
          .select("doc_a", "doc_b").withColumn("tr", lit(1L))
        val cand = Dedup.lshCandidates(docs, col("doc_id"), col("text"),
            n = 3, numPerm = 16, bands = 4, maxBucket = 100)
          .withColumn("cd", lit(1L))
        truth.join(cand, Seq("doc_a", "doc_b"), "full_outer")
          .agg(sum(coalesce(col("tr"), lit(0L))).as("n_truth"),
            sum(coalesce(col("cd"), lit(0L))).as("n_cand"),
            sum(coalesce(col("tr"), lit(0L)) * coalesce(col("cd"), lit(0L)))
              .as("n_hit"))
          .select(col("n_truth"), col("n_cand"), col("n_hit"),
            expr("(n_hit * 10000) div n_truth").as("recall_bp"),
            expr("(n_hit * 10000) div n_cand").as("precision_bp"))
      },
      Some(s"""$gramCtes,
        |$minhashCtes,
        |candm AS MATERIALIZED (SELECT doc_a, doc_b FROM cand),
        |hot AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 20),
        |k AS (SELECT g.doc_id, g.gram FROM g ANTI JOIN hot USING (gram)),
        |sz AS (SELECT doc_id, count(*) AS n FROM k GROUP BY doc_id),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(count(*) AS DOUBLE) AS shared
        |  FROM k a JOIN k b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |tp AS MATERIALIZED (
        |  SELECT doc_a, doc_b
        |  FROM p JOIN sz sa ON doc_a = sa.doc_id
        |         JOIN sz sb ON doc_b = sb.doc_id
        |  WHERE round(shared / (sa.n + sb.n - shared), 4) >= 0.5),
        |sb AS (SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM tp) AS n_truth,
        |  (SELECT CAST(count(*) AS BIGINT) FROM candm) AS n_cand,
        |  (SELECT CAST(count(*) AS BIGINT) FROM tp
        |     JOIN candm USING (doc_a, doc_b)) AS n_hit)
        |SELECT n_truth, n_cand, n_hit,
        |  CAST((n_hit * 10000) // n_truth AS BIGINT) AS recall_bp,
        |  CAST((n_hit * 10000) // n_cand AS BIGINT) AS precision_bp
        |FROM sb""".stripMargin),
      "LSH banding recall/precision vs capped-exact Jaccard ground truth (one-row audit)"),

    // q251 — INCREMENTAL LSH index maintenance (the q246
    // batch-equivalence pattern applied to near-dup dedup): docs with
    // doc_id % 10 = 0 arrive as the delta; the maintained pair set =
    // stored base pairs pruned of retired buckets (bucket sizes merge
    // by ADDITION; crossing maxBucket retires the bucket's pairs,
    // exactly as the full recompute drops the now-degenerate bucket)
    // ∪ delta-probed pairs from merged under-cap buckets — per-doc
    // signature work lands on the DELTA ONLY. The oracle IS the full
    // q24 recompute with the status derived from membership: green
    // means the incremental algebra is exactly lossless (bucket sizes
    // only grow under insertion — the monotonicity that makes kept∪new
    // == full a theorem, DedupSpec drives the retirement branch).
    Q("q251_lsh_incremental",
      (s, d) => graft.operators.Dedup.minhashLshIncremental(
          Tables(s, d, "documents"), col("doc_id"), col("text"),
          isDelta = col("doc_id") % 10 === 0,
          n = 3, numPerm = 16, bands = 4, thr = 0.5, maxBucket = 100)
        .orderBy("doc_a", "doc_b"),
      Some(s"""$gramCtes,
        |$minhashCtes
        |SELECT doc_a, doc_b,
        |  round(shared / (na + nb - shared), 4) AS jaccard,
        |  CASE WHEN doc_a % 10 <> 0 AND doc_b % 10 <> 0
        |       THEN 'kept' ELSE 'new' END AS status
        |FROM j WHERE round(shared / (na + nb - shared), 4) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin),
      "incremental LSH maintenance — delta-only signatures + bucket-size merge, oracle-proven equal to the full recompute"),

    // q256 — incremental LSH index DELETES (right-to-be-forgotten,
    // round-9 verdict #5): a delete tranche (doc_id % 3 = 1) leaves
    // the corpus; stored pairs touching it retire by cascade, and
    // buckets that were cap-degenerate but shrink under the cap
    // RESURRECT their surviving pairs — member recovery semi-joined
    // to the affected bucket keys only. To exercise resurrection at
    // bench SFs, the corpus is augmented with 6 deterministic copies
    // of docs 1-3 (7-member identical clusters over maxBucket = 5;
    // the delete removes 2-3 per cluster, dropping them to 4-5).
    // Oracle = the FULL LSH recompute on the shrunk corpus, statused
    // by pre-delete bucket membership — maintenance algebra proven
    // lossless, both branches live.
    Q("q256_lsh_retire",
      (s, d) => {
        val base = Tables(s, d, "documents").select("doc_id", "text")
        val copies = base.filter(col("doc_id").between(1, 3))
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(1), lit(6))).as("k"))
          .select((lit(1000000L) + col("doc_id") * 10 + col("k"))
            .as("doc_id"), col("text"))
        Dedup.minhashLshRetire(base.unionByName(copies),
            col("doc_id"), col("text"),
            isDeleted = col("doc_id") % 3 === 1,
            n = 3, numPerm = 16, bands = 4, thr = 0.5, maxBucket = 5)
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH src AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT 1000000 + d.doc_id * 10 + k.k AS doc_id, d.text
        |  FROM documents d, generate_series(1, 6) k(k)
        |  WHERE d.doc_id BETWEEN 1 AND 3),
        |w AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
        |  FROM src),
        |d AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, len(ws) - 2),
        |      i -> array_to_string(ws[i:i+2], ' '))) AS grams
        |  FROM w WHERE len(ws) >= 3),
        |g AS (SELECT doc_id, unnest(grams) AS gram FROM d),
        |h AS (SELECT doc_id,
        |  ('0x' || substring(md5('0#' || gram), 1, 15))::BIGINT AS h FROM g),
        |perms(s, a, b, c) AS (VALUES $permValues),
        |sigs AS (
        |  SELECT h.doc_id, p.s,
        |    min((p.a * (h.h % 1073741824) + p.b * (h.h // 1073741824) + p.c)
        |        % 2147483647) AS mh
        |  FROM h, perms p
        |  GROUP BY h.doc_id, p.s),
        |bands AS (
        |  SELECT doc_id, s // 4 AS band_id,
        |    md5(string_agg(mh::VARCHAR, ',' ORDER BY s)) AS band_sig
        |  FROM sigs GROUP BY doc_id, band_id),
        |lv AS (SELECT * FROM bands WHERE doc_id % 3 <> 1),
        |preguard AS (SELECT * FROM bands
        |  QUALIFY count(*) OVER (PARTITION BY band_id, band_sig) <= 5),
        |stored AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM preguard a JOIN preguard b
        |    ON a.band_id = b.band_id AND a.band_sig = b.band_sig
        |    AND a.doc_id < b.doc_id),
        |postguard AS (SELECT * FROM lv
        |  QUALIFY count(*) OVER (PARTITION BY band_id, band_sig) <= 5),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM postguard a JOIN postguard b
        |    ON a.band_id = b.band_id AND a.band_sig = b.band_sig
        |    AND a.doc_id < b.doc_id),
        |j AS (
        |  SELECT doc_a, doc_b,
        |    CAST(len(list_filter(sa.grams, x -> list_contains(sb.grams, x))) AS DOUBLE) AS shared,
        |    len(sa.grams) AS na, len(sb.grams) AS nb
        |  FROM cand JOIN d sa ON doc_a = sa.doc_id
        |            JOIN d sb ON doc_b = sb.doc_id)
        |SELECT j.doc_a, j.doc_b,
        |  round(shared / (na + nb - shared), 4) AS jaccard,
        |  CASE WHEN st.doc_a IS NOT NULL THEN 'kept'
        |       ELSE 'resurrected' END AS status
        |FROM j LEFT JOIN stored st
        |  ON st.doc_a = j.doc_a AND st.doc_b = j.doc_b
        |WHERE round(shared / (na + nb - shared), 4) >= 0.5
        |ORDER BY j.doc_a, j.doc_b""".stripMargin),
      "LSH index delete maintenance — cascade retirement + cap-resurrection, equal to the full recompute on the shrunk corpus"),

    // q257 — AUTO-TUNED LSH banding (round-9 verdict #6): the
    // (bands, rows) point for thr = 0.5 is PICKED from the S-curve
    // (argmin |P(thr) − 1/2| over divisor pairs of numPerm = 16,
    // exact truncating fixed-point, ties → more bands), then the
    // chosen generator's measured recall/precision is reported via
    // q250's scoreboard machinery. The oracle replays the argmin as
    // recursive CTEs and threads the chosen rows-per-band through the
    // banding chain as a scalar subquery — selection AND quality both
    // hash-verified, nothing hardcoded.
    Q("q257_lsh_autotune",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val (b, r, pBp) = Dedup.tuneBanding(numPerm = 16, thr = 0.5)
        val truth = Dedup.ngramJaccard(docs, col("doc_id"), col("text"),
            n = 3, thr = 0.5, maxDf = 20)
          .select("doc_a", "doc_b").withColumn("tr", lit(1L))
        val cand = Dedup.lshCandidates(docs, col("doc_id"), col("text"),
            n = 3, numPerm = 16, bands = b, maxBucket = 100)
          .withColumn("cd", lit(1L))
        truth.join(cand, Seq("doc_a", "doc_b"), "full_outer")
          .agg(sum(coalesce(col("tr"), lit(0L))).as("n_truth"),
            sum(coalesce(col("cd"), lit(0L))).as("n_cand"),
            sum(coalesce(col("tr"), lit(0L)) * coalesce(col("cd"), lit(0L)))
              .as("n_hit"))
          .select(lit(b.toLong).as("bands"),
            lit(r.toLong).as("band_rows"),
            lit(pBp).as("p_at_thr_bp"),
            col("n_truth"), col("n_cand"), col("n_hit"),
            expr("(n_hit * 10000) div n_truth").as("recall_bp"),
            expr("(n_hit * 10000) div n_cand").as("precision_bp"))
      },
      Some(s"""WITH RECURSIVE ${gramCtes.stripPrefix("WITH ")},
        |cfg AS (SELECT b.b AS nb, 16 // b.b AS nr
        |  FROM generate_series(1, 16) b(b) WHERE 16 % b.b = 0),
        |sp(nb, nr, i, x) AS (
        |  SELECT nb, nr, 1, CAST(5000 AS BIGINT) FROM cfg
        |  UNION ALL
        |  SELECT nb, nr, i + 1, (x * 5000) // 10000 FROM sp WHERE i < nr),
        |srx AS (SELECT nb, nr, x AS sr FROM sp WHERE i = nr),
        |bpv(nb, nr, sr, i, y) AS (
        |  SELECT nb, nr, sr, 1, CAST(10000 - sr AS BIGINT) FROM srx
        |  UNION ALL
        |  SELECT nb, nr, sr, i + 1, (y * (10000 - sr)) // 10000
        |  FROM bpv WHERE i < nb),
        |pv AS (SELECT nb, nr, CAST(10000 - y AS BIGINT) AS p_bp
        |  FROM bpv WHERE i = nb),
        |pick AS MATERIALIZED (SELECT nb, nr, p_bp FROM pv
        |  ORDER BY abs(2 * p_bp - 10000), nb DESC LIMIT 1),
        |g AS (SELECT doc_id, unnest(grams) AS gram FROM d),
        |h AS (SELECT doc_id,
        |  ('0x' || substring(md5('0#' || gram), 1, 15))::BIGINT AS h FROM g),
        |perms(s, a, b, c) AS (VALUES $permValues),
        |sigs AS (
        |  SELECT h.doc_id, p.s,
        |    min((p.a * (h.h % 1073741824) + p.b * (h.h // 1073741824) + p.c)
        |        % 2147483647) AS mh
        |  FROM h, perms p
        |  GROUP BY h.doc_id, p.s),
        |bnd AS (
        |  SELECT doc_id, s // (SELECT nr FROM pick) AS band_id,
        |    md5(string_agg(mh::VARCHAR, ',' ORDER BY s)) AS band_sig
        |  FROM sigs GROUP BY doc_id, band_id),
        |guard AS (SELECT * FROM bnd
        |  QUALIFY count(*) OVER (PARTITION BY band_id, band_sig) <= 100),
        |candm AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM guard a JOIN guard b
        |    ON a.band_id = b.band_id AND a.band_sig = b.band_sig
        |    AND a.doc_id < b.doc_id),
        |hot AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 20),
        |k AS (SELECT g.doc_id, g.gram FROM g ANTI JOIN hot USING (gram)),
        |sz AS (SELECT doc_id, count(*) AS n FROM k GROUP BY doc_id),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(count(*) AS DOUBLE) AS shared
        |  FROM k a JOIN k b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |tp AS MATERIALIZED (
        |  SELECT doc_a, doc_b
        |  FROM p JOIN sz sa ON doc_a = sa.doc_id
        |         JOIN sz sb ON doc_b = sb.doc_id
        |  WHERE round(shared / (sa.n + sb.n - shared), 4) >= 0.5),
        |sb AS (SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM tp) AS n_truth,
        |  (SELECT CAST(count(*) AS BIGINT) FROM candm) AS n_cand,
        |  (SELECT CAST(count(*) AS BIGINT) FROM tp
        |     JOIN candm USING (doc_a, doc_b)) AS n_hit)
        |SELECT CAST(pick.nb AS BIGINT) AS bands,
        |  CAST(pick.nr AS BIGINT) AS band_rows,
        |  pick.p_bp AS p_at_thr_bp,
        |  n_truth, n_cand, n_hit,
        |  CAST((n_hit * 10000) // n_truth AS BIGINT) AS recall_bp,
        |  CAST((n_hit * 10000) // n_cand AS BIGINT) AS precision_bp
        |FROM sb, pick""".stripMargin),
      "S-curve auto-tuned (bands, rows) for the target threshold + measured recall/precision of the chosen point"),

    // q260 — PHYSICAL-STRATEGY EQUIVALENCE made an oracle contract:
    // q234's exact canonical-keep pipeline with dupClusters forced onto
    // its DISTRIBUTED min-label propagation path (localEdgeLimit = 0 —
    // the strategy a 100 TB pair graph takes when the verified-pair
    // set outgrows the driver collect). The propagation loop converges
    // to the same min-label fixpoint as the union-find (rounds-free
    // semantics, loud failure if the diameter exceeds the round cap),
    // so the ORACLE IS q234's: the recursive-closure cluster labels
    // and the keep list must hash-match across the two physical
    // strategies. Without this entry the distributed path — the one
    // the engine actually relies on at scale — ships spec-tested on
    // toy graphs but never oracle-verified at data scale.
    Q("q260_cluster_canonical_dist",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val matches = Dedup.sortedNeighborhoodPairs(docs,
          col("doc_id"), col("text"),
          n = 3, keyLen = 24, blockLen = 2, win = 6, minBp = 2000L)
        val clusters = Dedup.dupClusters(matches, localEdgeLimit = 0L)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("cluster_id")
          .orderBy(col("n_chars").desc, col("doc_id"))
        clusters
          .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
          .withColumn("rn", row_number().over(w))
          .groupBy("cluster_id")
          .agg(count(lit(1)).cast("long").as("cluster_size"),
            max(when(col("rn") === 1, col("doc_id"))).cast("long")
              .as("canonical_doc"))
          .orderBy("cluster_id")
      },
      Some("""WITH RECURSIVE b AS (SELECT doc_id,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |      ' ') AS ws
        |  FROM documents
        |  WHERE regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
        |    IS NOT NULL
        |    AND length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |      > 0),
        |rk AS (SELECT doc_id, substring(t, 1, 2) AS blk,
        |    row_number() OVER (PARTITION BY substring(t, 1, 2)
        |      ORDER BY substring(t, 1, 24), doc_id) AS rn
        |  FROM b),
        |pr AS (SELECT blk, doc_id AS id_a,
        |    unnest(generate_series(rn + 1, rn + 5)) AS rn2
        |  FROM rk),
        |pairs AS (SELECT least(pr.id_a, rk.doc_id) AS doc_a,
        |    greatest(pr.id_a, rk.doc_id) AS doc_b
        |  FROM pr JOIN rk ON rk.blk = pr.blk AND rk.rn = pr.rn2),
        |g0 AS (SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws) - 2),
        |      i -> array_to_string(ws[i:i+2], ' '))) AS gram
        |  FROM b WHERE len(ws) >= 3),
        |g AS (SELECT DISTINCT doc_id, gram FROM g0),
        |gc AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY 1),
        |sh AS (SELECT p.doc_a, p.doc_b, count(*) AS shared
        |  FROM pairs p JOIN g ga ON ga.doc_id = p.doc_a
        |               JOIN g gb ON gb.doc_id = p.doc_b
        |                 AND gb.gram = ga.gram
        |  GROUP BY 1, 2),
        |m AS (SELECT sh.doc_a, sh.doc_b
        |  FROM sh JOIN gc ca ON ca.doc_id = sh.doc_a
        |          JOIN gc cb ON cb.doc_id = sh.doc_b
        |  WHERE (10000 * sh.shared) // (ca.ng + cb.ng - sh.shared) >= 2000),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM m
        |  UNION SELECT doc_b, doc_a FROM m),
        |cc AS (SELECT src AS id, src AS label FROM edges
        |  UNION SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.id = e.src),
        |lab AS (SELECT id AS doc_id, min(label) AS cluster_id
        |  FROM cc GROUP BY id),
        |jm AS (SELECT lab.cluster_id, lab.doc_id, d.n_chars,
        |    row_number() OVER (PARTITION BY lab.cluster_id
        |      ORDER BY d.n_chars DESC, lab.doc_id) AS rn
        |  FROM lab JOIN documents d USING (doc_id))
        |SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size,
        |  CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
        |    AS canonical_doc
        |FROM jm GROUP BY cluster_id ORDER BY cluster_id""".stripMargin),
      "q234's canonical keep-list on the DISTRIBUTED min-label strategy — both physical paths hash-identical"),

    // q274 — bounded EDIT-DISTANCE near-dup join (PassJoin segment
    // pigeonhole + exact levenshtein verify): the CHARACTER-level
    // member the token-based dedup family is blind to — single-char
    // typo/OCR drift moves every token-level similarity barely while
    // ed(a, b) counts it exactly. Candidates are provably lossless
    // (one of the d+1 segments of a must survive verbatim in b,
    // displaced <= d); losslessness is pinned by DedupSpec's
    // brute-force property, and the oracle replays the same
    // pigeonhole + exact-verify pipeline cross-engine (a brute oracle
    // at this key length would cost the gate minutes per SF).
    // Runs on the 60-char document prefixes, d = 3: the operator's
    // own sf1 rehearsal measured 30-char keys saturating their
    // 7-char segment buckets (337K → 30.8M candidates for 5K → 50K
    // docs against a ~2.8K-pair true answer) — segment selectivity
    // is a property of the KEY, and 15-char segments cut the same
    // corpus's candidate space ~80×. The admission guard inside the
    // operator refuses saturated configurations with the measured
    // bound.
    Q("q274_edit_distance_join",
      (s, d) => Dedup.editDistanceJoin(
          Tables(s, d, "documents")
            .select(col("doc_id"), substring(col("text"), 1, 60).as("sk")),
          col("doc_id"), col("sk"), 3)
        .orderBy("doc_a", "doc_b"),
      Some("""WITH p AS MATERIALIZED (SELECT doc_id,
        |    substring(text, 1, 60) AS sk,
        |    len(substring(text, 1, 60)) AS l FROM documents),
        |seg AS MATERIALIZED (SELECT doc_id, l AS la, q,
        |    substring(sk, q*(l//4) + greatest(0, q - (4 - l%4)) + 1,
        |      (l//4) + CASE WHEN q >= 4 - l%4 THEN 1 ELSE 0 END) AS seg
        |  FROM p, generate_series(0, 3) t(q)),
        |pr AS MATERIALIZED (SELECT doc_id, la, q,
        |    substring(sk, q*(la//4) + greatest(0, q - (4 - la%4)) + sh + 1,
        |      (la//4) + CASE WHEN q >= 4 - la%4 THEN 1 ELSE 0 END) AS sub
        |  FROM p, generate_series(-3, 3) t0(sh), generate_series(0, 3) t1(q),
        |    generate_series(4, 63) t2(la)
        |  WHERE la BETWEEN l - 3 AND l + 3
        |    AND q*(la//4) + greatest(0, q - (4 - la%4)) + sh >= 0
        |    AND q*(la//4) + greatest(0, q - (4 - la%4)) + sh
        |      + (la//4) + CASE WHEN q >= 4 - la%4 THEN 1 ELSE 0 END <= l),
        |cand AS MATERIALIZED (SELECT DISTINCT
        |    least(a.doc_id, b.doc_id) AS doc_a,
        |    greatest(a.doc_id, b.doc_id) AS doc_b
        |  FROM seg a JOIN pr b ON a.la = b.la AND a.q = b.q
        |    AND a.seg = b.sub AND a.doc_id <> b.doc_id)
        |SELECT c.doc_a, c.doc_b,
        |  CAST(levenshtein(ta.sk, tb.sk) AS BIGINT) AS dist
        |FROM cand c JOIN p ta ON ta.doc_id = c.doc_a
        |  JOIN p tb ON tb.doc_id = c.doc_b
        |WHERE levenshtein(ta.sk, tb.sk) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin),
      "PassJoin edit-distance self-join: lossless segment-pigeonhole candidates + admission-bounded buckets, exact levenshtein verify"),
  )
}
