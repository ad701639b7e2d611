package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup}
import graft.util.Tables

/** Corpus-curation pack: the operations that sit between raw ingested
  * text and a training run — rule-based quality filtering, token-window
  * chunking (sequence packing), deterministic stratified sampling for
  * data mixing, pattern scrubbing, and an accuracy-audited approximate
  * distinct. Every query is per-row expression work until its final
  * deterministic sort, so each scales linearly with the corpus.
  */
object CurationQueries {

  private val stopwords =
    Seq("the", "a", "and", "of", "to", "in", "is", "it")
  private val stopList = stopwords.map(s => s"'$s'").mkString(", ")

  // the words() tokenization as DuckDB SQL (shared by q50/q51 oracles)
  private val wsSql =
    "string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')"

  // q51 chunking parameters — single source of truth for BOTH the Spark
  // call and the oracle SQL (interpolated below), so the two sides
  // cannot drift.
  private val chunkSize = 32
  private val overlap = 8
  private val stride = chunkSize - overlap

  // q59/q60 parameters — same single-source-of-truth rule as q51.
  private val maxTopWordFrac = 0.1
  private val maxTopBigramFrac = 0.05
  private val numShards = 8
  private val shardSeed = 11

  val qs: Seq[Q] = Seq(

    // q50 — Gopher-style rule filter. The signals are emitted alongside
    // the keep flag so a corpus audit can see WHY a document dropped.
    Q("q50_quality_filter",
      (s, d) => Curation.qualitySignals(Tables(s, d, "documents"),
          col("doc_id"), col("text"), stopwords,
          minWords = 30, maxWords = 5000,
          minMeanLen = 3.0, maxMeanLen = 10.0,
          minAlphaFrac = 0.8, minStopHits = 2)
        .orderBy("doc_id"),
      Some(s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS char_sum,
        |  CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS alpha_cnt,
        |  CAST(len(list_filter(ws, w -> w IN ($stopList))) AS BIGINT) AS stop_hits
        |  FROM w),
        |b AS (SELECT doc_id, n_words, stop_hits,
        |  (char_sum * 20000 + n_words) // (n_words * 2) AS mean_bp,
        |  (alpha_cnt * 20000 + n_words) // (n_words * 2) AS alpha_bp
        |  FROM m)
        |SELECT doc_id, CAST(n_words AS INTEGER) AS n_words,
        |  mean_bp / 10000.0 AS mean_word_len,
        |  alpha_bp / 10000.0 AS alpha_frac,
        |  CAST(stop_hits AS INTEGER) AS stop_hits,
        |  (n_words BETWEEN 30 AND 5000
        |   AND mean_bp BETWEEN 30000 AND 100000
        |   AND alpha_bp >= 8000 AND stop_hits >= 2) AS keep
        |FROM b ORDER BY doc_id""".stripMargin),
      "Gopher-style quality filter chain with audit signals (exact basis-point ratios)"),

    // q51 — token-window chunking ($chunkSize-token windows, $overlap
    // overlap); the oracle inlines the SAME Scala constants.
    Q("q51_token_chunks",
      (s, d) => Curation.chunkTokens(Tables(s, d, "documents"),
          col("doc_id"), col("text"), chunkSize = chunkSize, overlap = overlap)
        .orderBy("doc_id", "chunk_start"),
      Some(s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
        |s AS (SELECT doc_id, ws, len(ws) AS n,
        |  unnest(generate_series(1, greatest(len(ws), 1), $stride)) AS cs
        |  FROM w WHERE ws IS NOT NULL)
        |SELECT doc_id, CAST(cs AS INTEGER) AS chunk_start,
        |  CAST(len(list_slice(ws, cs, cs + ${chunkSize - 1})) AS INTEGER) AS n_tokens,
        |  md5(array_to_string(list_slice(ws, cs, cs + ${chunkSize - 1}), ' ')) AS fp
        |FROM s WHERE cs = 1 OR cs + $overlap <= n
        |ORDER BY doc_id, chunk_start""".stripMargin),
      s"sequence-packing chunker: $chunkSize-token windows, stride $stride"),

    // q52 — deterministic hash-stratified sampling (data mixing):
    // downsample en to 10%, upsample zh to 30%, 20% elsewhere.
    Q("q52_stratified_sample",
      (s, d) => Curation.hashStratifiedSample(Tables(s, d, "documents"),
          col("lang"), col("doc_id"),
          ratesPerMille = Map("en" -> 100, "zh" -> 300),
          defaultPerMille = 200, seed = 7)
        .select("doc_id", "lang").orderBy("doc_id"),
      Some("""SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substring(md5('7#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |  % 1000 < CASE lang WHEN 'en' THEN 100 WHEN 'zh' THEN 300 ELSE 200 END
        |ORDER BY doc_id""".stripMargin),
      "hash-gated per-language sampling, stable across runs and engines"),

    // q53 — pattern scrubbing over the events payload (digit runs stand
    // in for PII ids; the email/phone patterns are unit-tested).
    Q("q53_pii_redaction",
      (s, d) => {
        val ev = Tables(s, d, "events")
        val (red, cnt) = Curation.redact(ev.col("props"), "[0-9]+", "<NUM>")
        ev.select(col("event_id"), red.as("props_redacted"),
          cnt.as("n_redacted")).orderBy("event_id")
      },
      Some("""SELECT event_id,
        |  regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS props_redacted,
        |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS INTEGER) AS n_redacted
        |FROM events ORDER BY event_id""".stripMargin),
      "regex scrubbing with per-row match audit counts"),

    // q54 — HLL approximate distinct, audited against the exact count:
    // the query itself PROVES the sketch is within 10% (the flag is
    // computed from both), so the oracle can assert TRUE.
    Q("q54_approx_distinct",
      (s, d) => Tables(s, d, "events")
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          approx_count_distinct(col("user_id")).as("approx"))
        .select(col("event_type"), col("n_users"),
          (abs(col("approx") - col("n_users")) <=
            col("n_users") * 0.1).as("approx_ok"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  TRUE AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      "HLL distinct sketch with an in-query exactness audit"),

    // q56 — email + phone redaction using the shared PII patterns
    // (Curation.emailPattern / phonePattern — interpolated into the
    // oracle from the same constants, one source of truth). The contact
    // strings are derived deterministically from `customer` on BOTH
    // sides so the oracle replays the exact input. Email is scrubbed
    // first (its local-part digits must not be double-counted as phone
    // digits); counts audit each stage like q53.
    Q("q56_pii_email_phone",
      (s, d) => {
        val c = Tables(s, d, "customer")
        val raw = concat(lit("reach "), col("c_name"), lit(" at user"),
          col("c_custkey").cast("string"), lit("@mail."),
          lower(col("c_mktsegment")), lit(".com or call +155500"),
          lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
          lit(" today"))
        val (noEmail, nEmails) =
          Curation.redact(raw, Curation.emailPattern, "<EMAIL>")
        val (redacted, nPhones) =
          Curation.redact(noEmail, Curation.phonePattern, "<PHONE>")
        c.select(col("c_custkey"), redacted.as("contact_redacted"),
            nEmails.as("n_emails"), nPhones.as("n_phones"))
          .orderBy("c_custkey")
      },
      Some(s"""WITH t AS (SELECT c_custkey,
        |  'reach ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR)
        |    || '@mail.' || lower(c_mktsegment) || '.com or call +155500'
        |    || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || ' today' AS raw
        |  FROM customer),
        |e AS (SELECT c_custkey, raw,
        |  regexp_replace(raw, '${Curation.emailPattern}', '<EMAIL>', 'g')
        |    AS no_email FROM t)
        |SELECT c_custkey,
        |  regexp_replace(no_email, '${Curation.phonePattern}', '<PHONE>', 'g')
        |    AS contact_redacted,
        |  CAST(len(regexp_extract_all(raw, '${Curation.emailPattern}'))
        |    AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(no_email, '${Curation.phonePattern}'))
        |    AS INTEGER) AS n_phones
        |FROM e ORDER BY c_custkey""".stripMargin),
      "email+phone PII scrubbing with staged redaction and audit counts"),

    // q58 — benchmark decontamination: corpus docs sharing any word
    // 3-gram with the benchmark slice (doc_id % 97 == 0 stands in for a
    // held-out test set; the bench gram set is broadcast — the corpus
    // side is the 100 TB side and only shuffles the per-doc hit agg).
    Q("q58_decontamination",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        Curation.decontaminate(
            docs.filter(col("doc_id") % 97 =!= 0), col("doc_id"), col("text"),
            docs.filter(col("doc_id") % 97 === 0), col("text"), n = 3)
          .orderBy("doc_id")
      },
      Some(s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
        |d AS (SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(ws) - 2), i -> array_to_string(ws[i:i+2], ' ')))
        |    AS grams FROM w WHERE len(ws) >= 3),
        |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM d WHERE doc_id % 97 = 0),
        |cg AS (SELECT doc_id, unnest(grams) AS gram FROM d WHERE doc_id % 97 <> 0)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits, min(gram) AS min_gram
        |FROM cg JOIN bg USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      "test-set overlap flagging via broadcast n-gram join (GPT-3-style decontamination)"),

    // q59 — Gopher repetition signals: top-word / top-bigram mass
    // fractions + keep decision (thresholds interpolated into the
    // oracle from the same constants).
    Q("q59_repetition_signals",
      (s, d) => Curation.repetitionSignals(Tables(s, d, "documents"),
          col("doc_id"), col("text"),
          maxTopWordFrac = maxTopWordFrac,
          maxTopBigramFrac = maxTopBigramFrac)
        .orderBy("doc_id"),
      Some(s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
        |u AS (SELECT doc_id, len(ws) AS n, unnest(ws) AS t FROM w),
        |uc AS (SELECT doc_id, n, t, count(*) AS c FROM u GROUP BY 1, 2, 3),
        |ut AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / n, 4)
        |  AS top_word_frac FROM uc GROUP BY doc_id, n),
        |g AS (SELECT doc_id, list_transform(generate_series(1, len(ws) - 1),
        |    i -> array_to_string(ws[i:i+1], ' ')) AS gs
        |  FROM w WHERE len(ws) >= 2),
        |b AS (SELECT doc_id, len(gs) AS n, unnest(gs) AS t FROM g),
        |bc AS (SELECT doc_id, n, t, count(*) AS c FROM b GROUP BY 1, 2, 3),
        |bt AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / n, 4)
        |  AS top_bigram_frac FROM bc GROUP BY doc_id, n)
        |SELECT ut.doc_id, top_word_frac, top_bigram_frac,
        |  (top_word_frac <= $maxTopWordFrac
        |   AND coalesce(top_bigram_frac <= $maxTopBigramFrac, TRUE)) AS keep
        |FROM ut LEFT JOIN bt ON ut.doc_id = bt.doc_id
        |ORDER BY ut.doc_id""".stripMargin),
      "repetition-based quality: top word/bigram mass fractions (Gopher rules)"),

    // q60 — deterministic train shards: hash-derived shard + in-shard
    // position (a reproducible global shuffle for training output).
    Q("q60_train_shards",
      (s, d) => Curation.trainShards(Tables(s, d, "documents"),
          col("doc_id"), numShards = numShards, seed = shardSeed)
        .orderBy("doc_id"),
      Some(s"""WITH h AS (SELECT doc_id,
        |  ('0x' || substring(md5('$shardSeed#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents)
        |SELECT doc_id, CAST(h % $numShards AS INTEGER) AS shard,
        |  CAST(row_number() OVER (PARTITION BY h % $numShards
        |    ORDER BY h, doc_id) AS INTEGER) AS pos
        |FROM h ORDER BY doc_id""".stripMargin),
      "deterministic hash-based global shuffle into training shards"),

    // q62 — the composed corpus-curation pipeline, end to end: quality
    // filter → exact dedup (keep min id per text) → benchmark
    // decontamination → hash-stratified sampling → train shards. Each
    // stage is the already-verified operator; this query proves they
    // COMPOSE — the shape an actual 100 TB pretraining data build runs
    // as one lineage. Scale: quality/sample are per-row; dedup is one
    // key shuffle; decontamination joins a broadcast gram set; shards
    // is one shuffle on the (tiny) survivor set.
    Q("q62_curation_pipeline",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val qual = Curation.qualitySignals(docs, col("doc_id"), col("text"),
            stopwords, minWords = 30, maxWords = 5000,
            minMeanLen = 3.0, maxMeanLen = 10.0,
            minAlphaFrac = 0.8, minStopHits = 2)
          .filter(col("keep")).select("doc_id")
        val kept = docs.join(qual, "doc_id")
          .filter(col("doc_id") % 97 =!= 0)
        val reps = Dedup.exact(kept, col("text"), col("doc_id"))
          .select(col("keep_id").as("doc_id"))
        // cached: consumed by the decontamination gram pass AND the
        // anti-join survivor side — uncached, the whole quality+dedup
        // prefix would run twice. Released by the runner's clearCache().
        val deduped = kept.join(reps, "doc_id").cache()
        val flagged = Curation.decontaminate(deduped, col("doc_id"),
            col("text"), docs.filter(col("doc_id") % 97 === 0),
            col("text"), n = 3)
          .select("doc_id")
        val clean = deduped.join(flagged, Seq("doc_id"), "left_anti")
        val sampled = Curation.hashStratifiedSample(clean, col("lang"),
          col("doc_id"), ratesPerMille = Map("en" -> 600),
          defaultPerMille = 800, seed = 7)
        Curation.trainShards(sampled, col("doc_id"), numShards, shardSeed)
          .join(sampled.select("doc_id", "lang"), "doc_id")
          .select("doc_id", "lang", "shard", "pos")
          .orderBy("doc_id")
      },
      Some(s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT) AS char_sum,
        |  CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS alpha_cnt,
        |  CAST(len(list_filter(ws, x -> x IN ($stopList))) AS BIGINT) AS stop_hits
        |  FROM w),
        |q AS (SELECT doc_id FROM m
        |  WHERE n_words BETWEEN 30 AND 5000
        |    AND (char_sum * 20000 + n_words) // (n_words * 2) BETWEEN 30000 AND 100000
        |    AND (alpha_cnt * 20000 + n_words) // (n_words * 2) >= 8000
        |    AND stop_hits >= 2),
        |kept AS (SELECT d.doc_id, d.lang, d.text FROM documents d
        |  JOIN q USING (doc_id) WHERE d.doc_id % 97 <> 0),
        |reps AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY text),
        |deduped AS (SELECT kept.* FROM kept JOIN reps USING (doc_id)),
        |dg AS (SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(ws) - 2), i -> array_to_string(ws[i:i+2], ' ')))
        |    AS grams FROM w WHERE len(ws) >= 3),
        |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM dg WHERE doc_id % 97 = 0),
        |cg AS (SELECT g.doc_id, unnest(g.grams) AS gram FROM dg g
        |  JOIN deduped USING (doc_id)),
        |flagged AS (SELECT DISTINCT doc_id FROM cg JOIN bg USING (gram)),
        |clean AS (SELECT * FROM deduped ANTI JOIN flagged USING (doc_id)),
        |sampled AS (SELECT doc_id, lang FROM clean
        |  WHERE ('0x' || substring(md5('7#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |    % 1000 < CASE lang WHEN 'en' THEN 600 ELSE 800 END),
        |h AS (SELECT doc_id, lang,
        |  ('0x' || substring(md5('$shardSeed#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM sampled)
        |SELECT doc_id, lang, CAST(h % $numShards AS INTEGER) AS shard,
        |  CAST(row_number() OVER (PARTITION BY h % $numShards
        |    ORDER BY h, doc_id) AS INTEGER) AS pos
        |FROM h ORDER BY doc_id""".stripMargin),
      "composed curation pipeline: quality→dedup→decontaminate→sample→shards"),

    // q63 — approx percentile audited against the exact answer, the
    // q54 pattern for quantile sketches: the query PROVES the sketch
    // lands within 2% relative error of the exact per-group p50/p90
    // (so the oracle asserts TRUE). At 100 TB the sketch (constant
    // memory, map-side mergeable) is the only viable path; the audit
    // is how you justify switching to it.
    Q("q63_approx_percentile_audit",
      (s, d) => Tables(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          expr("approx_percentile(o_totalprice, 0.5, 1000)").as("ap50"),
          expr("approx_percentile(o_totalprice, 0.9, 1000)").as("ap90"))
        .select(col("o_orderpriority"), col("p50"), col("p90"),
          (abs(col("ap50") - col("p50")) <= col("p50") * 0.02 &&
            abs(col("ap90") - col("p90")) <= col("p90") * 0.02).as("approx_ok"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  TRUE AS approx_ok
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      "quantile sketch with an in-query exactness audit (q54 pattern)"),

    // q76 — per-source quota caps (domain balancing): at most 15 docs
    // per source, selected by deterministic hash order on the
    // TopKPerKey node (≤ cap rows per (source, partition) reach the
    // exchange — a hot domain never ships its full volume).
    Q("q76_source_quota",
      (s, d) => Curation.sourceQuota(Tables(s, d, "documents"),
          col("doc_id"), col("source"), maxPerSource = 15, seed = 13)
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    ('0x' || substring(md5('13#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents)
        |QUALIFY row_number() OVER (PARTITION BY source ORDER BY h, doc_id) <= 15
        |ORDER BY doc_id""".stripMargin),
      "deterministic per-source quota cap (domain balancing) on the TopKPerKey node"),

    // q82 — the composed pipeline WITH source balancing: q62's lineage
    // plus the q76 quota stage, placed where a real data build debates
    // it — after cleaning (quality/dedup/decontaminate decide what is
    // usable), BEFORE sampling and sharding (the mix must be balanced
    // before rates are applied, or a hot domain distorts every
    // stratum). Quota survivors join back by doc_id (broadcastable —
    // ≤ cap × |sources| rows); everything else is q62's plan shape.
    Q("q82_curation_balanced",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val qual = Curation.qualitySignals(docs, col("doc_id"), col("text"),
            stopwords, minWords = 30, maxWords = 5000,
            minMeanLen = 3.0, maxMeanLen = 10.0,
            minAlphaFrac = 0.8, minStopHits = 2)
          .filter(col("keep")).select("doc_id")
        val kept = docs.join(qual, "doc_id")
          .filter(col("doc_id") % 97 =!= 0)
        val reps = Dedup.exact(kept, col("text"), col("doc_id"))
          .select(col("keep_id").as("doc_id"))
        // cached: consumed by the decontamination gram pass AND the
        // anti-join survivor side (see q62).
        val deduped = kept.join(reps, "doc_id").cache()
        val flagged = Curation.decontaminate(deduped, col("doc_id"),
            col("text"), docs.filter(col("doc_id") % 97 === 0),
            col("text"), n = 3)
          .select("doc_id")
        val clean = deduped.join(flagged, Seq("doc_id"), "left_anti")
        val balanced = clean.join(
          Curation.sourceQuota(clean, col("doc_id"), col("source"),
            maxPerSource = 10, seed = 13).select("doc_id"),
          "doc_id")
        val sampled = Curation.hashStratifiedSample(balanced, col("lang"),
          col("doc_id"), ratesPerMille = Map("en" -> 600),
          defaultPerMille = 800, seed = 7)
        Curation.trainShards(sampled, col("doc_id"), numShards, shardSeed)
          .join(sampled.select("doc_id", "lang", "source"), "doc_id")
          .select("doc_id", "lang", "source", "shard", "pos")
          .orderBy("doc_id")
      },
      Some(s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT) AS char_sum,
        |  CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS alpha_cnt,
        |  CAST(len(list_filter(ws, x -> x IN ($stopList))) AS BIGINT) AS stop_hits
        |  FROM w),
        |q AS (SELECT doc_id FROM m
        |  WHERE n_words BETWEEN 30 AND 5000
        |    AND (char_sum * 20000 + n_words) // (n_words * 2) BETWEEN 30000 AND 100000
        |    AND (alpha_cnt * 20000 + n_words) // (n_words * 2) >= 8000
        |    AND stop_hits >= 2),
        |kept AS (SELECT d.doc_id, d.lang, d.source, d.text FROM documents d
        |  JOIN q USING (doc_id) WHERE d.doc_id % 97 <> 0),
        |reps AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY text),
        |deduped AS (SELECT kept.* FROM kept JOIN reps USING (doc_id)),
        |dg AS (SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(ws) - 2), i -> array_to_string(ws[i:i+2], ' ')))
        |    AS grams FROM w WHERE len(ws) >= 3),
        |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM dg WHERE doc_id % 97 = 0),
        |cg AS (SELECT g.doc_id, unnest(g.grams) AS gram FROM dg g
        |  JOIN deduped USING (doc_id)),
        |flagged AS (SELECT DISTINCT doc_id FROM cg JOIN bg USING (gram)),
        |clean AS (SELECT * FROM deduped ANTI JOIN flagged USING (doc_id)),
        |bal AS (SELECT doc_id, lang, source FROM (
        |    SELECT c.*, ('0x' || substring(md5('13#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS qh
        |    FROM clean c)
        |  QUALIFY row_number() OVER (PARTITION BY source ORDER BY qh, doc_id) <= 10),
        |sampled AS (SELECT doc_id, lang, source FROM bal
        |  WHERE ('0x' || substring(md5('7#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |    % 1000 < CASE lang WHEN 'en' THEN 600 ELSE 800 END),
        |h AS (SELECT doc_id, lang, source,
        |  ('0x' || substring(md5('$shardSeed#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM sampled)
        |SELECT doc_id, lang, source, CAST(h % $numShards AS INTEGER) AS shard,
        |  CAST(row_number() OVER (PARTITION BY h % $numShards
        |    ORDER BY h, doc_id) AS INTEGER) AS pos
        |FROM h ORDER BY doc_id""".stripMargin),
      "composed curation with source balancing: quality→dedup→decontaminate→quota→sample→shards"),

    // q85 — token-budget bin packing (sequence packing at the document
    // grain): docs dealt into 4 hash shards, laid out in hash order,
    // cut into 2000-token bins by START OFFSET (the concat-and-chunk
    // rule a pretraining loader runs; a straddling doc belongs to the
    // bin it starts in). One shuffle — the per-shard running-sum
    // window; bin is arithmetic on the running sum, via exact integer
    // division on both engines.
    Q("q85_token_budget_packing",
      (s, d) => Curation.packTokenBudget(Tables(s, d, "documents"),
          col("doc_id"), col("text"), budget = 2000, numShards = 4, seed = 17)
        .orderBy("doc_id"),
      Some(s"""WITH w AS (SELECT doc_id,
        |    CAST(len($wsSql) AS BIGINT) AS n_tokens,
        |    ('0x' || substring(md5('17#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents),
        |s AS (SELECT doc_id, n_tokens, h, CAST(h % 4 AS INTEGER) AS shard FROM w),
        |c AS (SELECT doc_id, shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id) AS cum
        |  FROM s)
        |SELECT doc_id, shard, CAST((cum - n_tokens) // 2000 AS INTEGER) AS bin,
        |  CAST(n_tokens AS INTEGER) AS n_tokens
        |FROM c ORDER BY doc_id""".stripMargin),
      "token-budget bin packing: hash-ordered concat-and-chunk into 2000-token bins"),

    // q87 — token-weighted source MIXTURE sampling (the data-mixing step
    // before training): mixture weights parts(srcN) = N % 3 + 1, derived
    // arithmetically on BOTH engines so neither side hardcodes a weight
    // table. Feasible total T = min_s(avail_s div parts_s) — integral
    // division both sides — and each source keeps its hash-ordered doc
    // prefix with running tokens <= parts_s * T. Downsample-only: no
    // source is asked for more tokens than it has.
    Q("q87_mixture_sample",
      (s, d) => Curation.mixtureSample(Tables(s, d, "documents"),
          col("doc_id"), col("text"), col("source"),
          parts = (0 until 20).map(i => s"src$i" -> (i % 3 + 1)).toMap,
          seed = 23)
        .orderBy("doc_id"),
      Some(s"""WITH w AS (SELECT doc_id, source,
        |    CAST(len($wsSql) AS BIGINT) AS n_tokens,
        |    ('0x' || substring(md5('23#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents),
        |p AS (SELECT source,
        |    CAST(substring(source, 4) AS BIGINT) % 3 + 1 AS parts
        |  FROM (SELECT DISTINCT source FROM documents)),
        |j AS (SELECT w.*, p.parts FROM w JOIN p USING (source)),
        |t AS (SELECT min(avail // parts) AS t FROM (
        |    SELECT source, CAST(sum(n_tokens) AS BIGINT) AS avail,
        |      any_value(parts) AS parts
        |    FROM j GROUP BY source)),
        |c AS (SELECT doc_id, source, n_tokens, parts,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id) AS cum
        |  FROM j)
        |SELECT doc_id, source, CAST(n_tokens AS INTEGER) AS n_tokens,
        |  CAST(cum AS BIGINT) AS cum_tokens
        |FROM c, t WHERE cum <= parts * t.t ORDER BY doc_id""".stripMargin),
      "token-weighted source mixture: hash-prefix downsample to parts_s * min(avail div parts)"),

    // q94 — bigram-LM quality score (the CCNet/Gopher perplexity-filter
    // step) with NO float in the path: the LM is the corpus's own
    // bigram table; a doc's score is the exact round-half-up mean
    // conditional probability of its bigram occurrences in basis points
    // (probability domain, not log — ln() would reopen the q61
    // cross-engine-libm class), plus the weakest-link min. Both corpus
    // stat tables re-aggregate from the compacted (doc, gram, cnt) form;
    // scoring joins on the gram keys (shuffle joins by design — a
    // 100 TB bigram vocabulary does not broadcast).
    Q("q94_bigram_lm_quality",
      (s, d) => Curation.bigramLmScore(Tables(s, d, "documents"),
          col("doc_id"), col("text"))
        .orderBy("doc_id"),
      Some(s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
        |bg AS (SELECT doc_id, array_to_string(ws[pos:pos+1], ' ') AS g
        |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS pos
        |        FROM w WHERE len(ws) >= 2)),
        |dg AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cnt
        |  FROM bg GROUP BY doc_id, g),
        |cg AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS cg FROM dg GROUP BY g),
        |pf AS (SELECT string_split(g, ' ')[1] AS w1,
        |    CAST(sum(cnt) AS BIGINT) AS cp
        |  FROM dg GROUP BY 1),
        |pr AS (SELECT dg.doc_id, dg.cnt,
        |    (2 * cg.cg * 10000 + pf.cp) // (pf.cp * 2) AS bp
        |  FROM dg JOIN cg USING (g)
        |  JOIN pf ON string_split(dg.g, ' ')[1] = pf.w1)
        |SELECT doc_id, CAST(sum(cnt) AS INTEGER) AS n_bigrams,
        |  ((2 * CAST(sum(cnt * bp) AS BIGINT) + CAST(sum(cnt) AS BIGINT))
        |    // (2 * CAST(sum(cnt) AS BIGINT))) / 10000.0 AS lm_score,
        |  min(bp) / 10000.0 AS min_prob
        |FROM pr GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      "corpus-bigram LM quality score: exact integer mean conditional probability"),

    // q106 — deterministic stratified train/val/test split (80/10/10):
    // the frozen-eval-set contract — split from the id hash, so
    // disjoint + exhaustive by construction, stable under re-runs and
    // appends, and stratified across sources without bookkeeping (the
    // hash is uniform within every stratum). Pure per-row expression;
    // the oracle replays the identical md5 gate.
    Q("q106_train_val_test_split",
      (s, d) => Curation.trainValTestSplit(
          Tables(s, d, "documents").select("doc_id", "source"),
          col("doc_id"), trainPerMille = 800, valPerMille = 100, seed = 7)
        .orderBy("doc_id"),
      Some("""WITH g AS (SELECT doc_id, source,
        |    ('0x' || substring(md5('7#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      % 1000 AS gate
        |  FROM documents)
        |SELECT doc_id, source,
        |  CASE WHEN gate < 800 THEN 'train'
        |       WHEN gate < 900 THEN 'val' ELSE 'test' END AS split
        |FROM g ORDER BY doc_id""".stripMargin),
      "stratified train/val/test split: per-row hash gate, frozen eval sets"),

    // q130 — BLENDED curation ranking: fuse two orthogonal per-doc
    // signals — 3-gram novelty (q125's operator) and token count — by
    // integer reciprocal rank (the q116 RRF combiner), selecting the
    // top-50 "most valuable" documents. Rank fusion instead of score
    // blending because the signals live on incomparable scales; each
    // rank comes from Rank.globalRank (prebucket + broadcast offsets),
    // so NO single-partition window touches the corpus-sized signal
    // tables. Rank 1 = best (highest signal): globalRank runs on the
    // negated metric.
    Q("q130_curation_rank_blend",
      (s, d) => {
        import graft.operators.{Dedup, Rank, Retrieval}
        val docs = Tables(s, d, "documents")
        val nov = Dedup.gramNovelty(docs, col("doc_id"), col("text"), 3)
          .select(col("doc_id"), col("novelty_bp"),
            (-col("novelty_bp")).as("neg"))
        val tokc = docs.select(col("doc_id"),
            size(graft.functions.TextFunctions.words(col("text")))
              .cast("long").as("n_tokens"))
          .withColumn("neg", -col("n_tokens"))
        val nr = Rank.globalRank(nov, "neg", "doc_id")
          .select(col("doc_id"), col("novelty_bp"),
            col("global_rank").as("nov_rank"))
        val tr = Rank.globalRank(tokc, "neg", "doc_id")
          .select(col("doc_id"), col("n_tokens"),
            col("global_rank").as("tok_rank"))
        Retrieval.rrfFuseCarry(nr, "doc_id", "nov_rank",
            tr, "doc_id", "tok_rank")
          .select(col("id").as("doc_id"), col("novelty_bp"), col("n_tokens"),
            col("rank_a").as("nov_rank"), col("rank_b").as("tok_rank"),
            col("rrf_score"))
          .orderBy(col("rrf_score").desc, col("doc_id"))
          .limit(50)
      },
      Some(s"""WITH w AS (SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
        |  FROM documents),
        |d AS (SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, len(ws) - 2),
        |      i -> array_to_string(ws[i:i+2], ' '))) AS grams
        |  FROM w WHERE len(ws) >= 3),
        |g AS (SELECT doc_id, unnest(grams) AS gram FROM d),
        |f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram),
        |nov AS (SELECT g.doc_id, CAST((2 * sum(CASE WHEN f.first_doc = g.doc_id
        |      THEN 1 ELSE 0 END) * 10000 + count(*)) // (2 * count(*)) AS BIGINT)
        |      AS novelty_bp
        |  FROM g JOIN f USING (gram) GROUP BY g.doc_id),
        |tokc AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens FROM w),
        |nr AS (SELECT doc_id, novelty_bp, CAST(row_number() OVER (
        |    ORDER BY novelty_bp DESC, doc_id) AS BIGINT) AS nov_rank FROM nov),
        |tr AS (SELECT doc_id, n_tokens, CAST(row_number() OVER (
        |    ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS tok_rank FROM tokc)
        |SELECT coalesce(nr.doc_id, tr.doc_id) AS doc_id, novelty_bp, n_tokens,
        |  nr.nov_rank, tr.tok_rank,
        |  CAST(coalesce(1000000 // (60 + nr.nov_rank), 0)
        |    + coalesce(1000000 // (60 + tr.tok_rank), 0) AS BIGINT) AS rrf_score
        |FROM nr FULL OUTER JOIN tr ON nr.doc_id = tr.doc_id
        |ORDER BY rrf_score DESC, doc_id LIMIT 50""".stripMargin),
      "curation rank-blend: novelty x token-count fused by integer RRF, distributed ranks"),

    // q140 — CURATION YIELD FUNNEL: the docs/tokens survival report a
    // curation pipeline publishes after every run — raw → exact dedup
    // (min doc_id per text) → quality gate (n_chars >= 200) → per-source
    // quota (10 docs per source in deterministic md5-hash order).
    // Stage rules are deliberately the simple replayable forms of the
    // full operators (q22 / q50 / q76); what this query adds is the
    // LINEAGE ACCOUNTING — each stage's loss measured on real chained
    // survivors, the number that tells you which stage to tune.
    Q("q140_curation_yield",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
        val docs = Tables(s, d, "documents").select(col("doc_id"),
          col("source"), col("n_chars"),
          size(graft.functions.TextFunctions.words(col("text")))
            .cast("long").as("toks"),
          col("text"))
        val s1 = docs.withColumn("rn", row_number().over(
            w.partitionBy("text").orderBy("doc_id")))
          .filter(col("rn") === 1).drop("rn")
        val s2 = s1.filter(col("n_chars") >= 200)
        val s3 = s2.withColumn("h",
            graft.functions.TextFunctions.hash60(
              col("doc_id").cast("string"), 7))
          .withColumn("rn", row_number().over(
            w.partitionBy("source").orderBy("h", "doc_id")))
          .filter(col("rn") <= 10)
        def st(name: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(lit(name).as("stage"), count(lit(1)).as("n_docs"),
            sum("toks").as("n_tokens"))
        st("0_raw", docs).unionAll(st("1_exact_dedup", s1))
          .unionAll(st("2_quality", s2)).unionAll(st("3_quota", s3))
          .orderBy("stage")
      },
      Some("""WITH docs AS (SELECT doc_id, source, n_chars, text,
        |    CAST(len(string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ')) AS BIGINT) AS toks
        |  FROM documents),
        |s1 AS (SELECT * FROM docs
        |  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1),
        |s2 AS (SELECT * FROM s1 WHERE n_chars >= 200),
        |s3 AS (SELECT * FROM s2
        |  QUALIFY row_number() OVER (PARTITION BY source
        |    ORDER BY ('0x' || substring(md5('7#' || CAST(doc_id AS VARCHAR)),
        |      1, 15))::BIGINT, doc_id) <= 10)
        |SELECT '0_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS n_tokens FROM docs
        |UNION ALL SELECT '1_exact_dedup', CAST(count(*) AS BIGINT),
        |  CAST(sum(toks) AS BIGINT) FROM s1
        |UNION ALL SELECT '2_quality', CAST(count(*) AS BIGINT),
        |  CAST(sum(toks) AS BIGINT) FROM s2
        |UNION ALL SELECT '3_quota', CAST(count(*) AS BIGINT),
        |  CAST(sum(toks) AS BIGINT) FROM s3
        |ORDER BY stage""".stripMargin),
      "curation yield funnel: docs/tokens surviving each chained stage"),

    // q143 — SHARD BALANCE report: per-shard doc and token counts for
    // the q60 hash-shard assignment plus each shard's deviation from
    // the mean token load in exact basis points — the skew check run
    // before handing shards to trainers (a 10% heavy shard = a 10%
    // slower epoch). Deviation: dev_bp = |tokens·S − total| / total in
    // half-up bp. One shard agg; totals broadcast back.
    Q("q143_shard_balance",
      (s, d) => {
        import graft.functions.IntMath
        val numShards = 8
        val t = Tables(s, d, "documents").select(col("doc_id"),
          size(graft.functions.TextFunctions.words(col("text")))
            .cast("long").as("toks"))
        val sh = Curation.trainShards(Tables(s, d, "documents"),
            col("doc_id"), numShards = numShards, seed = shardSeed)
          .join(t, "doc_id")
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
        val tot = sh.agg(sum("n_tokens").as("total_tokens"))
        sh.crossJoin(broadcast(tot))
          .select(col("shard"), col("n_docs"), col("n_tokens"),
            IntMath.halfUp(abs(col("n_tokens") * numShards
              - col("total_tokens")), col("total_tokens"), 10000L)
              .as("dev_bp"))
          .orderBy("shard")
      },
      Some(s"""WITH t AS (SELECT doc_id,
        |    CAST(('0x' || substring(md5('$shardSeed#' || CAST(doc_id AS VARCHAR)),
        |      1, 15))::BIGINT % 8 AS INTEGER) AS shard,
        |    CAST(len(string_split(regexp_replace(lower(trim(text)),
        |      '\\s+', ' ', 'g'), ' ')) AS BIGINT) AS toks
        |  FROM documents),
        |sh AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(toks) AS BIGINT) AS n_tokens FROM t GROUP BY shard),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM sh)
        |SELECT shard, n_docs, n_tokens,
        |  (2 * abs(n_tokens * 8 - total_tokens) * 10000 + total_tokens)
        |    // (2 * total_tokens) AS dev_bp
        |FROM sh, tot ORDER BY shard""".stripMargin),
      "train-shard balance: per-shard doc/token loads + exact deviation from mean"),

    // q154 — SOURCE DIVERSITY index per language: Gini–Simpson
    // 1 − Σ(nᵢ/N)² = (N² − Σnᵢ²) / N², in exact half-up basis points
    // (0 = one source dominates, →10000 = evenly mixed) — the corpus-
    // balance number a mixture designer watches, chosen over Shannon
    // entropy because it needs NO logarithm (cross-engine exact). One
    // (lang, source) agg; the diversity fold is group-count-sized.
    Q("q154_source_diversity",
      (s, d) => {
        import graft.functions.IntMath
        val c = Tables(s, d, "documents").groupBy("lang", "source")
          .agg(count(lit(1)).as("n"))
        c.groupBy("lang")
          .agg(count(lit(1)).as("n_sources"), sum("n").as("n_docs"),
            sum(col("n") * col("n")).as("sq"))
          .select(col("lang"), col("n_sources"), col("n_docs"),
            IntMath.halfUp(col("n_docs") * col("n_docs") - col("sq"),
              col("n_docs") * col("n_docs"), 10000L).as("diversity_bp"))
          .orderBy("lang")
      },
      Some("""WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_sources,
        |  CAST(sum(n) AS BIGINT) AS n_docs,
        |  CAST((2 * (sum(n) * sum(n) - sum(n * n)) * 10000 + sum(n) * sum(n))
        |    // (2 * sum(n) * sum(n)) AS BIGINT) AS diversity_bp
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin),
      "Gini-Simpson source diversity per language in exact basis points (no log)"),

    // q156 — TRIMMED MEAN (robust location): mean of order prices
    // strictly inside the exact [p10, p90] band per priority — the
    // robust average that survives fat tails, with the band bounds from
    // TWO GroupedQuantile distributed selections and the mean itself in
    // exact integer cents (sum/count emitted; the displayed mean rounds
    // the integer ratio). Complements q122's MAD: MAD flags outliers,
    // the trimmed mean reports location with them excluded.
    Q("q156_trimmed_mean",
      (s, d) => {
        import graft.operators.GroupedQuantile
        val o = Tables(s, d, "orders").select(col("o_orderpriority").as("g"),
          round(col("o_totalprice") * 100, 0).cast("long").as("v"),
          col("o_orderkey").as("t"))
        val p10 = GroupedQuantile.kthSmallestLong(o, col("g"), col("v"),
            col("t"), GroupedQuantile.pctRank(10))
          .withColumnRenamed("kth_value", "p10")
        val p90 = GroupedQuantile.kthSmallestLong(o, col("g"), col("v"),
            col("t"), GroupedQuantile.pctRank(90))
          .withColumnRenamed("kth_value", "p90")
        o.join(broadcast(p10), "g").join(broadcast(p90), "g")
          .filter(col("v") > col("p10") && col("v") < col("p90"))
          .groupBy("g", "p10", "p90")
          .agg(count(lit(1)).as("n_kept"), sum("v").as("cents_sum"))
          .select(col("g").as("o_orderpriority"), col("n_kept"),
            (col("p10") / 100.0).as("p10_price"),
            (col("p90") / 100.0).as("p90_price"),
            (graft.functions.IntMath.halfUp(col("cents_sum"),
              col("n_kept"), 1L) / 100.0).as("trimmed_mean"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH o AS (SELECT o_orderpriority AS g,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v,
        |    o_orderkey AS t FROM orders),
        |r AS (SELECT g, v,
        |    row_number() OVER (PARTITION BY g ORDER BY v, t) AS rn,
        |    count(*) OVER (PARTITION BY g) AS n FROM o),
        |b AS (SELECT g,
        |    max(CASE WHEN rn = (10 * n + 99) // 100 THEN v END) AS p10,
        |    max(CASE WHEN rn = (90 * n + 99) // 100 THEN v END) AS p90
        |  FROM r GROUP BY g)
        |SELECT o.g AS o_orderpriority, CAST(count(*) AS BIGINT) AS n_kept,
        |  b.p10 / 100.0 AS p10_price, b.p90 / 100.0 AS p90_price,
        |  ((2 * sum(o.v) * 1 + count(*)) // (2 * count(*))) / 100.0
        |    AS trimmed_mean
        |FROM o JOIN b ON o.g = b.g
        |WHERE o.v > b.p10 AND o.v < b.p90
        |GROUP BY o.g, b.p10, b.p90 ORDER BY o_orderpriority""".stripMargin),
      "exact trimmed mean inside the [p10, p90] band (robust location, integer cents)"),

    // q163 — LARGEST-REMAINDER apportionment: allocate an exact total
    // sample budget (100 docs) across languages proportionally — floor
    // shares first, then the leftover seats to the largest remainders
    // (ties to lang asc) — the Hamilton-method integer allocation that
    // hash-gate sampling (q52) cannot give when the total must be
    // EXACT. All integer; the seat rank runs over the 5-row language
    // table.
    Q("q163_sample_apportionment",
      (s, d) => {
        val budget = 100L
        val c = Tables(s, d, "documents").groupBy("lang")
          .agg(count(lit(1)).as("n_docs"))
        val tot = c.agg(sum("n_docs").as("n_total"))
        val sh = c.crossJoin(broadcast(tot))
          .withColumn("base", expr(s"n_docs * $budget div n_total"))
          .withColumn("rem", col("n_docs") * budget % col("n_total"))
        val spare = sh.agg((lit(budget) - sum("base")).as("spare"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("rem").desc, col("lang"))
        sh.crossJoin(broadcast(spare))
          .withColumn("seat_rank", row_number().over(w))
          .select(col("lang"), col("n_docs"),
            (col("base") + when(col("seat_rank") <= col("spare"), 1L)
              .otherwise(0L)).as("alloc"))
          .orderBy("lang")
      },
      Some("""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY lang),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM c),
        |sh AS (SELECT lang, n_docs, n_docs * 100 // n_total AS base,
        |    n_docs * 100 % n_total AS rem FROM c, t),
        |sp AS (SELECT 100 - CAST(sum(base) AS BIGINT) AS spare FROM sh)
        |SELECT lang, n_docs,
        |  CAST(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
        |    <= spare THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM sh, sp ORDER BY lang""".stripMargin),
      "Hamilton largest-remainder allocation of an exact sample budget across languages"),

    // q181 — WEIGHTED deterministic sampling (priority sampling): per
    // language, the 5 docs with the smallest hash60(id) div n_chars
    // priorities win — selection probability scales with document
    // length while staying a pure function of (id, weight): stable
    // across runs/engines/partitionings like every sampler here
    // (rand()-free), and the integer priority replays bit-exact (no
    // pow/ln of classic Efraimidis–Spirakis — q100's no-libm bargain).
    // Scale shape: priority is a per-row projection; per-stratum
    // bottom-k is one stratum-keyed exchange (TopKPerKey at production
    // scale — q76's plan node).
    Q("q181_weighted_priority_sample",
      (s, d) => graft.operators.Curation.prioritySample(
          Tables(s, d, "documents"), col("lang"), col("doc_id"),
          col("n_chars"), k = 5, seed = 7)
        .orderBy("stratum", "rank_in_stratum"),
      Some("""WITH b AS (SELECT lang AS stratum, doc_id AS id,
        |    CAST(n_chars AS BIGINT) AS w,
        |    CAST(('0x' || substring(md5('7#' || CAST(doc_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) AS h
        |  FROM documents WHERE n_chars > 0),
        |p AS (SELECT stratum, id, w AS weight, h // w AS priority,
        |    row_number() OVER (PARTITION BY stratum ORDER BY h // w, id)
        |      AS rank_in_stratum
        |  FROM b)
        |SELECT stratum, id, weight, priority, rank_in_stratum
        |FROM p WHERE rank_in_stratum <= 5
        |ORDER BY stratum, rank_in_stratum""".stripMargin),
      "weighted bottom-k priority sample per language, integer-exact and engine-stable"),

    // q193 — GREEDY COVERAGE source selection: the submodular facility-
    // location greedy behind coverage-driven data selection — 3 rounds,
    // each picking the source that adds the most not-yet-covered
    // distinct 3-grams (ties by name), the classic (1−1/e) max-coverage
    // approximation. Rounds are inherently sequential; each round's
    // work is distributed (anti-join vs covered + per-source count) and
    // only the argmax ROW lands on the driver. The oracle unrolls the
    // same three rounds as CTEs.
    Q("q193_greedy_coverage",
      (s, d) => graft.operators.Curation.greedyCoverage(
          Tables(s, d, "documents"), col("source"), col("text"),
          n = 3, rounds = 3)
        .orderBy("round"),
      Some("""WITH w AS (SELECT source AS src,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |      ' ') AS ws
        |  FROM documents),
        |g0 AS (SELECT src,
        |    unnest(list_transform(generate_series(1, len(ws) - 2),
        |      i -> array_to_string(ws[i:i+2], ' '))) AS gram
        |  FROM w WHERE len(ws) >= 3),
        |g AS (SELECT DISTINCT src, gram FROM g0),
        |c1 AS (SELECT src, count(*) AS m FROM g GROUP BY 1),
        |p1 AS (SELECT src, m FROM c1 ORDER BY m DESC, src LIMIT 1),
        |cov1 AS (SELECT DISTINCT g.gram FROM g JOIN p1 USING (src)),
        |r2 AS (SELECT g.* FROM g ANTI JOIN cov1 USING (gram)),
        |c2 AS (SELECT src, count(*) AS m FROM r2 GROUP BY 1),
        |p2 AS (SELECT src, m FROM c2 ORDER BY m DESC, src LIMIT 1),
        |cov2 AS (SELECT gram FROM cov1
        |  UNION SELECT g.gram FROM g JOIN p2 USING (src)),
        |r3 AS (SELECT g.* FROM g ANTI JOIN cov2 USING (gram)),
        |c3 AS (SELECT src, count(*) AS m FROM r3 GROUP BY 1),
        |p3 AS (SELECT src, m FROM c3 ORDER BY m DESC, src LIMIT 1),
        |u AS (SELECT 1 AS round, src AS source, m FROM p1
        |  UNION ALL SELECT 2, src, m FROM p2
        |  UNION ALL SELECT 3, src, m FROM p3)
        |SELECT CAST(round AS BIGINT) AS round, source,
        |  CAST(m AS BIGINT) AS marginal_new_grams,
        |  CAST(sum(m) OVER (ORDER BY round) AS BIGINT) AS covered_total
        |FROM u ORDER BY round""".stripMargin),
      "3-round submodular greedy max-coverage over source gram sets, oracle-unrolled"),

    // q210 — COMPACTION PLAN: per source, the file count a 1 MB-target
    // layout needs (ceil of total payload bytes over the target) — the
    // small-files planning pass a lakehouse runs before rewriting a
    // fragmented landing table (the planning complement of the ZOrder
    // layout q103 and bucketed writes). Pure algebraic fold; the
    // integer ceil is (b + t − 1) div t.
    Q("q210_compaction_plan",
      (s, d) => Tables(s, d, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("long")).as("total_chars"))
        .select(col("source"), col("n_docs"), col("total_chars"),
          expr("(total_chars + 999999) div 1000000").as("files_needed"))
        .orderBy("source"),
      Some("""SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST((sum(n_chars) + 999999) // 1000000 AS BIGINT)
        |    AS files_needed
        |FROM documents GROUP BY source ORDER BY source""".stripMargin),
      "per-source small-files compaction plan at a 1 MB target (integer ceil)"),

    // q211 — DUPLICATE PRESSURE per source: exact-text duplicate rate
    // in bp from one (source, text-hash) distinct pass — the cheap
    // triage that decides WHICH sources deserve the expensive near-dup
    // passes (q23/q24/q187). Hashing text before the distinct keeps
    // the shuffle at 8-byte keys (the q23 discipline).
    Q("q211_dup_pressure",
      (s, d) => {
        import graft.functions.TextFunctions.hash60
        val dd = Tables(s, d, "documents")
          .select(col("source"), hash60(col("text"), 0).as("h"))
        val per = dd.groupBy("source").agg(count(lit(1)).as("n_docs"))
        val uniq = dd.distinct().groupBy("source")
          .agg(count(lit(1)).as("n_unique"))
        per.join(uniq, "source")
          .select(col("source"), col("n_docs"), col("n_unique"),
            expr("(10000 * (n_docs - n_unique)) div n_docs").as("dup_bp"))
          .orderBy("source")
      },
      Some("""WITH h AS (SELECT source,
        |    CAST(('0x' || substring(md5('0#' || text), 1, 15)) AS BIGINT)
        |      AS hh
        |  FROM documents),
        |p AS (SELECT source, count(*) AS n_docs FROM h GROUP BY 1),
        |u AS (SELECT source, count(*) AS n_unique
        |  FROM (SELECT DISTINCT source, hh FROM h) GROUP BY 1)
        |SELECT p.source, CAST(p.n_docs AS BIGINT) AS n_docs,
        |  CAST(u.n_unique AS BIGINT) AS n_unique,
        |  CAST((10000 * (p.n_docs - u.n_unique)) // p.n_docs AS BIGINT)
        |    AS dup_bp
        |FROM p JOIN u USING (source) ORDER BY source""".stripMargin),
      "exact duplicate rate per source from one hashed distinct pass — near-dup triage"),

    // q223 — K-ANONYMITY / L-DIVERSITY audit: equivalence classes over
    // the (nation, market-segment) quasi-identifiers, the 20 riskiest
    // (smallest) classes with their distinct-sensitive-value count
    // (account-balance band, exact shifted cents div 100000 — the
    // +100000 shift keeps the operand non-negative so truncating div
    // and flooring // agree on negative balances). The privacy gate
    // next to the PII redaction pass: a class of size < k
    // re-identifies, a class with l_div = 1 leaks its sensitive value
    // at ANY size. One hash agg + TakeOrderedAndProject.
    Q("q223_k_anonymity",
      (s, d) => graft.operators.Curation.kAnonymityRisk(
        Tables(s, d, "customer"),
        quasi = Seq(col("c_nationkey").cast("long") -> "nat",
          col("c_mktsegment") -> "seg"),
        sensitive = expr(
          "(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) div 100000"),
        top = 20),
      Some("""WITH q AS (SELECT CAST(c_nationkey AS BIGINT) nat,
        |    c_mktsegment seg,
        |    (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000 AS sens
        |  FROM customer)
        |SELECT nat, seg, CAST(count(*) AS BIGINT) AS class_size,
        |  CAST(count(DISTINCT sens) AS BIGINT) AS l_div
        |FROM q GROUP BY 1, 2
        |ORDER BY class_size, nat, seg LIMIT 20""".stripMargin),
      "k-anonymity/l-diversity risk list — smallest quasi-identifier classes"),

    // q239 — DATA-CONTRACT audit: the declarative rule table a landing
    // zone evaluates before publishing a batch — range, enum,
    // referential, and a deliberately-too-strict enum rule so the
    // report carries a live failure (an all-green audit tests nothing).
    // Each rule is one conditional count over a shared scan (the
    // violation counts fold in ONE agg); the FK rule is a broadcast
    // anti-join count. Output: one row per rule, violations + verdict.
    Q("q239_data_contract",
      (s, d) => {
        val o = Tables(s, d, "orders")
        val custKeys = Tables(s, d, "customer").select(
          col("c_custkey").as("o_custkey"))
        val scanRules = o.agg(
          sum(when(col("o_totalprice") < 0, 1L).otherwise(0L))
            .as("totalprice_nonneg"),
          sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
            .otherwise(0L)).as("status_enum"),
          sum(when(col("o_orderdate") < "1992-01-01" ||
            col("o_orderdate") >= "1999-01-01", 1L).otherwise(0L))
            .as("orderdate_range"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("priority_strict"))
        val fk = o.join(broadcast(custKeys), Seq("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("custkey_fk"))
        val wide = scanRules.crossJoin(fk)
        val rules = Seq("custkey_fk", "orderdate_range", "priority_strict",
          "status_enum", "totalprice_nonneg")
        rules.map { r =>
          wide.select(lit(r).as("rule"),
            col(r).cast("long").as("violations"),
            (col(r) === 0).as("pass"))
        }.reduce(_ unionAll _).orderBy("rule")
      },
      Some("""WITH s AS (SELECT
        |    CAST(count(*) FILTER (o_totalprice < 0) AS BIGINT)
        |      AS totalprice_nonneg,
        |    CAST(count(*) FILTER (o_orderstatus NOT IN ('O','F','P'))
        |      AS BIGINT) AS status_enum,
        |    CAST(count(*) FILTER (o_orderdate < TIMESTAMP '1992-01-01'
        |      OR o_orderdate >= TIMESTAMP '1999-01-01') AS BIGINT)
        |      AS orderdate_range,
        |    CAST(count(*) FILTER (o_orderpriority NOT IN
        |      ('1-URGENT','2-HIGH')) AS BIGINT) AS priority_strict
        |  FROM orders),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS custkey_fk
        |  FROM orders o WHERE NOT EXISTS (
        |    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |SELECT rule, violations, violations = 0 AS pass FROM (
        |  SELECT 'custkey_fk' AS rule, custkey_fk AS violations FROM f
        |  UNION ALL SELECT 'orderdate_range', orderdate_range FROM s
        |  UNION ALL SELECT 'priority_strict', priority_strict FROM s
        |  UNION ALL SELECT 'status_enum', status_enum FROM s
        |  UNION ALL SELECT 'totalprice_nonneg', totalprice_nonneg FROM s)
        |ORDER BY rule""".stripMargin),
      "declarative data-contract audit — enum/range/FK rules, one scan + one anti-join"),

    // q242 — HBOS multivariate anomaly: rank documents by the PRODUCT
    // of their per-feature histogram-bin occupancies (chars × tokens ×
    // distinct-tokens, 16 equi-width bins each) — the exact integer
    // monotone of the histogram-based outlier score, no libm. MAD
    // (q122) flags univariate tails; HBOS flags the jointly-empty
    // corner a doc sits in even when every marginal looks ordinary.
    // One scan + three ≤16-row broadcast occupancy tables
    // (operators/Stats.hbosRarity) — the corpus is never shuffled.
    Q("q242_hbos_anomaly",
      (s, d) => {
        import graft.functions.TextFunctions.words
        val f = Tables(s, d, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"),
            length(col("text")).cast("long").as("f1"),
            size(words(col("text"))).cast("long").as("f2"),
            size(array_distinct(words(col("text")))).cast("long").as("f3"))
        graft.operators.Stats.hbosRarity(f, Seq("f1", "f2", "f3"), 16)
          .select(col("doc_id"), col("rarity").cast("long").as("rarity"),
            col("f1").as("n_chars"), col("f2").as("n_tokens"),
            col("f3").as("n_distinct"))
          .orderBy("rarity", "doc_id").limit(15)
      },
      Some("""WITH f AS (SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS f1,
        |    CAST(len(string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ')) AS BIGINT) AS f2,
        |    CAST(len(list_distinct(string_split(regexp_replace(
        |      lower(trim(text)), '\s+', ' ', 'g'), ' '))) AS BIGINT) AS f3
        |  FROM documents WHERE text IS NOT NULL),
        |s AS (SELECT min(f1) l1, max(f1) h1, min(f2) l2, max(f2) h2,
        |    min(f3) l3, max(f3) h3 FROM f),
        |b AS (SELECT doc_id, f1, f2, f3,
        |    ((f1 - l1) * 16) // (h1 - l1 + 1) AS b1,
        |    ((f2 - l2) * 16) // (h2 - l2 + 1) AS b2,
        |    ((f3 - l3) * 16) // (h3 - l3 + 1) AS b3
        |  FROM f, s),
        |c1 AS (SELECT b1, CAST(count(*) AS BIGINT) n1 FROM b GROUP BY 1),
        |c2 AS (SELECT b2, CAST(count(*) AS BIGINT) n2 FROM b GROUP BY 1),
        |c3 AS (SELECT b3, CAST(count(*) AS BIGINT) n3 FROM b GROUP BY 1)
        |SELECT doc_id, CAST(n1 * n2 * n3 AS BIGINT) AS rarity,
        |  f1 AS n_chars, f2 AS n_tokens, f3 AS n_distinct
        |FROM b JOIN c1 USING (b1) JOIN c2 USING (b2) JOIN c3 USING (b3)
        |ORDER BY rarity, doc_id LIMIT 15""".stripMargin),
      "HBOS multivariate anomaly — product of histogram occupancies, jointly-empty corners first"),

    // q245 — TOKEN-BUDGET curation: keep the highest-quality documents
    // (type-token ratio in exact bp) until 25% of the corpus's tokens
    // are spent — the data-mixing "best docs under budget" primitive.
    // The oracle is the textbook global cumulative-sum window; the
    // Spark side computes the IDENTICAL selection with no global sort:
    // per-quality-bin totals (≤ 10⁴+1 rows), a tiny bin-table window
    // for the cutoff, and an ordered prefix over the single boundary
    // bin only (operators/Curation.budgetSelect).
    Q("q245_budget_select",
      (s, d) => {
        import graft.functions.TextFunctions.words
        import graft.functions.IntMath
        val f = Tables(s, d, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), col("source"),
            size(words(col("text"))).cast("long").as("tokens"),
            size(array_distinct(words(col("text")))).cast("long").as("nd"))
          .withColumn("qbp", IntMath.bp(col("nd"), col("tokens")))
        Curation.budgetSelect(f, col("doc_id"), col("tokens"), col("qbp"),
            budgetNum = 1L, budgetDen = 4L)
          .join(f.select(col("doc_id").as("id"), col("source")), "id")
          .groupBy("source")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum("w").cast("long").as("sel_tokens"))
          .orderBy("source")
      },
      Some("""WITH f AS (SELECT doc_id, source,
        |    CAST(len(ws) AS BIGINT) AS tokens,
        |    CAST(len(list_distinct(ws)) AS BIGINT) AS nd
        |  FROM (SELECT doc_id, source,
        |      string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |        ' ') AS ws
        |    FROM documents WHERE text IS NOT NULL)),
        |q AS (SELECT doc_id, source, tokens,
        |    (2 * nd * 10000 + tokens) // (2 * tokens) AS qbp FROM f),
        |tot AS (SELECT CAST(sum(tokens) AS BIGINT) // 4 AS b FROM q),
        |sel AS (SELECT source, tokens,
        |    sum(tokens) OVER (ORDER BY qbp DESC, doc_id) AS cum FROM q)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tokens) AS BIGINT) AS sel_tokens
        |FROM sel, tot WHERE cum <= b GROUP BY 1 ORDER BY 1""".stripMargin),
      "token-budget curation — greedy best-quality selection without a global sort")
  )
}
