package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Corpus-curation operators for a training-data pipeline: rule-based
  * quality filtering (Gopher-style), token-window chunking (sequence
  * packing), deterministic hash-stratified sampling (data mixing),
  * pattern scrubbing (PII redaction), benchmark decontamination,
  * repetition-based quality signals, and deterministic train-shard
  * assignment.
  *
  * The filter/chunk/sample/redact operators are per-row expression work
  * over `org.apache.spark.sql.functions` — shuffle-free and linear; the
  * decontaminate/repetition/shard operators each need exactly one
  * key-shuffle (documented per method). Everything is replayable
  * bit-for-bit by the DuckDB oracles.
  */
object Curation {

  /** Gopher-style quality signals + keep decision (rule thresholds are
    * parameters; the published heuristics gate on word count, mean word
    * length, alphabetic-word fraction, and a minimum stop-word hit
    * count). Emits the signals alongside `keep` so downstream can audit
    * WHY a document was dropped — a filter that only returns survivors
    * makes corpus debugging impossible at 100 TB.
    *
    * The ratios (and the threshold comparisons on them) use EXACT
    * integer basis-point arithmetic — (2·num·10^4 + den) div (2·den)
    * is the true round-half-up of num/den, evaluated with Catalyst's
    * IntegralDivide (IntMath.bp) so no float enters the path — because
    * rounding a double-computed ratio flips across engines when a value
    * lands within 1 ulp of a rounding boundary, and a flipped 4th
    * decimal here flips `keep` whenever it touches a threshold. At
    * 100 TB that is not hypothetical: one-in-~15k docs hit a boundary
    * in testing.
    */
  def qualitySignals(df: DataFrame, id: Column, text: Column,
                     stopwords: Seq[String],
                     minWords: Int, maxWords: Int,
                     minMeanLen: Double, maxMeanLen: Double,
                     minAlphaFrac: Double, minStopHits: Int): DataFrame = {
    val ws = words(text)
    val nWords = size(ws).cast("long")
    val charSum = aggregate(transform(ws, w => length(w)), lit(0),
      (acc, x) => acc + x).cast("long")
    val alphaCnt = size(filter(ws, w => w.rlike("[a-z]"))).cast("long")
    val stopHits = size(filter(ws, w => w.isin(stopwords: _*)))
    val meanBp = graft.functions.IntMath.bp(charSum, nWords)
    val alphaBp = graft.functions.IntMath.bp(alphaCnt, nWords)
    df.select(
      id.as("doc_id"),
      nWords.cast("int").as("n_words"),
      (meanBp / 10000.0).as("mean_word_len"),
      (alphaBp / 10000.0).as("alpha_frac"),
      stopHits.as("stop_hits"),
      (nWords.between(minWords, maxWords) &&
        meanBp.between(math.round(minMeanLen * 10000),
          math.round(maxMeanLen * 10000)) &&
        alphaBp >= math.round(minAlphaFrac * 10000) &&
        stopHits >= minStopHits).as("keep"))
  }

  /** Token-window chunking: split each document into windows of
    * `chunkSize` whitespace tokens, starting every `chunkSize - overlap`
    * tokens. A tail window that would contribute no new tokens (i.e. it
    * lies entirely inside the previous window's overlap) is dropped.
    * Emits (doc_id, chunk_start [1-based token index], n_tokens, fp =
    * md5 of the space-joined window) — the shape a sequence-packing
    * stage consumes. Pure per-row explode: no shuffle, output rows ≈
    * corpus tokens / stride.
    */
  def chunkTokens(df: DataFrame, id: Column, text: Column,
                  chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap < chunkSize, "overlap must be smaller than chunkSize")
    val stride = chunkSize - overlap
    val ws = words(text)
    val n = size(ws)
    // null text → NULL starts → explode emits nothing. Without the
    // guard, greatest(NULL, 1) = 1 would fabricate a phantom all-NULL
    // window per null doc (caught by NullInputSpec).
    val starts = when(n.isNotNull,
      filter(sequence(lit(1), greatest(n, lit(1)), lit(stride)),
        s => s === lit(1) || s + lit(overlap) <= n))
    df.select(id.as("doc_id"), ws.as("ws"), explode(starts).as("chunk_start"))
      .select(
        col("doc_id"), col("chunk_start"),
        size(slice(col("ws"), col("chunk_start"), lit(chunkSize))).as("n_tokens"),
        md5(array_join(slice(col("ws"), col("chunk_start"), lit(chunkSize)), " "))
          .as("fp"))
  }

  /** Deterministic hash-stratified sampling for data mixing: keep a row
    * iff md5-hash(id) mod 1000 < the per-mille rate of its stratum.
    * Hash-gated (not `TABLESAMPLE`/rand()) so the sample is stable
    * across runs, engines, and partitionings — re-running the pipeline
    * reproduces the identical corpus, and adding data never flips the
    * decision for existing rows. Per-row filter, no shuffle.
    */
  def hashStratifiedSample(df: DataFrame, strata: Column, id: Column,
                           ratesPerMille: Map[String, Int],
                           defaultPerMille: Int, seed: Int): DataFrame = {
    val rate = ratesPerMille.foldLeft(lit(defaultPerMille)) {
      case (acc, (k, r)) => when(strata === lit(k), lit(r)).otherwise(acc)
    }
    df.filter(hash60(id.cast("string"), seed) % 1000 < rate)
  }

  /** Deterministic WEIGHTED bottom-k sampling per stratum (priority
    * sampling): each row draws the integer priority
    * hash60(id) div weight and the k smallest priorities per stratum
    * win — heavier rows draw stochastically smaller priorities, so
    * selection probability scales with `weight` while staying a pure
    * function of (id, weight): stable across runs, engines and
    * partitionings, like every sampler in this file (rand()-free). The
    * exact-integer priority makes the oracle replay bit-exact — no
    * pow/ln of the classic Efraimidis–Spirakis form, same bargain as
    * q100's integer BM25.
    *
    * Scale shape: priority is a per-row projection; the per-stratum
    * bottom-k is the same bounded-heap problem as `sourceQuota` — at
    * production scale route it through the TopKPerKey plan node
    * (partial heaps shuffle ≤ k rows per stratum·partition); the window
    * form here keeps the operator declarative and the plan readable at
    * one exchange on the stratum key.
    */
  def prioritySample(df: DataFrame, strata: Column, id: Column,
                     weight: Column, k: Int, seed: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "prioritySample needs k >= 1")
    df.select(strata.as("stratum"), id.as("id"),
        weight.cast("long").as("w"))
      .filter(col("w") > 0)
      .withColumn("h", hash60(col("id").cast("string"), seed))
      .withColumn("priority", expr("h div w"))
      .withColumn("rn", row_number().over(Window.partitionBy("stratum")
        .orderBy(col("priority"), col("id"))))
      .filter(col("rn") <= k)
      .select(col("stratum"), col("id"), col("w").as("weight"),
        col("priority"), col("rn").cast("long").as("rank_in_stratum"))
  }

  /** Pattern scrubbing (PII redaction shape): replace every match of
    * `pattern` with `token`, and report how many matches were scrubbed
    * per row so a downstream audit can spot anomalous densities. The
    * regex subset used by callers sticks to character classes +
    * quantifiers, which mean the same thing in Java regex and RE2, so
    * the DuckDB oracle replays it verbatim.
    */
  def redact(c: Column, pattern: String, token: String): (Column, Column) =
    (regexp_replace(c, pattern, token),
      size(regexp_extract_all(c, lit(pattern), lit(0))))

  /** Email/phone PII patterns — valid and identical in Java regex and
    * RE2 (character classes and bounded quantifiers only).
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+?[0-9][0-9() -]{6,}[0-9]"

  /** Benchmark decontamination: flag every corpus document sharing at
    * least one word n-gram with the benchmark/test set (the GPT-3-style
    * overlap rule). Output: (doc_id, n_hits = distinct overlapping
    * grams, min_gram = lexicographic min overlap, for audit).
    *
    * Scale shape: the benchmark side is test sets — thousands of
    * documents against a 100 TB corpus — so its distinct gram set is
    * BROADCAST; the corpus side streams through a map-side hash join
    * and the only shuffle is the per-doc hit aggregation (map-side
    * partial count/min). A hot gram cannot blow up: each corpus gram
    * probes the broadcast set once, and output is one row per doc.
    */
  def decontaminate(corpus: DataFrame, id: Column, text: Column,
                    bench: DataFrame, benchText: Column, n: Int): DataFrame = {
    val cg = Dedup.gramSets(corpus, id, text, n)
      .select(col("doc_id"), explode(col("grams")).as("gram"))
    val bg = Dedup.gramSets(bench, lit(0L), benchText, n)
      .select(explode(col("grams")).as("gram")).distinct()
    cg.join(broadcast(bg), "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"), min("gram").as("min_gram"))
  }

  /** Gopher repetition signals: fraction of the document accounted for
    * by its most frequent word and most frequent bigram (excessive
    * repetition = low-quality/generated text), plus the keep decision.
    * Documents with fewer than 2 words have NULL top_bigram_frac and
    * are not rejected on the bigram rule.
    *
    * Scale shape: two aggregations keyed on (doc_id, token) — both get
    * map-side partial counts, so the shuffles carry one row per
    * distinct token per doc, then collapse to one row per doc; the
    * final join is doc_id-keyed. Linear in corpus tokens.
    */
  def repetitionSignals(df: DataFrame, id: Column, text: Column,
                        maxTopWordFrac: Double,
                        maxTopBigramFrac: Double): DataFrame = {
    val ws = df.select(id.as("doc_id"), words(text).as("ws"))
    def topFrac(tokens: DataFrame, outName: String): DataFrame =
      tokens.groupBy("doc_id", "n", "t").agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"), col("n")).agg(max("c").as("top"))
        .select(col("doc_id"),
          round(col("top").cast("double") / col("n"), 4).as(outName))
    val uni = topFrac(ws.select(col("doc_id"), size(col("ws")).as("n"),
      explode(col("ws")).as("t")), "top_word_frac")
    val bi = topFrac(ws.select(col("doc_id"),
      graft.functions.WordGramsNative.gramsCol(col("ws"), 2).as("gs"))
      .filter(size(col("gs")) > 0)
      .select(col("doc_id"), size(col("gs")).as("n"),
        explode(col("gs")).as("t")), "top_bigram_frac")
    uni.join(bi, Seq("doc_id"), "left")
      .select(col("doc_id"), col("top_word_frac"), col("top_bigram_frac"),
        (col("top_word_frac") <= maxTopWordFrac &&
          coalesce(col("top_bigram_frac") <= maxTopBigramFrac,
            lit(true))).as("keep"))
  }

  /** Per-source quota cap (domain caps / source balancing): keep at
    * most `maxPerSource` documents per source, chosen by deterministic
    * md5-hash order — the curation step that stops a single crawled
    * domain from dominating the mix. Hash-gated like
    * `hashStratifiedSample`: re-runs, engines, and partitionings keep
    * the identical survivor set, and appending new data can only
    * displace rows with larger hashes, never reshuffle the order.
    *
    * Scale shape: runs on the custom TopKPerKey node, so at most
    * `maxPerSource` rows per (source, input partition) reach the
    * exchange — a 100x-hot domain ships its cap per partition, never
    * its full volume, and there is no per-source global sort.
    */
  def sourceQuota(df: DataFrame, id: Column, source: Column,
                  maxPerSource: Int, seed: Int): DataFrame = {
    val scored = df.select(id.as("doc_id"), source.as("source"),
      hash60(id.cast("string"), seed).as("h"))
    graft.plans.TopK.perKey(scored, Seq("source"), "h",
        desc = false, tiebreak = Seq("doc_id"), k = maxPerSource)
      .select("doc_id", "source")
  }

  /** Token-weighted source MIXTURE sampling — the data-mixing step that
    * sits between curation and training: downsample each source so the
    * surviving token counts sit in the ratio `parts` (integer mixture
    * weights), at the largest total the corpus can supply WITHOUT
    * upsampling any source. The feasible total is T = min_s(avail_s div
    * parts_s) — the binding source is kept (nearly) whole — and source s
    * keeps its hash-ordered document prefix whose running token sum fits
    * parts_s * T. All arithmetic is integral (IntegralDivide / long
    * sums), so both engines agree bit-for-bit. Hash-derived order, not
    * rand(): re-runs, engines, and partitionings keep the same
    * documents, and appended data only grows each prefix at its tail.
    * Sources absent from `parts` have weight 0 and are dropped.
    *
    * Output: surviving (doc_id, source, n_tokens, cum_tokens).
    *
    * Scale shape: one map-side-combined agg for per-source totals
    * (reduced to a single broadcast row), one window shuffle for the
    * per-source running sum. The window partitions by source — with few
    * giant sources that sort is the cost; at 100 TB swap the exact
    * prefix for the q52-style per-mille hash threshold (rate ≈
    * target/avail) and trade budget exactness for shuffle-freedom.
    */
  def mixtureSample(df: DataFrame, id: Column, text: Column,
                    source: Column, parts: Map[String, Int], seed: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(parts.nonEmpty && parts.values.forall(_ > 0),
      "mixture parts must be positive")
    val spark = df.sparkSession
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val partsDf = parts.toSeq.toDF("source", "parts")
    val base = df.select(id.as("doc_id"), source.as("source"),
        size(words(text)).cast("long").as("n_tokens"),
        hash60(id.cast("string"), seed).as("h"))
      .join(broadcast(partsDf), "source")
    val t = base.groupBy("source")
      .agg(sum("n_tokens").as("avail"), first("parts").as("p"))
      .agg(min(graft.functions.IntMath.intDiv(col("avail"),
        col("p").cast("long"))).as("t"))
    val w = Window.partitionBy("source").orderBy("h", "doc_id")
    base.crossJoin(broadcast(t))
      .withColumn("cum", sum("n_tokens").over(w))
      .filter(col("cum") <= col("parts").cast("long") * col("t"))
      .select(col("doc_id"), col("source"),
        col("n_tokens").cast("int").as("n_tokens"),
        col("cum").as("cum_tokens"))
  }

  /** Token-budget bin packing (sequence packing at the document grain):
    * documents are dealt into `numShards` hash-assigned shards, laid out
    * in deterministic hash order within each shard, and cut into bins of
    * `budget` tokens by START OFFSET — doc d lands in bin
    * floor(prefix_tokens_before_d / budget). This is the
    * concat-and-chunk packing a pretraining loader runs (bins fill to
    * the budget; the doc straddling a boundary belongs to the bin it
    * starts in, so a bin can overrun by at most one document — the
    * standard approximation; q51's window chunker handles the
    * within-document split). Hash-derived order, not rand(): re-runs,
    * engines, and partitionings produce identical bins, and appended
    * data never moves existing docs relative to each other.
    *
    * Output: (doc_id, shard, bin, n_tokens), one row per doc.
    *
    * Scale shape: ONE shuffle — the per-shard window (running token
    * sum over hash order). Like `trainShards`, numShards ≈ target
    * output files keeps each shard a single task's sort; bins never
    * shuffle separately (bin is arithmetic on the running sum).
    */
  def packTokenBudget(df: DataFrame, id: Column, text: Column,
                      budget: Int, numShards: Int, seed: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0 && numShards > 0, "budget and numShards must be positive")
    val n = size(words(text)).cast("long")
    val w = Window.partitionBy("shard").orderBy(col("h"), col("doc_id"))
    df.select(id.as("doc_id"), n.as("n_tokens"),
        hash60(id.cast("string"), seed).as("h"))
      .withColumn("shard", (col("h") % numShards).cast("int"))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("doc_id"), col("shard"),
        graft.functions.IntMath.intDiv(col("cum") - col("n_tokens"),
          lit(budget.toLong)).cast("int").as("bin"),
        col("n_tokens").cast("int").as("n_tokens"))
  }

  /** Corpus-trained bigram language-model quality score — the CCNet /
    * Gopher "perplexity filtering" step re-expressed without a float in
    * the path: the LM is the corpus's own bigram table, a document's
    * score is the exact round-half-up MEAN CONDITIONAL PROBABILITY of
    * its bigram occurrences in basis points (probability domain, not
    * log — transcendentals would reopen the q61 cross-engine-libm
    * class; the ranking signal is the same "how typical is this text of
    * the corpus" and boilerplate/gibberish separate identically), plus
    * the weakest-link minimum. P(w2|w1) = count(w1 w2) / count(w1 ·),
    * both counts from the full corpus, each occurrence weighted by its
    * in-document frequency.
    *
    * Output: (doc_id, n_bigrams, lm_score, min_prob) per doc with >= 2
    * tokens; scores in [0,1] at 4dp, exact in integer arithmetic.
    *
    * Scale shape: per-doc bigram counts first (groupBy(doc, gram) —
    * map-side combined, the shuffle carries distinct grams per doc, not
    * occurrences); the corpus tables re-aggregate FROM that compacted
    * form (gram-keyed and prefix-keyed shuffles over distinct grams);
    * scoring joins doc-grams to the two stat tables ON THE GRAM KEYS —
    * shuffle hash joins by design, since a 100 TB corpus's bigram
    * vocabulary does not broadcast; the final mean is one doc-keyed
    * agg. Every stage linear in distinct (doc, gram) pairs.
    */
  def bigramLmScore(df: DataFrame, id: Column, text: Column): DataFrame = {
    import graft.functions.IntMath
    val dg = df.select(id.as("doc_id"), words(text).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(graft.functions.WordGramsNative.gramsCol(col("ws"), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
    val gramStats = dg.groupBy("g").agg(sum("cnt").as("cg"))
    val prefixStats = dg
      .select(split(col("g"), " ").getItem(0).as("w1"), col("cnt"))
      .groupBy("w1").agg(sum("cnt").as("cp"))
    dg.join(gramStats, "g")
      .withColumn("w1", split(col("g"), " ").getItem(0))
      .join(prefixStats, "w1")
      .select(col("doc_id"), col("cnt"),
        IntMath.bp(col("cg"), col("cp")).as("bp"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n"), sum(col("cnt") * col("bp")).as("sbp"),
        min("bp").as("minbp"))
      .select(col("doc_id"), col("n").cast("int").as("n_bigrams"),
        (IntMath.intDiv(col("sbp") * 2L + col("n"), col("n") * 2L) / 10000.0)
          .as("lm_score"),
        (col("minbp") / 10000.0).as("min_prob"))
  }

  /** Deterministic stratified TRAIN/VAL/TEST split: every row gets a
    * split label from its id hash — train below `trainPerMille`, val
    * below `trainPerMille + valPerMille`, test otherwise — evaluated
    * independently per row, so the split is (a) disjoint and exhaustive
    * by construction, (b) stable under re-runs, engines, partitionings,
    * and appends (a new document never moves an old one), and
    * (c) stratified: the hash is uniform within every stratum, so each
    * source's ratio matches the global ratio in expectation without any
    * per-stratum bookkeeping. The eval sets of a 100 TB corpus must be
    * frozen this way — a rand() split reshuffles on every retry and
    * leaks eval docs into training.
    *
    * Scale shape: a pure per-row codegen'd expression — no shuffle, no
    * state, no stratum metadata.
    */
  def trainValTestSplit(df: DataFrame, id: Column,
                        trainPerMille: Int, valPerMille: Int,
                        seed: Int): DataFrame = {
    require(trainPerMille > 0 && valPerMille > 0 &&
      trainPerMille + valPerMille < 1000,
      "per-mille thresholds must be positive and sum below 1000")
    val gate = hash60(id.cast("string"), seed) % 1000
    df.withColumn("split",
      when(gate < trainPerMille, "train")
        .when(gate < trainPerMille + valPerMille, "val")
        .otherwise("test"))
  }

  /** LEAKAGE-FREE train/val/test split: the `trainValTestSplit` hash
    * gate applied to the doc's near-dup CLUSTER ROOT instead of the doc
    * itself, so every member of a near-dup cluster lands in the SAME
    * split — the guard against eval contamination, where a paraphrase
    * of a test document hides in train and silently inflates every
    * benchmark it touches. Docs absent from `clusters` are singletons
    * and key on their own id (identical to the plain split).
    *
    * `clusters` is any (doc_id, cluster_id) frame — e.g.
    * `Dedup.dupClusters` output. Scale shape: one doc-keyed equi-join
    * onto the (sparse) cluster table, then the same per-row codegen'd
    * gate as `trainValTestSplit` — no new shuffle beyond the join.
    */
  def leakageFreeSplit(df: DataFrame, id: Column, clusters: DataFrame,
                       trainPerMille: Int, valPerMille: Int,
                       seed: Int): DataFrame = {
    require(trainPerMille > 0 && valPerMille > 0 &&
      trainPerMille + valPerMille < 1000,
      "per-mille thresholds must be positive and sum below 1000")
    val gate = hash60(col("split_key").cast("string"), seed) % 1000
    df.withColumn("__sid", id)
      .join(clusters.select(col("doc_id").as("__sid"), col("cluster_id")),
        Seq("__sid"), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col("__sid")))
      .withColumn("split",
        when(gate < trainPerMille, "train")
          .when(gate < trainPerMille + valPerMille, "val")
          .otherwise("test"))
      .drop("__sid")
  }

  /** Deterministic global shuffle into training shards: shard =
    * hash60(id) % numShards; pos = rank of the hash within its shard.
    * Hash-derived, not rand() — re-runs, engines, and partitionings all
    * produce the identical order, and appending new data never moves
    * existing rows relative to each other within a shard.
    *
    * Scale shape: ONE shuffle (the per-shard window sort). Pick
    * numShards ≈ the target output file count so each shard is one
    * task's sort; a 100 TB corpus at 1 GB shards means ~100k shards,
    * each sorting ~100k rows — embarrassingly parallel.
    */
  def trainShards(df: DataFrame, id: Column,
                  numShards: Int, seed: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(id.as("doc_id"),
        hash60(id.cast("string"), seed).as("h"))
      .select(col("doc_id"), (col("h") % numShards).cast("int").as("shard"),
        col("h"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("h"), col("doc_id"))))
      .drop("h")
  }

  /** GREEDY COVERAGE source selection — the submodular facility-
    * location greedy behind coverage-driven data selection: each round
    * picks the source adding the most NOT-YET-COVERED distinct n-grams
    * (ties by source name), the classic (1 − 1/e)-approximation to
    * max-coverage. The answer "which `rounds` sources buy the most
    * vocabulary" is what a curation pipeline asks before allocating a
    * token budget across crawls.
    *
    * Greedy is INHERENTLY sequential in rounds; each round's work is
    * fully distributed (an anti-join against covered grams + one
    * per-source count) and only the single argmax ROW lands on the
    * driver — the same bounded-driver-data bargain as a broadcast
    * join, paid `rounds` times. Covered grams accumulate in a cached
    * union whose size is bounded by the vocabulary, not the corpus.
    * Marginal counts are disjoint by construction, so the running
    * coverage total is their prefix sum — no recount.
    *
    * Output: one row per round — (round, source, marginal_new_grams,
    * covered_total).
    */
  def greedyCoverage(df: DataFrame, source: Column, text: Column,
                     n: Int, rounds: Int): DataFrame = {
    require(rounds >= 1, "greedyCoverage needs rounds >= 1")
    val spark = df.sparkSession
    val g = df.select(source.cast("string").as("src"), words(text).as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("src"),
        explode(graft.functions.WordGramsNative.gramsCol(col("ws"), n))
          .as("gram"))
      .distinct()
      .cache()
    var covered: DataFrame = null
    var picks = Vector.empty[(Int, String, Long, Long)]
    var total = 0L
    for (r <- 1 to rounds) {
      val remaining =
        if (covered == null) g else g.join(covered, Seq("gram"), "left_anti")
      val top = remaining.groupBy("src")
        .agg(count(lit(1)).as("marginal"))
        .orderBy(col("marginal").desc, col("src"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val (src, marginal) = (top.head.getString(0), top.head.getLong(1))
        total += marginal
        picks :+= ((r, src, marginal, total))
        val newCov = g.filter(col("src") === src).select("gram")
        covered =
          (if (covered == null) newCov else covered.unionAll(newCov))
            .distinct().cache()
      }
    }
    import spark.implicits._
    picks.toDF("round", "source", "marginal_new_grams", "covered_total")
      .select(col("round").cast("long").as("round"), col("source"),
        col("marginal_new_grams"), col("covered_total"))
  }

  /** K-ANONYMITY / L-DIVERSITY risk audit (Sweeney 2002; Machanavajjhala
    * 2007) — the privacy sibling of the PII redaction pass above: group
    * records into equivalence classes by their QUASI-IDENTIFIER columns
    * and report, per class, its size (k-anonymity: a class of size < k
    * re-identifies its members) and the number of DISTINCT sensitive
    * values it holds (l-diversity: a class where everyone shares one
    * sensitive value leaks it even at safe k). Output = the `top`
    * riskiest (smallest) classes, the list a release gate suppresses or
    * generalizes before publishing.
    *
    * Scale shape: one hash agg on the quasi-identifier tuple computes
    * size and distinct-sensitive together; the risk list is a
    * TakeOrderedAndProject. Nothing data-sized leaves the agg.
    */
  def kAnonymityRisk(df: DataFrame, quasi: Seq[(Column, String)],
                     sensitive: Column, top: Int): DataFrame = {
    require(quasi.nonEmpty, "kAnonymityRisk needs >= 1 quasi-identifier")
    val qCols = quasi.map { case (c, n) => c.as(n) }
    val qNames = quasi.map(_._2)
    df.select((qCols :+ sensitive.as("__sens")): _*)
      .groupBy(qNames.map(col): _*)
      .agg(count(lit(1)).cast("long").as("class_size"),
        countDistinct("__sens").cast("long").as("l_div"))
      .orderBy((col("class_size") +: qNames.map(col)): _*)
      .limit(top)
  }

  /** BUDGET-CONSTRAINED greedy selection: rows in (quality desc, id
    * asc) order while the running weight total stays within budget =
    * (Σweight · budgetNum) div budgetDen — the "best docs until the
    * token budget runs out" curation primitive.
    *
    * Semantically identical to a global cumulative-sum window, but
    * computed WITHOUT a global sort of the corpus: per-quality-value
    * bins aggregate their weight (bounded by the quality domain — bp
    * scores give ≤ 10⁴+1 bins), a tiny descending window over the bin
    * table finds the fully-included bins and THE one boundary bin, and
    * only boundary-bin rows (one quality value) pay an ordered prefix
    * window. At 100 TB the corpus-sized stages are one groupBy(quality)
    * with map-side combine and two broadcast semi-joins; nothing global
    * ever sees more than one bin.
    *
    * Returns the selected rows as (id, w, q). Budget arithmetic is
    * exact-integer; weights must be non-negative longs.
    */
  def budgetSelect(df: DataFrame, id: Column, weight: Column,
                   quality: Column, budgetNum: Long,
                   budgetDen: Long): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0, "budget must be a ratio >= 0")
    import org.apache.spark.sql.expressions.Window
    val f = df.select(id.as("id"), weight.cast("long").as("w"),
      quality.cast("long").as("q"))
    val budget = f.agg(
      expr(s"(sum(w) * $budgetNum) div $budgetDen").as("b"))
    // ≤ |quality domain| rows: the window is driver-scale by contract.
    val bins = f.groupBy("q").agg(sum("w").as("qt"))
      .crossJoin(broadcast(budget))
      .withColumn("cum", sum("qt").over(Window.orderBy(col("q").desc)))
    val full = bins.filter(col("cum") <= col("b")).select("q")
    val boundary = bins
      .filter(col("cum") > col("b") && col("cum") - col("qt") < col("b"))
      .select(col("q"), (col("b") - (col("cum") - col("qt"))).as("rem"))
    val selFull = f.join(broadcast(full), "q")
    // One quality value's rows: the unpartitioned window is bin-bounded.
    val selBoundary = f.join(broadcast(boundary), "q")
      .withColumn("c2", sum("w").over(
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .filter(col("c2") <= col("rem"))
      .select("q", "id", "w")
    selFull.select("id", "w", "q")
      .unionAll(selBoundary.select("id", "w", "q"))
  }
}
