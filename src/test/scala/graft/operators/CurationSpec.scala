package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit-level curation semantics on hand-built corpora (the oracle gate
  * covers the full operators at sf0.01; these pin the edge cases and the
  * invariants the oracles cannot express).
  */
class CurationSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val stop = Seq("the", "a", "of")

  test("qualitySignals: word-count bounds gate keep") {
    val d = docs(
      1L -> "the quick brown fox jumps over a lazy dog of note", // 11 words
      2L -> "too short")
    val got = Curation.qualitySignals(d, col("doc_id"), col("text"), stop,
        minWords = 5, maxWords = 100, minMeanLen = 2.0, maxMeanLen = 8.0,
        minAlphaFrac = 0.9, minStopHits = 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(got === Map(1L -> true, 2L -> false))
  }

  test("chunkTokens: windows cover every token exactly, stride apart") {
    // 70 tokens, chunkSize 32, overlap 8 -> starts 1, 25, 49 (73 would
    // add nothing: it lies inside the previous window's overlap)
    val text = (1 to 70).map(i => s"w$i").mkString(" ")
    val rows = Curation.chunkTokens(docs(1L -> text), col("doc_id"),
        col("text"), chunkSize = 32, overlap = 8)
      .orderBy("chunk_start").collect()
    assert(rows.map(_.getInt(1)).toSeq === Seq(1, 25, 49))
    assert(rows.map(_.getInt(2)).toSeq === Seq(32, 32, 22))
    // coverage: last window reaches token 70; consecutive windows overlap
    assert(49 + 22 - 1 === 70)
  }

  test("chunkTokens: doc shorter than one window emits a single chunk") {
    val rows = Curation.chunkTokens(docs(1L -> "a b c"), col("doc_id"),
        col("text"), chunkSize = 32, overlap = 8).collect()
    assert(rows.length === 1)
    assert(rows.head.getInt(1) === 1 && rows.head.getInt(2) === 3)
  }

  test("hashStratifiedSample is deterministic and respects per-stratum rates") {
    import spark.implicits._
    val d = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    def run() = Curation.hashStratifiedSample(d, col("lang"), col("doc_id"),
      Map("en" -> 0, "zh" -> 1000), defaultPerMille = 500, seed = 7)
    assert(run().collect().toSet === run().collect().toSet)
    val langs = run().groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!langs.contains("en"))    // rate 0 drops everything
    assert(langs("zh") === 1000L)    // rate 1000 keeps everything
  }

  test("redact scrubs emails and phones and counts matches") {
    import spark.implicits._
    val d = Seq("mail bob@x.org or sue@y.io, call +1 555 0123 now")
      .toDF("t")
    val (noEmail, nEmails) =
      Curation.redact(col("t"), Curation.emailPattern, "<EMAIL>")
    val (clean, nPhones) =
      Curation.redact(noEmail, Curation.phonePattern, "<PHONE>")
    val r = d.select(clean, nEmails, nPhones).head()
    assert(r.getString(0) === "mail <EMAIL> or <EMAIL>, call <PHONE> now")
    assert(r.getInt(1) === 2 && r.getInt(2) === 1)
  }

  test("decontaminate flags only docs sharing an n-gram with the bench set") {
    val corpus = docs(
      1L -> "alpha beta gamma delta",  // shares "alpha beta gamma"
      2L -> "one two three four")      // disjoint
    val bench = docs(100L -> "zz alpha beta gamma yy")
    val got = Curation.decontaminate(corpus, col("doc_id"), col("text"),
      bench, col("text"), n = 3).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L))
    // shared distinct 3-grams of doc 1 with bench: "alpha beta gamma" only
    assert(got.head.getLong(1) === 1L)
    assert(got.head.getString(2) === "alpha beta gamma")
  }

  test("repetitionSignals: repetitive doc rejected, varied doc kept") {
    val d = docs(
      1L -> "spam spam spam spam spam ham",          // top word 5/6
      2L -> "one two three four five six seven eight")
    val got = Curation.repetitionSignals(d, col("doc_id"), col("text"),
        maxTopWordFrac = 0.5, maxTopBigramFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got === Map(1L -> false, 2L -> true))
  }

  test("repetitionSignals: single-word doc has NULL bigram frac, word rule decides") {
    val got = Curation.repetitionSignals(docs(1L -> "solo"), col("doc_id"),
      col("text"), maxTopWordFrac = 0.5, maxTopBigramFrac = 0.5).head()
    assert(got.isNullAt(2))
    assert(!got.getBoolean(3)) // top_word_frac = 1.0 > 0.5
  }

  test("trainShards: every doc assigned once, positions dense per shard") {
    import spark.implicits._
    val d = (0L until 500L).toDF("doc_id")
    val got = Curation.trainShards(d, col("doc_id"), numShards = 4, seed = 1)
      .collect()
    assert(got.length === 500)
    assert(got.map(_.getLong(0)).toSet === (0L until 500L).toSet)
    got.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      val pos = rows.map(_.getInt(2)).sorted
      assert(pos.toSeq === (1 to rows.length)) // dense 1..k per shard
    }
    // determinism: a second run yields the identical assignment
    val again = Curation.trainShards(d, col("doc_id"), numShards = 4, seed = 1)
      .collect()
    assert(got.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet ===
      again.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet)
  }

  test("packTokenBudget: start-offset binning matches a Scala reference") {
    val d = docs(
      1L -> "a b c d e", 2L -> "f g h", 3L -> "i j k l",
      4L -> "m n", 5L -> "o p q r s t")
    val got = Curation.packTokenBudget(d, col("doc_id"), col("text"),
        budget = 6, numShards = 1, seed = 17)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1)
    // replay: hash order, running sum, bin = prefix // budget.
    // hash60 reference = first 15 hex chars of md5("seed#id") as a long
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString.take(15), 16)
    val hashes = got.map(_._1).map(id => id -> h60(s"17#$id")).toMap
    val order = got.sortBy(r => (hashes(r._1), r._1))
    var prefix = 0L
    val wantBins = order.map { r =>
      val bin = (prefix / 6).toInt; prefix += r._4; r._1 -> bin
    }.toMap
    got.foreach { r =>
      assert(r._2 === 0) // single shard
      assert(r._3 === wantBins(r._1))
    }
    assert(got.map(_._4).toSeq === Seq(5, 3, 4, 2, 6))
  }

  test("packTokenBudget: bins are contiguous from 0 within every shard") {
    val d = graft.util.Tables(spark, "/root/testdata/sf0.001", "documents")
    val got = Curation.packTokenBudget(d, col("doc_id"), col("text"),
      budget = 500, numShards = 4, seed = 17)
    val perShard = got.groupBy("shard")
      .agg(min("bin").as("lo"), max("bin").as("hi"),
        countDistinct("bin").as("nbins"))
      .collect()
    perShard.foreach { r =>
      assert(r.getInt(1) === 0)                       // first bin is 0
      assert(r.getLong(3) === r.getInt(2) + 1L)       // no gaps
    }
    // every doc lands exactly once
    assert(got.count() === d.count())
  }

  test("mixtureSample: per-source kept tokens fit parts*T") {
    val d = graft.util.Tables(spark, "/root/testdata/sf0.001", "documents")
    val parts = (0 until 20).map(i => s"src$i" -> (i % 3 + 1)).toMap
    val got = Curation.mixtureSample(d, col("doc_id"), col("text"),
      col("source"), parts, seed = 23)
    // recompute the feasible total T from the full corpus
    val availRows = d.select(col("source"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("avail")).collect()
    val t = availRows.map(r => r.getLong(1) / parts(r.getString(0))).min
    got.groupBy("source").agg(sum("n_tokens").as("kept")).collect()
      .foreach { r =>
        assert(r.getLong(1) <= parts(r.getString(0)).toLong * t,
          s"source ${r.getString(0)} over budget")
      }
    val kept = got.count()
    assert(kept > 0 && kept < d.count())
  }

  test("mixtureSample: deterministic; sources outside the mixture drop") {
    val d = graft.util.Tables(spark, "/root/testdata/sf0.001", "documents")
    val parts = Map("src0" -> 1, "src1" -> 2) // other 18 sources dropped
    def run() = Curation.mixtureSample(d, col("doc_id"), col("text"),
      col("source"), parts, seed = 23)
    assert(run().collect().map(_.toString).sorted.toSeq ===
      run().collect().map(_.toString).sorted.toSeq)
    val srcs = run().select("source").distinct()
      .collect().map(_.getString(0)).toSet
    assert(srcs.nonEmpty && srcs.subsetOf(Set("src0", "src1")))
  }

  test("sourceQuota caps each source deterministically") {
    import spark.implicits._
    // 3 sources x 10 docs; cap 4 → 12 survivors, stable across runs
    val d = (0L until 30L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "src")
    val got = Curation.sourceQuota(d, col("doc_id"), col("src"),
      maxPerSource = 4, seed = 5).collect()
    assert(got.length === 12)
    got.groupBy(_.getString(1)).foreach { case (_, rows) =>
      assert(rows.length === 4)
    }
    val again = Curation.sourceQuota(d, col("doc_id"), col("src"),
      maxPerSource = 4, seed = 5).collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSet ===
      again.map(r => (r.getLong(0), r.getString(1))).toSet)
    // a source under its cap survives whole
    val small = Curation.sourceQuota(d.filter(col("doc_id") < 3),
      col("doc_id"), col("src"), maxPerSource = 4, seed = 5).collect()
    assert(small.length === 3)
  }

  test("prioritySample: k per stratum, ranked by priority, deterministic") {
    import spark.implicits._
    val d = (1L to 40L).map(i => (i, s"s${i % 2}", 100L + i)).toDF("id", "g", "w")
    def run() = Curation.prioritySample(d, col("g"), col("id"), col("w"),
      k = 3, seed = 11).orderBy("stratum", "rank_in_stratum").collect()
    val got = run()
    assert(got.length === 6, "3 per each of 2 strata")
    got.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val prios = rows.sortBy(_.getLong(4)).map(_.getLong(3))
      assert(prios.sorted.toSeq === prios.toSeq,
        "rank order must follow ascending priority")
    }
    assert(got.map(_.toSeq).toSeq === run().map(_.toSeq).toSeq)
  }

  test("prioritySample: non-positive weights are excluded, never divide") {
    import spark.implicits._
    val d = Seq((1L, "a", 0L), (2L, "a", -5L), (3L, "a", 7L))
      .toDF("id", "g", "w")
    val got = Curation.prioritySample(d, col("g"), col("id"), col("w"),
      k = 5, seed = 1).collect()
    assert(got.map(_.getLong(1)).toSet === Set(3L))
  }

  test("sourceQuota plans on TopKPerKey, not a row_number window") {
    import spark.implicits._
    val d = (0L until 30L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "src")
    val plan = Curation.sourceQuota(d, col("doc_id"), col("src"),
      maxPerSource = 4, seed = 5).queryExecution.executedPlan.toString
    assert("TopKPerKey ".r.findAllIn(plan).size === 2, plan) // partial+final
    assert(!plan.contains("Window ["), plan)
  }

  test("greedyCoverage: marginal gains shrink, ties break by source name") {
    import spark.implicits._
    // a: 5 grams; b: 5 grams, 3 shared with a -> marginal 2;
    // c: 2 fresh grams -> marginal 2, tied with b -> b wins round 2
    val d = Seq(
      ("a", "w1 w2 w3 w4 w5 w6 w7"),
      ("b", "w3 w4 w5 w6 w7 w8 w9"),
      ("c", "x1 x2 x3 x4"))
      .toDF("source", "text")
    val got = Curation.greedyCoverage(d, col("source"), col("text"),
        n = 3, rounds = 3).orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === Seq((1L, "a", 5L, 5L), (2L, "b", 2L, 7L),
      (3L, "c", 2L, 9L)))
  }

  test("kAnonymityRisk: smallest classes first, distinct sensitive counted per class") {
    import spark.implicits._
    val d = Seq(
      ("NY", "gold", 100L), ("NY", "gold", 100L), ("NY", "gold", 200L),
      ("LA", "gold", 300L),                       // size-1 class
      ("NY", "base", 100L), ("NY", "base", 100L)) // l_div = 1 leak
      .toDF("city", "tier", "salary")
    val got = Curation.kAnonymityRisk(d,
        quasi = Seq(col("city") -> "city", col("tier") -> "tier"),
        sensitive = col("salary"), top = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq(("LA", "gold", 1L, 1L), ("NY", "base", 2L, 1L),
      ("NY", "gold", 3L, 2L)))
  }

  test("budgetSelect: equals the global greedy cumsum, boundary bin split") {
    import spark.implicits._
    // total w = 9; quality bins: q10 = {1,2} (w 3+3), q5 = {3 w1, 5 w2},
    // q1 = {4 w0... keep positive} -> use w1
    val d = Seq((1L, 3L, 10L), (2L, 3L, 10L), (3L, 1L, 5L),
      (5L, 2L, 5L), (4L, 1L, 1L)).toDF("id", "w", "q")
    def sel(num: Long, den: Long): Set[Long] =
      Curation.budgetSelect(d, col("id"), col("w"), col("q"), num, den)
        .select("id").as[Long].collect().toSet
    // budget = 10*8/10 = 8: q10 full (cum 6), boundary q5 rem 2 ->
    // id 3 (c2=1) in, id 5 (c2=3) out
    assert(sel(8L, 10L) === Set(1L, 2L, 3L))
    // budget = 6: q10 exactly fits, boundary rem 0 -> nothing partial
    assert(sel(6L, 10L) === Set(1L, 2L))
    // budget = 9: q5 fully included (cum 9), q1 boundary rem 0
    assert(sel(9L, 10L) === Set(1L, 2L, 3L, 5L))
    // budget = everything
    assert(sel(1L, 1L) === Set(1L, 2L, 3L, 4L, 5L))
  }
}
