package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding merge LEARNING — the tokenizer-training primitive
  * of every LLM data pipeline (Sennrich et al., ACL'16), distributed the
  * way SentencePiece's Spark ports do it: the corpus collapses ONCE to a
  * frequency-weighted vocabulary (Zipf guarantees vocab ≪ corpus), and
  * every merge round runs over the vocabulary only — pair counting is a
  * frequency-weighted aggregate, the winning pair is a 1-row broadcast,
  * and applying the merge is a per-row string rewrite. No round ever
  * rescans the corpus and nothing reaches the driver.
  *
  * Determinism contract (the repo's replayable-oracle bargain): a word's
  * symbol sequence is encoded as a DOUBLE-spaced string with single
  * flanking pads — `"  " + chars.join("  ")` — so a pair (x, y) is the
  * literal substring `" x  y "` and a plain leftmost-non-overlapping
  * `replace` (identical semantics in Spark and DuckDB) consumes one
  * space of each flanking separator, leaving one behind. Adjacent
  * matches therefore stay matchable: a run of four `a`s merges to
  * `[aa, aa]` exactly as greedy left-to-right BPE does — the
  * single-space encoding would get this wrong (`[aa, a, a]`) because
  * the first replacement eats the boundary the second needs. Winner
  * tie-break is (weighted count DESC, pair ASC).
  *
  * Each round's vocabulary is persisted: round r's sequences are built
  * by r chained rewrites, and without the persist both the pair-count
  * aggregate AND every later round would replay the whole rewrite
  * lineage from the corpus scan (the q180 PageRank lesson — O(r²)
  * re-execution, plus r extra corpus scans through the winner
  * broadcasts).
  */
object Bpe {

  /** Encode a word as the doubled-separator character-symbol string:
    * "low" → "  l  o  w  ". One regex pass per word.
    */
  private def encodeSeq(word: org.apache.spark.sql.Column) =
    concat(lit("  "), regexp_replace(word, "(.)", "$1  "))

  /** Learn `rounds` BPE merges over a (word, freq) vocabulary.
    *
    * @param vocab DataFrame with columns `wd` (string, space-free) and
    *              `f` (long weight — corpus frequency of the word)
    * @return one row per merge round: (merge_round int, pair string —
    *         the two symbols space-joined, n long — the pair's weighted
    *         corpus count when it won), ordered by merge_round
    */
  def learnMerges(vocab: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "learnMerges needs at least one round")
    var seqs = vocab.select(col("f"), encodeSeq(col("wd")).as("seq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cached = scala.collection.mutable.ArrayBuffer(seqs)
    var winners = Vector.empty[DataFrame]
    for (r <- 1 to rounds) {
      val pairs = seqs
        .select(col("f"),
          explode(graft.functions.WordGramsNative.gramsCol(
            split(trim(col("seq")), " +"), 2)).as("pair"))
        .groupBy("pair").agg(sum("f").as("n"))
      val winner = pairs.orderBy(desc("n"), col("pair")).limit(1)
      winners :+= winner.select(lit(r).as("merge_round"), col("pair"),
        col("n").cast("long").as("n"))
      if (r < rounds) {
        seqs = seqs.crossJoin(broadcast(winner.select(col("pair"))))
          .withColumn("seq", replace(col("seq"),
            concat(lit(" "), regexp_replace(col("pair"), " ", "  "),
              lit(" ")),
            concat(lit(" "), regexp_replace(col("pair"), " ", ""),
              lit(" "))))
          .select(col("f"), col("seq"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        cached += seqs
      }
    }
    val out = winners.reduce(_.unionAll(_)).orderBy("merge_round")
      .localCheckpoint(eager = true)
    cached.foreach(_.unpersist(blocking = false))
    out
  }
}
