package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (where SQL can
  * express it) the equivalent ANSI SQL the driver replays in DuckDB on
  * the same parquet tables. Column names/types and row ORDER must match
  * the oracle exactly — the driver hash-compares after sorting columns
  * by name.
  *
  * Determinism rules every Q follows:
  *  - output ends with a total ORDER BY on a unique key combination;
  *  - floating-point results of arithmetic are `round(x, n)` on BOTH
  *    sides (raw column passthrough is left unrounded — identical bits);
  *  - DuckDB `CAST` errors where Spark `cast` yields NULL, so oracles use
  *    TRY_CAST wherever malformed input is possible (SURVEY §7.4).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryPack {
  lazy val all: Seq[Q] =
    Relational.qs ++ JoinQueries.qs ++ DedupQueries.qs ++
      SimilarityQueries.qs ++ TextQueries.qs ++ MultimodalQueries.qs ++
      PipelineQueries.qs ++ CurationQueries.qs ++ AnalyticsQueries.qs ++
      GraphStatsQueries.qs

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
