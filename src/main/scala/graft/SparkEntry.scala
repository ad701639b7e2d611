package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query inventory lives in graft.queries.QueryPack: one entry per
  * operator from SURVEY.md §2 plus the LLM-pipeline extensions (dedup,
  * ANN, text analysis, multimodal), each paired with equivalent DuckDB
  * SQL where expressible.
  */
object SparkEntry {

  /** Flagship: the reference mart semantics (cast-projection per channel
    * slice + UNION ALL, SURVEY §2.2 P8 / §2.5 U1) on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_mart_cast_union")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.QueryPack.queries

  def oracleSql: Map[String, String] =
    graft.queries.QueryPack.oracleSql
}
