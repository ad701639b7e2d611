package graft.mart

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas.YtFact

/** The mart: YT_Facts_stg (/root/reference/dags/dbt/dbt_ytanalytics/
  * models/marts/YT_Facts_stg.sql:3-115) — per-channel cast-projection
  * CTEs (P8) + 7-way UNION ALL (U1), materialized as a table (W5).
  *
  * Plan shape: Union(N x Project(Cast..., Scan)) — shuffle-free; Catalyst
  * collapses the staging identity views (W4) into the scans
  * (CollapseProject) and prunes columns through the union
  * (PushProjectionThroughUnion). At 100 TB this is a pure map pipeline.
  *
  * Cast semantics: Snowflake `::int` ERRORS on malformed strings; Spark 4
  * ANSI cast also errors; we use try_cast (NULL on malformed) because the
  * pipeline's job is load-tolerant ingest — documented divergence, and
  * what the DuckDB TRY_CAST oracle checks (SURVEY §7.4).
  */
object YtFacts {

  val tableName = "yt_facts_stg"

  /** The 10-column cast projection applied to each staging view
    * (YT_Facts_stg.sql:3-12; types per SURVEY §1.2 — counts as LongType
    * since YouTube view counts overflow 32-bit).
    */
  def castProject(staging: DataFrame): DataFrame =
    staging.select(
      col("title").cast("string").as("title"),
      col("customUrl").cast("string").as("customUrl"),
      expr("try_cast(publishedAt as timestamp)").as("PublishedAt"),
      col("url").cast("string").as("url_"),
      col("country").cast("string").as("Country"),
      expr("try_cast(viewCount as long)").as("view_count"),
      expr("try_cast(subscriberCount as long)").as("subscriberCount"),
      expr("try_cast(videoCount as long)").as("videoCount"),
      expr("try_cast(madeForKids as boolean)").as("madeForKids"),
      col("timestamp").cast("timestamp").as("timestamp"))

  /** U1: positional UNION ALL over the per-channel projections (all CTEs
    * project the identical column list, so positional == by-name).
    */
  def build(stagings: Seq[DataFrame]): DataFrame =
    stagings.map(castProject).reduce(_ union _)

  def typed(spark: SparkSession, mart: DataFrame): Dataset[YtFact] = {
    import spark.implicits._
    mart.as[YtFact]
  }

  /** W5: CTAS full rebuild each run (dbt `materialized: table`). */
  def materialize(mart: DataFrame, table: String = tableName): Unit =
    mart.write.mode("overwrite").format("parquet").saveAsTable(table)
}
