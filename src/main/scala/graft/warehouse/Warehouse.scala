package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The warehouse layer (reference: Snowflake `<CHANNEL>_RAW` tables,
  * truncate+reload with auto-create fallback —
  * /root/reference/dags/extract.py:156-171, W2/W3).
  *
  * Spark mapping: `mode("overwrite").saveAsTable` is truncate+reload and
  * auto-create in one idempotent operation; the catalog replaces
  * Snowflake's information schema.
  */
object Warehouse {

  /** W2: truncate + insert (or auto-create on first load). */
  def loadRaw(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").format("parquet").saveAsTable(table)

  /** W3: the optimized_extract.py:106-107 variant — head(5) + append w/
    * auto-create. Preserved as a labeled variant (its 5-row truncation is
    * reference behavior, not something to generalize).
    */
  def loadRawHead5(df: DataFrame, table: String): Unit =
    df.limit(5).write.mode("append").format("parquet").saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
