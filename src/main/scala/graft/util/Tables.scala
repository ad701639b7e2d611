package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table access. One parquet file per table under the scale-factor
  * dir (see TESTDATA.md). Reads are plain `spark.read.parquet` so Catalyst
  * gets vectorized scans + pushdown; at cluster scale the same call works
  * on a directory of many files.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
  * vectorized reader rejects; we read it via the nanosAsLong fallback and
  * truncate to microseconds (Spark's native timestamp precision — DuckDB
  * applies the same ns->us truncation when casting to TIMESTAMP).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
