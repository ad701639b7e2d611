package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming exact deduplication — the incremental twin of the batch
  * `Dedup.exact` path (SURVEY §2.9 extension): an at-least-once ingest
  * feed (the reference's S3 pickup re-delivers objects on retry,
  * /root/reference/dags/extract.py:158-166) is reduced to exactly-once
  * rows before it ever reaches the lake.
  *
  * `dropDuplicatesWithinWatermark` keys the dedup state by the id column
  * and EVICTS state older than the watermark — the property that makes
  * streaming dedup viable at 100 TB/day: unbounded-key dedup state grows
  * forever, but re-deliveries happen within minutes, so a short
  * watermark bounds state to (arrival rate × delay) keys. State is
  * hash-partitioned by key across executors; no driver involvement.
  */
object StreamingDedup {

  /** Drop re-delivered events by the (composite) `idCols` key, holding
    * per-key state only within `delay` of the event-time watermark.
    */
  def dedup(events: DataFrame, idCols: Seq[String], tsCol: String,
            delay: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(idCols)

  /** File-source → dedup → append parquet sink with checkpointing:
    * exactly-once output rows from at-least-once input files.
    */
  def run(spark: SparkSession, srcDir: String, schema: StructType,
          idCol: String, tsCol: String, delay: String,
          outDir: String, checkpointDir: String,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    dedup(spark.readStream.schema(schema).parquet(srcDir), Seq(idCol), tsCol,
        delay)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
}
