package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.Ingest

/** The lake layer (reference: per-channel S3 CSV objects, one prefix per
  * channel, logical append implemented as read-concat-rewrite —
  * /root/reference/dags/extract.py:114-129, W1/S2/S3).
  *
  * Spark-first redesign: a single parquet dataset partitioned by
  * channel_key with `mode("append")` — the sink IS the accumulated state,
  * so the reference's read-modify-write round trip (and its bare-except
  * data-loss hazard) disappears. Partition pruning gives the per-channel
  * read the reference got from key prefixes. At 100 TB: append-only
  * columnar files per partition, no rewrite amplification.
  */
object Lake {

  /** W1: append a batch, partitioned by derived channel key. */
  def appendBatch(batch: DataFrame, path: String): Unit =
    batch
      .withColumn("channel_key", Ingest.channelKey(col("title")))
      .write.mode("append").partitionBy("channel_key").parquet(path)

  /** S2/S3: read the whole lake (or one channel via partition pruning). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readChannel(spark: SparkSession, path: String, channelKey: String): DataFrame =
    read(spark, path).filter(col("channel_key") === channelKey)

  /** Channel discovery (reference: s3.list_objects, extract.py:158-159)
    * — here: the partition values, resolved from directory listing only
    * (no data scan).
    */
  def channels(spark: SparkSession, path: String): Seq[String] =
    read(spark, path).select("channel_key").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
}
