package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** §2.9 extension: streaming exact dedup must reduce an at-least-once
  * feed to the batch dropDuplicates answer, with state bounded by the
  * watermark.
  */
class StreamingDedupSpec extends SparkSpec {

  private def eventsBatch = graft.util.Tables(
    spark, "/root/testdata/sf0.001", "events")

  test("re-delivered files dedup to the batch dropDuplicates answer") {
    val src = scratch("sdedup_src")
    val out = scratch("sdedup_out")
    val ckpt = scratch("sdedup_ckpt")
    val ev = eventsBatch
    // at-least-once feed: the same events land twice (a retry re-upload)
    ev.write.mode("append").parquet(src)
    ev.write.mode("append").parquet(src)

    StreamingDedup.run(spark, src, ev.schema, idCol = "event_id",
      tsCol = "ts", delay = "10 minutes", outDir = out,
      checkpointDir = ckpt).awaitTermination()

    val got = spark.read.parquet(out)
    assert(got.count() === ev.dropDuplicates("event_id").count())
    assert(got.select("event_id").distinct().count() === got.count())
  }

  test("composite-key dedup equals batch distinct when dups are in-watermark") {
    val src = scratch("sdedup_src3")
    val ev = eventsBatch.limit(200)
    ev.write.mode("append").parquet(src)
    ev.write.mode("append").parquet(src) // full re-delivery
    // Tables() already surfaces ts as TIMESTAMP, so the re-written feed
    // needs no nanos conversion
    val stream = spark.readStream.schema(ev.schema).parquet(src)
    val got = StreamingDedup.dedup(stream,
        Seq("user_id", "event_type"), "ts", "3650 days")
      .select("user_id", "event_type")
      .writeStream.format("memory").queryName("sdedup_q3")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    got.awaitTermination()
    val want = ev.select("user_id", "event_type").distinct().count()
    assert(spark.table("sdedup_q3").count() === want)
  }

  test("duplicates arriving in a later micro-batch are still dropped") {
    val src = scratch("sdedup_src2")
    val out = scratch("sdedup_out2")
    val ckpt = scratch("sdedup_ckpt2")
    val ev = eventsBatch.limit(100).cache()
    ev.write.mode("append").parquet(src)
    StreamingDedup.run(spark, src, ev.schema, "event_id", "ts",
      "10 minutes", out, ckpt).awaitTermination()
    // second delivery of the SAME rows, separate run: checkpointed state
    // must survive the restart and drop all of them
    ev.write.mode("append").parquet(src)
    StreamingDedup.run(spark, src, ev.schema, "event_id", "ts",
      "10 minutes", out, ckpt).awaitTermination()
    assert(spark.read.parquet(out).count() === ev.count())
    ev.unpersist()
  }
}
