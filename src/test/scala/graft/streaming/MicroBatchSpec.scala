package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** §2.9: the streaming hourly aggregation must equal the batch q21
  * answer on the same data — one logical plan, two execution modes.
  */
class MicroBatchSpec extends SparkSpec {

  private def eventsBatch = graft.util.Tables(
    spark, "/root/testdata/sf0.001", "events")

  test("AvailableNow stream over file source equals the batch q21 aggregate") {
    val src = scratch("stream_src")
    val ev = eventsBatch
    ev.write.mode("overwrite").parquet(src)

    val q = MicroBatch.run(spark, src, ev.schema, "mb_equiv")
    q.awaitTermination()

    val streamed = spark.table("mb_equiv")
      .orderBy("hour_start", "event_type").collect()
    val batch = ev
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("total_value"))
      .orderBy("hour_start", "event_type").collect()
    assert(streamed.length === batch.length)
    assert(streamed.map(_.toString) === batch.map(_.toString))
  }

  test("a second micro-batch of files updates the aggregate incrementally") {
    val src = scratch("stream_src2")
    val ev = eventsBatch
    val first = ev.filter(col("event_id") % 2 === 0)
    val second = ev.filter(col("event_id") % 2 === 1)
    first.write.mode("append").parquet(src)
    MicroBatch.run(spark, src, ev.schema, "mb_incr").awaitTermination()
    val n1 = spark.table("mb_incr").agg(sum("n")).head().getLong(0)
    assert(n1 === first.count())

    second.write.mode("append").parquet(src)
    MicroBatch.run(spark, src, ev.schema, "mb_incr").awaitTermination()
    val n2 = spark.table("mb_incr").agg(sum("n")).head().getLong(0)
    assert(n2 === ev.count()) // complete mode: full aggregate over both
  }

  test("append-mode parquet sink emits only watermark-finalized windows, exactly once") {
    import org.apache.spark.sql.streaming.Trigger
    val src = scratch("stream_pq_src"); val out = scratch("stream_pq_out")
    val cp = scratch("stream_pq_cp")
    val ev = eventsBatch
    ev.write.mode("overwrite").parquet(src)
    val q = MicroBatch.runToParquet(spark, src, ev.schema, out, cp,
      Trigger.AvailableNow())
    q.awaitTermination()
    val emitted = spark.read.parquet(out)
    val batch = ev
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("total_value"))
    // append emits only windows the watermark finalized: a non-empty,
    // exact subset of the batch answer (boundary windows stay pending)
    assert(emitted.count() > 0)
    assert(emitted.count() < batch.count())
    assert(emitted.exceptAll(batch).count() === 0)
  }

  test("reference cadences map to ProcessingTime triggers") {
    import org.apache.spark.sql.streaming.Trigger
    assert(MicroBatch.hourly === Trigger.ProcessingTime(3600000L))
    assert(MicroBatch.every5Min === Trigger.ProcessingTime(300000L))
  }
}
