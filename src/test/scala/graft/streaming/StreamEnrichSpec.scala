package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Stream-static enrichment (§2.9 extension): a streaming fact feed
  * joined against a static dimension — the incremental twin of the q10
  * broadcast-dim join, and the production shape for enriching an event
  * stream with warehouse reference data. The static side is re-read per
  * micro-batch (picking up dim updates); the stream side needs no state
  * because the join is stateless per batch.
  */
class StreamEnrichSpec extends SparkSpec {

  test("stream-static join equals the batch join on the same data") {
    val sf = "/root/testdata/sf0.001"
    val src = scratch("enrich_src")
    val ev = graft.util.Tables(spark, sf, "events")
    ev.write.mode("overwrite").parquet(src)
    val users = graft.util.Tables(spark, sf, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))

    val streamed = spark.readStream.schema(ev.schema).parquet(src)
      .join(users, "user_id") // stream-static: no watermark, no state
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"))
    val q = streamed.writeStream.format("memory").queryName("enrich")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("enrich").orderBy("c_mktsegment").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val want = ev.join(users, "user_id").groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n")).orderBy("c_mktsegment").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.nonEmpty && got === want)
  }
}
