package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Watermarked stream-stream join (§2.9 extension): view→click
  * attribution within a 10-minute window, both sides streaming. Inner
  * join results emit as matches arrive; the watermarks bound the
  * buffered state on BOTH sides (a click can only match views up to 10
  * minutes older, so state older than the watermark minus the bound is
  * dropped) — the property that keeps a 100 TB/day two-stream join's
  * state finite.
  */
class StreamStreamJoinSpec extends SparkSpec {

  test("stream-stream interval join equals the batch interval join") {
    val sf = "/root/testdata/sf0.001"
    val src = scratch("ssj_src")
    val ev = graft.util.Tables(spark, sf, "events")
    ev.write.mode("overwrite").parquet(src)

    def side(tpe: String) = spark.readStream.schema(ev.schema).parquet(src)
      .filter(col("event_type") === tpe)
      .select(col("user_id"), col("event_id").as(s"${tpe}_id"),
        col("ts").as(s"${tpe}_ts"))
      .withWatermark(s"${tpe}_ts", "1 hour")

    val views = side("view")
    val clicks = side("click")
    val cond = views("user_id") === clicks("user_id") &&
      clicks("click_ts") >= views("view_ts") &&
      clicks("click_ts") <= views("view_ts") + expr("INTERVAL 10 MINUTES")
    val streamed = views.join(clicks, cond)
      .select(views("user_id"), col("view_id"), col("click_id"))
    val q = streamed.writeStream.format("memory").queryName("ssj")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    def batchSide(tpe: String) = ev.filter(col("event_type") === tpe)
      .select(col("user_id"), col("event_id").as(s"${tpe}_id"),
        col("ts").as(s"${tpe}_ts"))
    val bv = batchSide("view"); val bc = batchSide("click")
    val want = bv.join(bc,
        bv("user_id") === bc("user_id") &&
          bc("click_ts") >= bv("view_ts") &&
          bc("click_ts") <= bv("view_ts") + expr("INTERVAL 10 MINUTES"))
      .select(bv("user_id"), col("view_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = spark.table("ssj").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty && got === want)
  }
}
