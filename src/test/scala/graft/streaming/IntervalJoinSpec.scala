package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Stream-stream interval join == the batch interval join, with the
  * feeds deliberately split into single-file micro-batches so matches
  * MUST straddle batches (the oracle at sf0.01 re-checks this on the
  * real events table; this pins the mechanism on a feed small enough
  * to reason about).
  */
class IntervalJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("matches across micro-batches equal the batch interval join") {
    import spark.implicits._
    val views = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 12:00:00")),
      (2L, 12L, ts("2024-01-01 10:30:00")))
      .toDF("user_id", "view_id", "v_ts")
    val clicks = Seq(
      (1L, 20L, ts("2024-01-01 10:20:00")), // matches view 10 only
      (1L, 21L, ts("2024-01-01 12:59:00")), // matches view 11 only
      (2L, 22L, ts("2024-01-01 09:00:00")), // BEFORE the view: no match
      (3L, 23L, ts("2024-01-01 10:00:00"))) // no view for user 3
      .toDF("user_id", "click_id", "c_ts")
    val vDir = scratch("ij_views"); val cDir = scratch("ij_clicks")
    // one file per row → every row its own micro-batch candidate
    views.repartition(3).write.parquet(vDir)
    clicks.repartition(4).write.parquet(cDir)
    val vs = spark.readStream.schema(views.schema)
      .option("maxFilesPerTrigger", "1").parquet(vDir)
    val cs = spark.readStream.schema(clicks.schema)
      .option("maxFilesPerTrigger", "1").parquet(cDir)
    val q = IntervalJoin.within(vs, "v_ts", cs, "c_ts", "user_id",
        gap = "1 hour", delay = "30 days")
      .select(col("l.user_id").as("user_id"), col("view_id"), col("click_id"))
      .writeStream.format("memory").queryName("ij_sink")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ij_sink")
      .orderBy("view_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 10L, 20L), (1L, 11L, 21L)))
  }
}
