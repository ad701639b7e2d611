package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import StatefulSessions.Ev

/** The flatMapGroupsWithState sessionizer must agree with the batch
  * (q20-style) sessionization for every CLOSED session, and its typed
  * state must survive micro-batch boundaries via the checkpoint.
  */
class StatefulSessionsSpec extends SparkSpec {

  import spark.implicits.{newProductEncoder, rddToDatasetHolder, localSeqToDatasetHolder}

  private lazy val events = graft.util.Tables(spark, "/root/testdata/sf0.001", "events")
    .select(col("user_id"), col("ts"), col("value"))

  /** Batch truth: q20's gap logic, minus each user's last (open) session. */
  private def closedBatchSessions = {
    val w = Window.partitionBy("user_id").orderBy("ts", "value")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev", lag("ts", 1).over(w))
      .withColumn("new_sess", when(col("prev").isNull ||
        (unix_micros(col("ts")) - unix_micros(col("prev"))) > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("sid", sum("new_sess").over(cum))
      .groupBy("user_id", "sid")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"), round(sum("value"), 4).as("session_value"))
      .withColumn("max_sid", max("sid").over(Window.partitionBy("user_id")))
      .filter(col("sid") < col("max_sid"))
      .select("user_id", "session_start", "session_end", "n_events", "session_value")
  }

  private def runStream(src: String, cp: String, name: String): Unit = {
    val stream = spark.readStream.schema(events.schema).parquet(src).as[Ev]
    val q = StatefulSessions.sessionize(spark, stream, gapMinutes = 30)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", cp)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def norm(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), round(col("session_value"), 4))
      .collect().map(_.toString).sorted.toSeq

  test("streamed closed sessions == batch sessions minus each user's open tail") {
    val src = scratch("sess_src"); val cp = scratch("sess_cp")
    events.write.mode("overwrite").parquet(src)
    runStream(src, cp, "ss_all")
    assert(norm(spark.table("ss_all")) === norm(closedBatchSessions))
  }

  test("sentinel flush events close every open tail: streamed == ALL batch sessions") {
    val src = scratch("sess_src3"); val cp = scratch("sess_cp3")
    val maxUs = events.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val flush = events.select(col("user_id")).distinct()
      .select(col("user_id"),
        expr(s"timestamp_micros($maxUs + 1801000000)").as("ts"),
        lit(0.0).as("value"))
    events.unionByName(flush).write.mode("overwrite").parquet(src)
    runStream(src, cp, "ss_flush")
    val w = Window.partitionBy("user_id").orderBy("ts", "value")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allBatch = events
      .withColumn("prev", lag("ts", 1).over(w))
      .withColumn("new_sess", when(col("prev").isNull ||
        (unix_micros(col("ts")) - unix_micros(col("prev"))) > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("sid", sum("new_sess").over(cum))
      .groupBy("user_id", "sid")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"), round(sum("value"), 4).as("session_value"))
      .select("user_id", "session_start", "session_end", "n_events", "session_value")
    assert(norm(spark.table("ss_flush")) === norm(allBatch))
  }

  test("typed state survives the micro-batch boundary (checkpointed resume)") {
    // memory sink cannot recover from a checkpoint; the parquet sink can
    // (exactly-once file log), so the resume path uses it
    val src = scratch("sess_src2"); val cp = scratch("sess_cp2")
    val out = scratch("sess_out2")
    def runToParquet(): Unit = {
      val stream = spark.readStream.schema(events.schema).parquet(src).as[Ev]
      val q = StatefulSessions.sessionize(spark, stream, gapMinutes = 30)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val cut = events.agg(expr("percentile_approx(unix_micros(ts), 0.5)")).head().getLong(0)
    events.filter(unix_micros(col("ts")) <= cut).write.mode("append").parquet(src)
    runToParquet()
    events.filter(unix_micros(col("ts")) > cut).write.mode("append").parquet(src)
    runToParquet() // same checkpoint: resumes source offsets + typed state
    assert(norm(spark.read.parquet(out)) === norm(closedBatchSessions))
  }
}
