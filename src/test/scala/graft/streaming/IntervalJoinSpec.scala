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

  /** The q172 production shape: a minutes-scale watermark on a feed
    * whose chunk files arrive in event-time order must (a) still emit
    * the complete batch-equal match set and (b) actually EVICT buffered
    * state once the watermark passes v_ts + gap — the property that
    * bounds state on an infinite stream. Chunk 2 sits 4 h after chunk 1,
    * far beyond gap (1 h) + delay (10 min), so chunk 1's rows must be
    * gone from the state store by the final progress report.
    */
  test("bounded delay on a time-ordered feed: complete output, state evicted") {
    import spark.implicits._
    def writeChunk(rows: org.apache.spark.sql.DataFrame, dir: String,
                   k: Int): Unit = {
      val tmp = scratch(s"ij_b_tmp_$k")
      rows.coalesce(1).write.mode("overwrite").parquet(tmp)
      val dirF = new java.io.File(dir); dirF.mkdirs()
      new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach { part =>
          val dst = new java.io.File(dirF, f"chunk$k%02d.parquet")
          java.nio.file.Files.move(part.toPath, dst.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          dst.setLastModified(1700000000000L + k * 60000L)
        }
    }
    val vDir = scratch("ij_b_views"); val cDir = scratch("ij_b_clicks")
    // chunk 0: morning; chunk 1: 4h later — crosses gap+delay horizon
    writeChunk(Seq((1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 11L, ts("2024-01-01 10:05:00")))
      .toDF("user_id", "view_id", "v_ts"), vDir, 0)
    writeChunk(Seq((1L, 12L, ts("2024-01-01 14:30:00")))
      .toDF("user_id", "view_id", "v_ts"), vDir, 1)
    writeChunk(Seq((1L, 20L, ts("2024-01-01 10:20:00")))
      .toDF("user_id", "click_id", "c_ts"), cDir, 0)
    writeChunk(Seq((1L, 21L, ts("2024-01-01 14:45:00")))
      .toDF("user_id", "click_id", "c_ts"), cDir, 1)
    val vSchema = spark.read.parquet(vDir).schema
    val cSchema = spark.read.parquet(cDir).schema
    val vs = spark.readStream.schema(vSchema)
      .option("maxFilesPerTrigger", "1").parquet(vDir)
    val cs = spark.readStream.schema(cSchema)
      .option("maxFilesPerTrigger", "1").parquet(cDir)
    val q = IntervalJoin.within(vs, "v_ts", cs, "c_ts", "user_id",
        gap = "1 hour", delay = "10 minutes")
      .select(col("l.user_id").as("user_id"), col("view_id"), col("click_id"))
      .writeStream.format("memory").queryName("ij_bounded_sink")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ij_bounded_sink")
      .orderBy("view_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // complete batch-equal match set despite the 10-min delay
    assert(got.toSeq === Seq((1L, 10L, 20L), (1L, 12L, 21L)))
    val sops = q.recentProgress.toSeq.flatMap(_.stateOperators)
    val removed = sops.map(_.numRowsRemoved).sum
    val finalRows = q.recentProgress.last.stateOperators.map(_.numRowsTotal).sum
    assert(removed > 0, s"expected state eviction, progress: $sops")
    // 5 rows entered the join state; the final store must hold fewer
    assert(finalRows < 5, s"state not bounded: $finalRows rows retained")
  }

  /** withinOuter's emit-on-evict mechanism on a reasonable-about feed:
    * unmatched verdicts appear ONLY once the watermark proves no match
    * can arrive — view 11 (no click ever) must emit null-padded after
    * the horizon passes it, view 12 (matched) must NOT get a null row,
    * and a view still inside the horizon at stream end must emit only
    * because the flush row closes the books (the q272 pattern).
    */
  test("left outer interval join: watermark-certified unmatched verdicts, matched rows never null-pad") {
    import spark.implicits._
    def writeChunk(rows: org.apache.spark.sql.DataFrame, dir: String,
                   k: Int): Unit = {
      val tmp = scratch(s"ij_o_tmp_$k")
      rows.coalesce(1).write.mode("overwrite").parquet(tmp)
      val dirF = new java.io.File(dir); dirF.mkdirs()
      new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach { part =>
          val dst = new java.io.File(dirF, f"chunk$k%02d.parquet")
          java.nio.file.Files.move(part.toPath, dst.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          dst.setLastModified(1700000000000L + k * 60000L)
        }
    }
    val vDir = scratch("ij_o_views"); val cDir = scratch("ij_o_clicks")
    writeChunk(Seq(
        (1L, 10L, ts("2024-01-01 10:00:00")),  // matched in chunk 0
        (2L, 11L, ts("2024-01-01 10:05:00")))  // never matched
      .toDF("user_id", "view_id", "v_ts"), vDir, 0)
    writeChunk(Seq(
        (1L, 12L, ts("2024-01-01 14:30:00")),  // matched in chunk 1
        (3L, 13L, ts("2024-01-01 14:40:00")))  // never matched, near max
      .toDF("user_id", "view_id", "v_ts"), vDir, 1)
    // flush rows: sentinel keys, far past max + gap + delay, BOTH sides
    writeChunk(Seq((-1L, -1L, ts("2024-03-01 00:00:00")))
      .toDF("user_id", "view_id", "v_ts"), vDir, 2)
    writeChunk(Seq((1L, 20L, ts("2024-01-01 10:20:00")))
      .toDF("user_id", "click_id", "c_ts"), cDir, 0)
    writeChunk(Seq((1L, 21L, ts("2024-01-01 14:45:00")))
      .toDF("user_id", "click_id", "c_ts"), cDir, 1)
    writeChunk(Seq((-2L, -1L, ts("2024-03-01 00:00:00")))
      .toDF("user_id", "click_id", "c_ts"), cDir, 2)
    val vs = spark.readStream.schema(spark.read.parquet(vDir).schema)
      .option("maxFilesPerTrigger", "1").parquet(vDir)
    val cs = spark.readStream.schema(spark.read.parquet(cDir).schema)
      .option("maxFilesPerTrigger", "1").parquet(cDir)
    val q = IntervalJoin.withinOuter(vs, "v_ts", cs, "c_ts", "user_id",
        gap = "1 hour", delay = "10 minutes")
      .select(col("l.user_id").as("user_id"), col("view_id"),
        col("click_id"))
      .writeStream.format("memory").queryName("ij_outer_sink")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ij_outer_sink")
      .filter(col("view_id") >= 0) // sentinel filtered at the SINK —
      // inside the stream it would push below the watermark node and
      // strand the tail verdicts (the q272 lesson)
      .orderBy("view_id")
      .collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq === Seq((10L, 20L), (11L, -1L), (12L, 21L), (13L, -1L)),
      s"outer verdicts wrong: ${got.toSeq}")
    // eviction drove the verdicts: state removed rows along the way
    val removed = q.recentProgress.toSeq
      .flatMap(_.stateOperators).map(_.numRowsRemoved).sum
    assert(removed > 0, "unmatched verdicts must come from eviction")
  }
}
