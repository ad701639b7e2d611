package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** A test transport: proves the `transport` option swaps the fetch
  * implementation behind the same source (the live-HTTP seam). Units
  * and payloads are synthesized — no filesystem involved.
  */
class CannedTransport extends YoutubeTransport {
  override def listUnits(options: Map[String, String]): Seq[String] =
    (1 to options.getOrElse("n", "3").toInt).map(i => s"unit-$i")
  override def fetch(unit: String, options: Map[String, String]): String =
    s"""{"kind":"youtube#channelListResponse","etag":"$unit","items":[]}"""
}

class YoutubeSourceSpec extends SparkSpec {

  test("fixture transport: one row per file, content round-trips, short name resolves") {
    val dir = new java.io.File(scratch("yt_src_fixtures")); dir.mkdirs()
    (1 to 4).foreach { i =>
      java.nio.file.Files.writeString(
        new java.io.File(dir, f"resp$i%02d.json").toPath,
        s"""{"doc":$i}""")
    }
    // a non-.json file must be ignored by listUnits
    java.nio.file.Files.writeString(
      new java.io.File(dir, "README.txt").toPath, "not a response")
    val df = spark.read.format("graft-youtube")
      .option("path", dir.getPath).load()
    assert(df.schema.fieldNames.toSeq === Seq("unit", "value"))
    val rows = df.orderBy("unit").collect()
    assert(rows.length === 4)
    assert(rows.map(_.getString(1)).toSeq ===
      (1 to 4).map(i => s"""{"doc":$i}"""))
    // one InputPartition per unit — the distributed-fetch shape
    assert(df.rdd.getNumPartitions === 4)
  }

  test("micro-batch stream: checkpointed polls consume only new units, exactly once") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = new java.io.File(scratch("yt_src_stream")); dir.mkdirs()
    val ckpt = scratch("yt_src_stream_ckpt")
    val out = scratch("yt_src_stream_out")
    def addFiles(range: Range): Unit = range.foreach { i =>
      java.nio.file.Files.writeString(
        new java.io.File(dir, f"resp$i%02d.json").toPath, s"""{"doc":$i}""")
    }
    // durable sink + shared checkpoint: the restart resumes from the
    // committed offset (a memory sink cannot recover from checkpoint)
    def drain(): Unit =
      spark.readStream.format("graft-youtube")
        .option("path", dir.getPath).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
    addFiles(1 to 2)
    drain()
    assert(spark.read.parquet(out).count() === 2)
    // poll 2: two NEW units appear; the restarted query must emit only
    // those (offset = consumed-prefix length, restored from checkpoint)
    addFiles(3 to 4)
    drain()
    val got = spark.read.parquet(out).orderBy("unit")
      .collect().map(_.getString(1)).toSeq
    assert(got === (1 to 4).map(i => s"""{"doc":$i}"""))
  }

  test("maxUnitsPerTrigger: lagging drain proceeds in capped multi-trigger batches") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = new java.io.File(scratch("yt_src_rate")); dir.mkdirs()
    (1 to 7).foreach { i =>
      java.nio.file.Files.writeString(
        new java.io.File(dir, f"resp$i%02d.json").toPath, s"""{"doc":$i}""")
    }
    val out = scratch("yt_src_rate_out")
    val ckpt = scratch("yt_src_rate_ckpt")
    val q = spark.readStream.format("graft-youtube")
      .option("path", dir.getPath)
      .option("maxUnitsPerTrigger", "3").load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the full 7-unit backlog drains (AvailableNow pins the end)...
    assert(spark.read.parquet(out).orderBy("unit")
      .collect().map(_.getString(1)).toSeq ===
      (1 to 7).map(i => s"""{"doc":$i}"""))
    // ...but as a 3+3+1 staircase of committed batches, never one
    // giant catch-up batch: the checkpoint's offset log holds one
    // entry per capped trigger
    val batches = new java.io.File(ckpt, "offsets")
      .listFiles().map(_.getName).filter(_.forall(_.isDigit)).sorted
    assert(batches.length === 3, s"expected 3 capped triggers, got ${batches.toSeq}")
  }

  test("maxUnitsPerTrigger rejects non-positive caps") {
    val err = intercept[Exception] {
      new YoutubeMicroBatchStream(Map("maxUnitsPerTrigger" -> "0"))
    }
    assert(err.getMessage.contains("maxUnitsPerTrigger"))
  }

  test("transport option swaps the fetch implementation") {
    val df = spark.read.format("graft-youtube")
      .option("transport", classOf[CannedTransport].getName)
      .option("n", "5").load()
    assert(df.count() === 5)
    val etags = df.select(
        get_json_object(col("value"), "$.etag").as("etag"))
      .orderBy("etag").collect().map(_.getString(0)).toSeq
    assert(etags === (1 to 5).map(i => s"unit-$i"))
  }
}
