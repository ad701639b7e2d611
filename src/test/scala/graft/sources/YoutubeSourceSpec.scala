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
