package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Proves the pluggable-transport seam over a REAL socket: a loopback
  * `com.sun.net.httpserver` fixture server (JDK-only, no egress)
  * serves an index + unit documents, and the `graft-youtube` DSv2
  * source reads them through [[HttpTransport]] — executor-side
  * fetches carrying actual bytes over HTTP, the one claim the
  * fixture/canned transports could not test.
  */
class HttpTransportSpec extends SparkSpec {

  private def withServer(docs: Map[String, String])
                        (f: String => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val path = ex.getRequestURI.getPath.stripPrefix("/")
        docs.get(path) match {
          case Some(body) =>
            val b = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            ex.sendResponseHeaders(200, b.length.toLong)
            ex.getResponseBody.write(b)
          case None => ex.sendResponseHeaders(404, -1)
        }
      } finally ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def doc(i: Int) =
    s"""{"kind":"youtube#channelListResponse","etag":"e$i","items":[]}"""

  test("batch read over a loopback socket: index + per-unit GETs, one partition per unit") {
    val units = (1 to 5).map(i => f"resp$i%02d.json")
    val docs = units.zipWithIndex.map { case (u, i) => u -> doc(i + 1) }.toMap +
      ("index" -> units.reverse.mkString("\n")) // transport sorts
    withServer(docs) { baseUrl =>
      val df = spark.read.format("graft-youtube")
        .option("transport", classOf[HttpTransport].getName)
        .option("baseUrl", baseUrl).load()
      // one InputPartition per unit — the distributed-crawl shape,
      // each fetch running inside its partition reader
      assert(df.rdd.getNumPartitions === 5)
      val rows = df.orderBy("unit").collect()
      assert(rows.map(_.getString(0)).toSeq === units)
      assert(rows.map(_.getString(1)).toSeq ===
        (1 to 5).map(doc))
    }
  }

  test("explicit units option skips the index fetch") {
    val docs = Map("a.json" -> doc(1), "b.json" -> doc(2))
    withServer(docs) { baseUrl =>
      val got = spark.read.format("graft-youtube")
        .option("transport", classOf[HttpTransport].getName)
        .option("baseUrl", baseUrl)
        .option("units", "a.json,b.json").load()
        .orderBy("unit").collect().map(_.getString(1)).toSeq
      assert(got === Seq(doc(1), doc(2)))
    }
  }

  test("micro-batch stream polls the index over the socket; restart resumes from checkpoint") {
    import org.apache.spark.sql.streaming.Trigger
    // mutable doc set: poll 2 sees two NEW units beyond the offset
    @volatile var docs = Map("index" -> "u1.json\nu2.json",
      "u1.json" -> doc(1), "u2.json" -> doc(2))
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val path = ex.getRequestURI.getPath.stripPrefix("/")
        docs.get(path) match {
          case Some(body) =>
            val b = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            ex.sendResponseHeaders(200, b.length.toLong)
            ex.getResponseBody.write(b)
          case None => ex.sendResponseHeaders(404, -1)
        }
      } finally ex.close()
    })
    server.start()
    try {
      val baseUrl = s"http://127.0.0.1:${server.getAddress.getPort}"
      val out = scratch("yt_http_stream_out")
      val ckpt = scratch("yt_http_stream_ckpt")
      def drain(): Unit =
        spark.readStream.format("graft-youtube")
          .option("transport", classOf[HttpTransport].getName)
          .option("baseUrl", baseUrl).load()
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
          .awaitTermination()
      drain()
      assert(spark.read.parquet(out).count() === 2)
      docs = docs ++ Map("index" -> "u1.json\nu2.json\nu3.json\nu4.json",
        "u3.json" -> doc(3), "u4.json" -> doc(4))
      drain()
      assert(spark.read.parquet(out).orderBy("unit")
        .collect().map(_.getString(1)).toSeq === (1 to 4).map(doc))
    } finally server.stop(0)
  }

  test("non-200 and missing baseUrl refuse loudly") {
    withServer(Map("index" -> "missing.json")) { baseUrl =>
      val e = intercept[Exception] {
        spark.read.format("graft-youtube")
          .option("transport", classOf[HttpTransport].getName)
          .option("baseUrl", baseUrl).load().collect()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(c => c.getMessage != null &&
        c.getMessage.contains("HTTP 404")),
        s"expected the loud 404 refusal, got: $e")
    }
    val e2 = intercept[Exception] {
      new HttpTransport().listUnits(Map.empty)
    }
    assert(e2.getMessage.contains("baseUrl"))
  }
}
