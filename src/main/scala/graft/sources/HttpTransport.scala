package graft.sources

/** HTTP transport for the `graft-youtube` DataSourceV2 source — the
  * live-API seam behind the same two methods as [[FixtureTransport]]
  * (reference shape: the channels().list fetch at
  * /root/reference/dags/extract.py:69-83). `listUnits` GETs an index
  * document (driver-side, one newline-separated unit path per line —
  * the "page list" of a crawl), and `fetch` GETs each unit document
  * INSIDE its partition reader, i.e. on executors: the 10k-channel
  * crawl distributes across the cluster, never serializing through
  * the driver.
  *
  * Options: `baseUrl` (required, e.g. `http://127.0.0.1:8080`);
  * `units` (optional comma-separated unit paths — skips the index
  * fetch); `indexPath` (default `index`). Plain JDK
  * `HttpURLConnection`, bounded connect/read timeouts, non-200
  * refuses loudly with the URL and status — a dead endpoint fails the
  * task (and Spark's task retry re-fetches), never yields empty rows.
  *
  * Proven over a real loopback socket in HttpTransportSpec (the
  * sandbox has no egress; the transport itself is plain HTTP).
  */
class HttpTransport extends YoutubeTransport {

  private def base(options: Map[String, String]): String =
    options.getOrElse("baseUrl", sys.error(
      "graft-youtube: 'baseUrl' option is required by HttpTransport"))
      .stripSuffix("/")

  private def get(url: String): String = {
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(15000)
    conn.setRequestMethod("GET")
    try {
      val code = conn.getResponseCode
      require(code == 200,
        s"graft-youtube HttpTransport: GET $url returned HTTP $code")
      val in = conn.getInputStream
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    } finally conn.disconnect()
  }

  override def listUnits(options: Map[String, String]): Seq[String] =
    options.get("units") match {
      case Some(us) => us.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      case None =>
        get(s"${base(options)}/${options.getOrElse("indexPath", "index")}")
          .linesIterator.map(_.trim).filter(_.nonEmpty).toSeq.sorted
    }

  override def fetch(unit: String, options: Map[String, String]): String =
    get(s"${base(options)}/$unit")
}
