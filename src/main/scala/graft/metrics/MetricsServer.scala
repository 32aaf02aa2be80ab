package graft.metrics

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.Row

/** A8: Prometheus text-format exposition over HTTP — the engine twin of the
  * reference's scrape endpoint (`numaprom/monitoring/__init__.py:16-24`
  * starts `prometheus_client.start_http_server`; `metrics.py` populates the
  * registry it serves). Here the registry is [[Observed]]'s snapshot —
  * observation rows accumulated inside running plans — rendered at
  * `GET /metrics` in exposition format 0.0.4.
  *
  * JDK built-in `HttpServer`, zero dependencies, one daemon executor;
  * `port = 0` binds an ephemeral port (read it back via [[boundPort]]).
  * Loopback-only by design: production scrapes go through the pod network
  * namespace exactly like the reference's sidecar-scraped endpoint.
  */
final class MetricsServer(observed: Observed, port: Int = 0) extends AutoCloseable {

  private val server =
    HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/metrics", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val body = MetricsServer.render(observed.snapshot).getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type",
        "text/plain; version=0.0.4; charset=utf-8")
      ex.sendResponseHeaders(200, body.length.toLong)
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
    }
  })
  server.setExecutor(null) // serve on the listener thread; scrape QPS is ~1/15s
  server.start()

  def boundPort: Int = server.getAddress.getPort

  override def close(): Unit = server.stop(0)
}

object MetricsServer {

  private def sanitize(s: String): String =
    s.map(c => if (c.isLetterOrDigit || c == '_') c else '_')

  /** Render observation rows as exposition text: each observation name is a
    * family prefix; every numeric field becomes one gauge sample
    * `graft_<obs>_<field> <value>`. Non-numeric fields are skipped (they
    * have no sample representation; Info-style payloads belong in labels).
    * Families sort by name so scrapes are byte-stable for equal state. */
  def render(snapshot: Map[String, Row]): String = {
    val sb = new StringBuilder
    snapshot.toSeq.sortBy(_._1).foreach { case (obsName, row) =>
      val fam = s"graft_${sanitize(obsName)}"
      sb.append(s"# HELP $fam observation '$obsName' from a graft plan\n")
      sb.append(s"# TYPE $fam gauge\n")
      row.schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (!row.isNullAt(i)) {
          val v: Option[Double] = row.get(i) match {
            case n: java.lang.Number => Some(n.doubleValue())
            case _ => None
          }
          v.foreach(d => sb.append(s"${fam}_${sanitize(f.name)} $d\n"))
        }
      }
    }
    sb.toString
  }
}
