package graft.observability

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Operational HTTP surface — the Spark-native equivalent of the
  * reference's readiness endpoint + Prometheus exporter
  * (/root/reference/internal/httpadapter/server.go,
  * internal/observability/metrics.go), on the JDK's built-in
  * HttpServer (zero extra dependencies):
  *
  *   GET /ready   → 200 "ok" once the supplied probe is true
  *                  (e.g. StreamOps.StreamMetrics.isReady — first
  *                  committed batch), else 503. The k8s readiness
  *                  probe contract.
  *   GET /metrics → Prometheus text exposition of the supplied
  *                  counter snapshots (`graft_<name> <value>` lines).
  */
final class OpsServer private (server: HttpServer) {
  def port: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}

object OpsServer {

  /** Bind and start. `port = 0` picks a free port (see [[OpsServer.port]]). */
  def start(port: Int, ready: () => Boolean,
      metrics: () => Map[String, Long]): OpsServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)

    def respond(x: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      x.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
      x.sendResponseHeaders(code, bytes.length.toLong)
      val os = x.getResponseBody
      try os.write(bytes) finally os.close()
    }

    server.createContext("/ready", (x: HttpExchange) =>
      if (ready()) respond(x, 200, "ok\n") else respond(x, 503, "not ready\n"))
    server.createContext("/metrics", (x: HttpExchange) => {
      val body = metrics().toSeq.sortBy(_._1).map { case (k, v) =>
        val name = "graft_" + k.replaceAll("[^A-Za-z0-9_]", "_")
        s"# TYPE $name counter\n$name $v"
      }.mkString("", "\n", "\n")
      respond(x, 200, body)
    })
    server.start()
    new OpsServer(server)
  }

  /** Bind on the configured `HTTP_ADDR` port (reference
    * `cmd/etl/main.go:34`'s `httpadapter.NewServer(cfg.HTTPAddr, …)`). */
  def start(cfg: graft.GraftConfig, ready: () => Boolean,
      metrics: () => Map[String, Long]): OpsServer =
    start(cfg.httpPort, ready, metrics)
}
