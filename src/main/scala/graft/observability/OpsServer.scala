package graft.observability

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Operational HTTP surface — the Spark-native equivalent of the
  * reference's liveness/readiness endpoints + Prometheus exporter
  * (/root/reference/internal/adapter/httpadapter/server.go:34-36,
  * internal/observability/metrics.go), on the JDK's built-in
  * HttpServer (zero extra dependencies):
  *
  *   GET /healthz → 200 "ok" whenever the process can serve — the k8s
  *                  LIVENESS probe contract (a deployment with a
  *                  liveness probe hits this on day one; a hung JVM
  *                  simply never answers and gets restarted).
  *   GET /readyz  → 200 "ok" once the supplied probe is true
  *   GET /ready      (e.g. StreamOps.StreamMetrics.isReady — first
  *                  committed batch), else 503. The k8s readiness
  *                  probe contract; both spellings serve it (the
  *                  reference routes /readyz).
  *   GET /metrics → Prometheus text exposition of the supplied
  *                  counter snapshots (`graft_<name> <value>` lines).
  */
final class OpsServer private (server: HttpServer) {
  def port: Int = server.getAddress.getPort

  /** Immediate stop — tests and abnormal exits. In-flight exchanges
    * are abandoned. */
  def stop(): Unit = server.stop(0)

  /** Graceful shutdown: close the listening socket (new connections
    * refused), then block until in-flight exchanges complete, bounded
    * by the deadline — the reference's `httpServer.Shutdown(ctx)`
    * under `ShutdownTimeout` (cmd/etl/main.go:57-63). Call with
    * [[graft.GraftConfig.shutdownTimeoutMs]] in a deployment's
    * signal handler, before stopping streams and the SparkSession. */
  def shutdown(timeoutMs: Long): Unit =
    server.stop(math.max(1L, (timeoutMs + 999) / 1000).toInt)
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

    server.createContext("/healthz", (x: HttpExchange) =>
      respond(x, 200, "ok\n"))
    val readyHandler = (x: HttpExchange) =>
      if (ready()) respond(x, 200, "ok\n") else respond(x, 503, "not ready\n")
    server.createContext("/ready", readyHandler(_))
    server.createContext("/readyz", readyHandler(_))
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
