package graft

import org.apache.spark.sql.functions._
import graft.observability.Metrics
import graft.storm.{StormFeed, StormPipeline}

class ObservabilitySpec extends SparkSpec {

  test("observe-based metrics count rows in/out and poison pills, no UDF") {
    val m = new Metrics(spark)
    val wire = StormPipeline.toRawJson(StormFeed.feed(spark, sfDir))
      .withColumn("raw_value",
        when(col("event_id") % 97 === 0, substring(col("raw_value"), 1, 10))
          .otherwise(col("raw_value")))
    val parsed = m.instrumentParsed(StormPipeline.parseRawJson(wire))
    val good = parsed.where(col("parse_ok")).count()
    // QueryExecutionListener delivery is asynchronous — wait for it
    org.apache.spark.graft.TestBus.drain(spark.sparkContext)
    val snap = m.snapshot
    assert(snap("rows_in") == 1000)
    assert(snap("rows_out") == good)
    assert(snap("poison_pills") == snap("rows_in") - good)
    assert(snap("records_read") > 0)
    // the observation node is plan-native: no ScalaUDF anywhere
    assert(!parsed.queryExecution.executedPlan.toString.contains("UDF"))
    m.unregister()
  }

  test("ops server: readiness flips 503 -> 200, /metrics serves Prometheus text") {
    import graft.observability.OpsServer
    @volatile var ready = false
    val counters = new java.util.concurrent.atomic.AtomicLong(0)
    val srv = OpsServer.start(0, () => ready,
      () => Map("rows_in" -> counters.get, "poison_pills" -> 2L))
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def get(path: String) = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:${srv.port}$path")).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(get("/ready").statusCode() == 503)
      ready = true
      assert(get("/ready").statusCode() == 200)
      counters.set(41)
      val m = get("/metrics")
      assert(m.statusCode() == 200)
      assert(m.body().contains("graft_rows_in 41"))
      assert(m.body().contains("graft_poison_pills 2"))
      assert(m.body().contains("# TYPE graft_rows_in counter"))
    } finally srv.stop()
  }

  test("ops server: /healthz is live before readiness; /readyz mirrors /ready") {
    import graft.observability.OpsServer
    @volatile var ready = false
    val srv = OpsServer.start(0, () => ready, () => Map.empty[String, Long])
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def get(path: String) = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:${srv.port}$path")).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      // liveness answers 200 while readiness still says 503 — the k8s
      // distinction: alive-but-warming must NOT be restarted
      assert(get("/healthz").statusCode() == 200)
      assert(get("/readyz").statusCode() == 503)
      assert(get("/ready").statusCode() == 503)
      ready = true
      assert(get("/healthz").statusCode() == 200)
      assert(get("/readyz").statusCode() == 200)
    } finally srv.stop()
  }

  test("ops server: graceful shutdown drains the in-flight request within the deadline") {
    import graft.observability.OpsServer
    // a deliberately slow metrics snapshot: the in-flight request the
    // drain must finish serving
    val srv = OpsServer.start(0, () => true,
      () => { Thread.sleep(400); Map("slow" -> 1L) })
    val port = srv.port
    val client = java.net.http.HttpClient.newHttpClient()
    def req(path: String) = java.net.http.HttpRequest.newBuilder(
      java.net.URI.create(s"http://127.0.0.1:$port$path")).build()
    val inflight = client.sendAsync(req("/metrics"),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    Thread.sleep(100) // request is now inside the slow handler
    val t0 = System.nanoTime()
    // default SHUTDOWN_TIMEOUT (10s) — the deployment's drain budget
    val cfg = graft.GraftConfig.fromEnv(Map.empty)
      .fold(e => fail(s"default config must parse: $e"), identity)
    srv.shutdown(timeoutMs = cfg.shutdownTimeoutMs)
    val shutdownSec = (System.nanoTime() - t0) / 1e9
    // the in-flight exchange was served to completion, not severed
    val r = inflight.get(5, java.util.concurrent.TimeUnit.SECONDS)
    assert(r.statusCode() == 200 && r.body().contains("graft_slow 1"))
    // ...the drain returned promptly once idle (deadline is a bound,
    // not a sleep), and the listener is closed to new connections
    assert(shutdownSec < 10.0, s"drain took ${shutdownSec}s")
    intercept[java.io.IOException] {
      client.send(req("/healthz"),
        java.net.http.HttpResponse.BodyHandlers.ofString())
    }
  }

  test("observe counters are exactly-once per action (second action re-counts once)") {
    val m = new Metrics(spark)
    val parsed = m.instrumentParsed(
      StormPipeline.parseRawJson(StormPipeline.toRawJson(StormFeed.feed(spark, sfDir))))
    parsed.count()
    parsed.count()
    org.apache.spark.graft.TestBus.drain(spark.sparkContext)
    // two separate actions -> two deliveries, each exactly the row count
    assert(m.snapshot("rows_in") == 2000)
    m.unregister()
  }
}
