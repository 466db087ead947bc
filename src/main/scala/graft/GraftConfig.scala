package graft

/** Service configuration from environment variables — the operational
  * entry surface of the reference (`/root/reference/internal/config/
  * config.go:1-67`: brokers, topics, group id, HTTP addr, log settings,
  * shutdown timeout, batch size/flush interval, each with a default and
  * validation), mapped onto this library's Spark deployment knobs.
  *
  * Reference-parity env vars (same names, same defaults, same
  * validation failures):
  *
  *  - `KAFKA_BROKERS` (csv, default `kafka:9092`) — must be non-empty
  *  - `KAFKA_SOURCE_TOPIC` (default `raw-weather-reports`) — non-empty
  *  - `KAFKA_SINK_TOPIC` (default `transformed-weather-data`) — non-empty
  *  - `KAFKA_GROUP_ID` (default `storm-data-etl`)
  *  - `HTTP_ADDR` (default `:8080`) — port must parse
  *  - `LOG_LEVEL` (default `info`), `LOG_FORMAT` (default `json`)
  *  - `SHUTDOWN_TIMEOUT` (Go duration, default `10s`) — positive
  *  - `BATCH_SIZE` (default 50) — in [1, 1000]
  *  - `BATCH_FLUSH_INTERVAL` (Go duration, default `500ms`) — positive
  *
  * Spark-deployment extensions (this library's knobs, same
  * defaults-and-validation treatment; the reference hard-codes the
  * equivalents in `pipeline.go:68-71` — 200ms base backoff, 5s cap):
  *
  *  - `GRAFT_SOURCE_DIR` / `GRAFT_SINK_DIR` / `GRAFT_QUARANTINE_DIR` /
  *    `GRAFT_CHECKPOINT_DIR` — file-mode stand-ins for the topics
  *  - `GRAFT_MAX_RESTARTS` (default 5) — in [0, 100]
  *  - `GRAFT_BACKOFF_BASE` (default `200ms`) / `GRAFT_BACKOFF_MAX`
  *    (default `5s`) — positive, base ≤ max
  *
  * `BATCH_SIZE` doubles as the file source's `maxFilesPerTrigger` (the
  * micro-batch size dial — the same role it plays in the reference's
  * `ExtractBatch`).
  */
final case class GraftConfig(
    kafkaBrokers: Seq[String],
    kafkaSourceTopic: String,
    kafkaSinkTopic: String,
    kafkaGroupId: String,
    httpAddr: String,
    logLevel: String,
    logFormat: String,
    shutdownTimeoutMs: Long,
    batchSize: Int,
    batchFlushIntervalMs: Long,
    sourceDir: String,
    sinkDir: String,
    quarantineDir: String,
    checkpointDir: String,
    maxRestarts: Int,
    backoffBaseMs: Long,
    backoffMaxMs: Long) {

  /** Port parsed out of `httpAddr` (`:8080` / `0.0.0.0:8080` → 8080). */
  def httpPort: Int = httpAddr.substring(httpAddr.lastIndexOf(':') + 1).toInt
}

object GraftConfig {

  /** Minimal Go-style duration parser for the forms the reference's
    * config actually accepts in practice (`10s`, `500ms`, `1m`, `2h`,
    * `1.5s`); returns millis. Composite forms (`1m30s`) and negative
    * values are rejected like `time.ParseDuration` + the reference's
    * positivity checks. */
  def parseDurationMs(s: String): Either[String, Long] = {
    val m = raw"^(\d+(?:\.\d+)?)(ms|s|m|h)$$".r
    s.trim match {
      case m(num, unit) =>
        val scale = unit match {
          case "ms" => 1.0; case "s" => 1000.0; case "m" => 60000.0; case "h" => 3600000.0
        }
        val ms = (num.toDouble * scale).round
        if (ms <= 0) Left(s"duration must be positive: $s") else Right(ms)
      case _ => Left(s"invalid duration: $s")
    }
  }

  /** Load + validate, reference-style: every field has a default; an
    * invalid explicit value is an ERROR (not silently defaulted), with
    * the env var named in the message — `config.go`'s contract. */
  def fromEnv(env: Map[String, String] = sys.env): Either[String, GraftConfig] = {
    def get(k: String, dflt: String): String = env.getOrElse(k, dflt).trim
    def duration(k: String, dflt: String): Either[String, Long] =
      parseDurationMs(get(k, dflt)).left.map(e => s"$k: $e")
    def bounded(k: String, dflt: Int, lo: Int, hi: Int): Either[String, Int] =
      get(k, dflt.toString).toIntOption
        .toRight(s"$k: not an integer: ${get(k, dflt.toString)}")
        .filterOrElse(n => n >= lo && n <= hi, s"$k: must be in [$lo, $hi]")
    for {
      brokers <- Right(get("KAFKA_BROKERS", "kafka:9092")
        .split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      _ <- Either.cond(brokers.nonEmpty, (), "KAFKA_BROKERS is required")
      srcTopic = get("KAFKA_SOURCE_TOPIC", "raw-weather-reports")
      _ <- Either.cond(srcTopic.nonEmpty, (), "KAFKA_SOURCE_TOPIC is required")
      sinkTopic = get("KAFKA_SINK_TOPIC", "transformed-weather-data")
      _ <- Either.cond(sinkTopic.nonEmpty, (), "KAFKA_SINK_TOPIC is required")
      httpAddr = get("HTTP_ADDR", ":8080")
      _ <- Either.cond(
        httpAddr.substring(httpAddr.lastIndexOf(':') + 1).toIntOption.isDefined,
        (), s"HTTP_ADDR: no parseable port in $httpAddr")
      shutdownMs <- duration("SHUTDOWN_TIMEOUT", "10s")
      batchSize <- bounded("BATCH_SIZE", 50, 1, 1000)
      flushMs <- duration("BATCH_FLUSH_INTERVAL", "500ms")
      maxRestarts <- bounded("GRAFT_MAX_RESTARTS", 5, 0, 100)
      backoffBase <- duration("GRAFT_BACKOFF_BASE", "200ms")
      backoffMax <- duration("GRAFT_BACKOFF_MAX", "5s")
      _ <- Either.cond(backoffBase <= backoffMax, (),
        s"GRAFT_BACKOFF_BASE ($backoffBase ms) must be <= GRAFT_BACKOFF_MAX ($backoffMax ms)")
    } yield GraftConfig(
      kafkaBrokers = brokers,
      kafkaSourceTopic = srcTopic,
      kafkaSinkTopic = sinkTopic,
      kafkaGroupId = get("KAFKA_GROUP_ID", "storm-data-etl"),
      httpAddr = httpAddr,
      logLevel = get("LOG_LEVEL", "info"),
      logFormat = get("LOG_FORMAT", "json"),
      shutdownTimeoutMs = shutdownMs,
      batchSize = batchSize,
      batchFlushIntervalMs = flushMs,
      sourceDir = get("GRAFT_SOURCE_DIR", "/data/raw"),
      sinkDir = get("GRAFT_SINK_DIR", "/data/enriched"),
      quarantineDir = get("GRAFT_QUARANTINE_DIR", "/data/quarantine"),
      checkpointDir = get("GRAFT_CHECKPOINT_DIR", "/data/checkpoints"),
      maxRestarts = maxRestarts,
      backoffBaseMs = backoffBase,
      backoffMaxMs = backoffMax)
  }

  /** `fromEnv` or throw — the `cmd/etl/main.go:20-24` startup shape. */
  def loadOrThrow(env: Map[String, String] = sys.env): GraftConfig =
    fromEnv(env).fold(e => throw new IllegalArgumentException(e), identity)
}
