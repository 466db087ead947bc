package graft

import org.scalatest.funsuite.AnyFunSuite

/** GraftConfig.fromEnv — defaults, overrides, and rejected invalid
  * values, mirroring the reference's config_test.go cases. */
class GraftConfigSpec extends AnyFunSuite {

  test("all defaults (empty env) mirror the reference's") {
    val cfg = GraftConfig.fromEnv(Map.empty).toOption.get
    assert(cfg.kafkaBrokers == Seq("kafka:9092"))
    assert(cfg.kafkaSourceTopic == "raw-weather-reports")
    assert(cfg.kafkaSinkTopic == "transformed-weather-data")
    assert(cfg.kafkaGroupId == "storm-data-etl")
    assert(cfg.httpAddr == ":8080" && cfg.httpPort == 8080)
    assert(cfg.logLevel == "info" && cfg.logFormat == "json")
    assert(cfg.shutdownTimeoutMs == 10000L)
    assert(cfg.batchSize == 50)
    assert(cfg.batchFlushIntervalMs == 500L)
    assert(cfg.maxRestarts == 5)
    assert(cfg.backoffBaseMs == 200L && cfg.backoffMaxMs == 5000L)
  }

  test("every env override lands (reference TestLoad_CustomEnv)") {
    val cfg = GraftConfig.fromEnv(Map(
      "KAFKA_BROKERS" -> "broker1:9092, broker2:9092",
      "KAFKA_SOURCE_TOPIC" -> "custom-source",
      "KAFKA_SINK_TOPIC" -> "custom-sink",
      "KAFKA_GROUP_ID" -> "custom-group",
      "HTTP_ADDR" -> ":9090",
      "LOG_LEVEL" -> "debug",
      "LOG_FORMAT" -> "text",
      "SHUTDOWN_TIMEOUT" -> "30s",
      "BATCH_SIZE" -> "100",
      "BATCH_FLUSH_INTERVAL" -> "1s",
      "GRAFT_SOURCE_DIR" -> "/lake/in",
      "GRAFT_MAX_RESTARTS" -> "9",
      "GRAFT_BACKOFF_BASE" -> "50ms",
      "GRAFT_BACKOFF_MAX" -> "2s")).toOption.get
    assert(cfg.kafkaBrokers == Seq("broker1:9092", "broker2:9092"))
    assert(cfg.kafkaSourceTopic == "custom-source")
    assert(cfg.kafkaSinkTopic == "custom-sink")
    assert(cfg.kafkaGroupId == "custom-group")
    assert(cfg.httpPort == 9090)
    assert(cfg.logLevel == "debug" && cfg.logFormat == "text")
    assert(cfg.shutdownTimeoutMs == 30000L)
    assert(cfg.batchSize == 100)
    assert(cfg.batchFlushIntervalMs == 1000L)
    assert(cfg.sourceDir == "/lake/in")
    assert(cfg.maxRestarts == 9)
    assert(cfg.backoffBaseMs == 50L && cfg.backoffMaxMs == 2000L)
  }

  test("invalid values are errors naming the variable, not silent defaults") {
    def err(kv: (String, String)*): String =
      GraftConfig.fromEnv(kv.toMap).swap.toOption.get
    assert(err("SHUTDOWN_TIMEOUT" -> "not-a-duration").contains("SHUTDOWN_TIMEOUT"))
    assert(err("SHUTDOWN_TIMEOUT" -> "-1s").contains("SHUTDOWN_TIMEOUT"))
    assert(err("BATCH_SIZE" -> "0").contains("BATCH_SIZE"))
    assert(err("BATCH_SIZE" -> "9999").contains("BATCH_SIZE"))
    assert(err("BATCH_FLUSH_INTERVAL" -> "1 banana").contains("BATCH_FLUSH_INTERVAL"))
    assert(err("KAFKA_SOURCE_TOPIC" -> "").contains("KAFKA_SOURCE_TOPIC"))
    assert(err("KAFKA_BROKERS" -> ",,").contains("KAFKA_BROKERS"))
    assert(err("HTTP_ADDR" -> "nope").contains("HTTP_ADDR"))
    assert(err("GRAFT_BACKOFF_BASE" -> "10s", "GRAFT_BACKOFF_MAX" -> "1s")
      .contains("GRAFT_BACKOFF_BASE"))
    assert(GraftConfig.fromEnv(Map("BATCH_SIZE" -> "1000")).isRight)
    intercept[IllegalArgumentException] {
      GraftConfig.loadOrThrow(Map("BATCH_SIZE" -> "-3"))
    }
  }
}
