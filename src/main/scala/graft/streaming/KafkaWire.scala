package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.GraftConfig
import graft.storm.StormPipeline

/** Kafka wire adapter — topic-to-topic parity with the reference
  * (`/root/reference/internal/adapter/kafka/reader.go`, `writer.go`,
  * wired in `cmd/etl/main.go:28-31`): consume raw reports from the
  * source topic, enrich, produce `StormEvent`s keyed by the
  * deterministic ID to the sink topic.
  *
  * Everything up to the actual broker I/O is exercised by
  * `KafkaWireSpec` on static DataFrames — option plumbing, the
  * Kafka-record → wire-schema mapping, and the enriched-record →
  * Kafka-sink encoding (key/value/headers). The `.load()` / `.start()`
  * wrappers themselves are thin `format("kafka")` calls, compile-checked
  * here and runnable wherever `spark-sql-kafka-0-10` is on the
  * classpath (this sandbox has no broker or connector jar — the
  * file-source stand-in in [[StormStream]] carries the same
  * checkpointed at-least-once semantics for local verification).
  *
  * Offsets commit via the query checkpoint AFTER the sink write — the
  * reference's commit-after-load at-least-once contract
  * (`reader.go:37-39`, its `Commit` callback runs post-load);
  * redeliveries collapse downstream on the deterministic ID exactly as
  * its DB upsert does.
  */
object KafkaWire {

  /** Source options (reader.go:24-31: brokers, topic, group,
    * FirstOffset, 10 MB fetch cap). */
  def sourceOptions(cfg: GraftConfig): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> cfg.kafkaBrokers.mkString(","),
    "subscribe" -> cfg.kafkaSourceTopic,
    "kafka.group.id" -> cfg.kafkaGroupId,
    "startingOffsets" -> "earliest",
    "maxOffsetsPerTrigger" -> (cfg.batchSize.toLong * 1000).toString,
    "kafka.fetch.max.bytes" -> (10 * 1000 * 1000).toString,
    "failOnDataLoss" -> "false")

  /** Sink options (writer.go:24-31: brokers + sink topic; acks=all is
    * the Spark Kafka sink's default producer setting here). */
  def sinkOptions(cfg: GraftConfig): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> cfg.kafkaBrokers.mkString(","),
    "topic" -> cfg.kafkaSinkTopic,
    "kafka.acks" -> "all")

  /** Kafka source record → [[StormStream.wireSchema]] columns
    * (reader.go:80-94 `mapMessageToRawEvent`): the JSON payload rides
    * `value`, the envelope id is the partition-qualified offset (unique
    * and replay-stable within a topic; the file stand-in's synthetic
    * `event_id` plays the same role), event ts is the broker timestamp.
    * Packing: partition rides the TOP 20 bits (≤1M partitions), the
    * offset the low 44 (≈1.8·10¹³ per partition — beyond any retention
    * window at any throughput); a 2⁴⁰ offset field was reachable on
    * long-lived high-volume partitions and would have bled into the
    * partition bits and collided across partitions.
    * Works on any DataFrame with Kafka's (value, partition, offset,
    * timestamp) columns — which is what `format("kafka").load()`
    * exposes, and what the spec builds statically. */
  def toWire(kafka: DataFrame): DataFrame =
    kafka.select(
      // bitwise, not arithmetic: partitions >= 2^19 would overflow the
      // signed multiply and ANSI mode (Spark 4 default) makes that a
      // runtime error; shift+or is the actual bit-concatenation
      call_function("shiftleft", col("partition").cast("long"), lit(44))
        .bitwiseOR(col("offset")).as("event_id"),
      col("timestamp").as("ts"),
      col("value").cast("string").as("raw_value"))

  /** Enriched record → Kafka sink columns (writer.go:57-70
    * `serializeToMessage`): key = deterministic event ID, value = the
    * full enriched record as JSON, headers = event_type +
    * processed_at (RFC3339 wall clock — nondeterministic by design,
    * like the reference's `ProcessedAt`). */
  def toSinkRecords(enriched: DataFrame): DataFrame = {
    val payload: Column = to_json(struct(enriched.columns.map(col).toIndexedSeq: _*))
    enriched.select(
      col("id").cast("binary").as("key"),
      payload.cast("binary").as("value"),
      array(
        struct(lit("event_type").as("key"), col("event_type").cast("binary").as("value")),
        struct(lit("processed_at").as("key"),
          date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ssXXX")
            .cast("binary").as("value"))).as("headers"))
  }

  /** Streaming read of the source topic, mapped to the wire schema the
    * rest of the pipeline (parse → enrich → quarantine) consumes. */
  def readKafkaWire(spark: SparkSession, cfg: GraftConfig): DataFrame =
    toWire(spark.readStream.format("kafka").options(sourceOptions(cfg)).load())

  /** Consume → enrich → produce, the reference's whole `cmd/etl` loop:
    * well-formed records to the sink topic, poison pills to the
    * quarantine dir (parquet — a lake, not a topic, so the bad-record
    * forensics survive retention). Returns (sink query, quarantine
    * query); both share the config's checkpoint root. */
  def startTopicToTopic(spark: SparkSession, cfg: GraftConfig): (StreamingQuery, StreamingQuery) = {
    val wire = readKafkaWire(spark, cfg)
    val sink = toSinkRecords(StormStream.enriched(wire))
      .writeStream
      .format("kafka")
      .options(sinkOptions(cfg))
      .option("checkpointLocation", s"${cfg.checkpointDir}/kafka-sink")
      .trigger(Trigger.ProcessingTime(cfg.batchFlushIntervalMs))
      .start()
    val quarantine = StormStream.quarantined(wire)
      .writeStream
      .format("parquet")
      .option("path", cfg.quarantineDir)
      .option("checkpointLocation", s"${cfg.checkpointDir}/kafka-quarantine")
      .trigger(Trigger.ProcessingTime(cfg.batchFlushIntervalMs))
      .start()
    (sink, quarantine)
  }
}
