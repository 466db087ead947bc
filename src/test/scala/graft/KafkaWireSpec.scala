package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.storm.{StormFeed, StormPipeline}
import graft.streaming.{KafkaWire, StormStream}

/** Kafka adapter parity (SURVEY §2 #16f): everything short of broker
  * I/O — option plumbing from GraftConfig, Kafka-record → wire-schema
  * mapping feeding the SAME enrich pipeline, and the sink encoding
  * (key/value/headers) — exercised on static DataFrames shaped exactly
  * like `format("kafka")`'s relation. Broker integration is out of
  * sandbox scope (no connector jar / broker); the semantics match the
  * file stand-in pinned by StormStreamSpec. */
class KafkaWireSpec extends SparkSpec {

  private val cfg = GraftConfig.fromEnv(Map(
    "KAFKA_BROKERS" -> "b1:9092,b2:9092",
    "KAFKA_SOURCE_TOPIC" -> "raw-in",
    "KAFKA_SINK_TOPIC" -> "enriched-out",
    "KAFKA_GROUP_ID" -> "graft-etl")).toOption.get

  test("source/sink options carry the reference reader/writer config") {
    val src = KafkaWire.sourceOptions(cfg)
    assert(src("kafka.bootstrap.servers") == "b1:9092,b2:9092")
    assert(src("subscribe") == "raw-in")
    assert(src("kafka.group.id") == "graft-etl")
    assert(src("startingOffsets") == "earliest") // reader.go FirstOffset
    assert(src("kafka.fetch.max.bytes") == "10000000") // reader.go MaxBytes
    val sink = KafkaWire.sinkOptions(cfg)
    assert(sink("kafka.bootstrap.servers") == "b1:9092,b2:9092")
    assert(sink("topic") == "enriched-out")
    assert(sink("kafka.acks") == "all") // writer.go RequireAll
  }

  /** The feed rendered as Kafka source records (the connector's exact
    * relation schema: key/value binary, topic, partition, offset,
    * timestamp, timestampType). */
  private def kafkaShaped() = {
    val wire = StormPipeline.toRawJson(StormFeed.feed(spark, sfDir))
      .select(col("event_id"), col("ts"), col("raw_value"))
    wire.select(
      lit(null).cast(BinaryType).as("key"),
      col("raw_value").cast(BinaryType).as("value"),
      lit("raw-in").as("topic"),
      (col("event_id") % 3).cast(IntegerType).as("partition"),
      col("event_id").as("offset"),
      col("ts").as("timestamp"),
      lit(0).as("timestampType"))
  }

  test("toWire maps Kafka records onto the wire schema; enrich runs unchanged") {
    val kafka = kafkaShaped()
    val wire = KafkaWire.toWire(kafka)
    assert(wire.schema.fieldNames.toSeq == Seq("event_id", "ts", "raw_value"))
    assert(wire.schema("raw_value").dataType == StringType)
    // partition-qualified ids stay unique
    assert(wire.select("event_id").distinct().count() == kafka.count())
    // the SAME enrichment pipeline consumes the mapped stream 1:1
    val enriched = StormPipeline.enrich(
      StormPipeline.parseRawJson(wire).where(col("parse_ok")))
    assert(enriched.count() == kafka.count())
    assert(enriched.columns.contains("severity") && enriched.columns.contains("id"))
  }

  test("toSinkRecords encodes key=id, value=full JSON, headers per writer.go") {
    val enriched = StormPipeline.enrich(
      StormPipeline.parseRawJson(KafkaWire.toWire(kafkaShaped()))
        .where(col("parse_ok")))
    val recs = KafkaWire.toSinkRecords(enriched)
    assert(recs.schema.fieldNames.toSeq == Seq("key", "value", "headers"))
    assert(recs.schema("key").dataType == BinaryType)
    assert(recs.schema("value").dataType == BinaryType)
    val r = recs.where(length(col("key")) > lit(17)).select(
      col("key").cast("string").as("k"),
      col("value").cast("string").as("v"),
      transform(col("headers"), h => h.getField("key")).as("hk")).head()
    val id = r.getString(0)
    assert(id.matches("[a-z]+-[0-9a-f]{16}"), s"key not a deterministic id: $id")
    assert(recs.where(col("key").isNull).count() == 0)
    assert(r.getString(1).contains(s""""id":"$id""""), "value JSON must embed the key id")
    assert(r.getSeq[String](2) == Seq("event_type", "processed_at"))
  }

  test("envelope ids stay collision-free past 2^40 offsets (20-bit partition field)") {
    import spark.implicits._
    // long-lived high-volume partitions reach offsets >= 2^40 (~1.1e12);
    // the old partition*2^40 packing bled them into the partition field
    // (partition 0 offset 2^40 collided with partition 1 offset 0)
    val rows = Seq(
      (0, (1L << 40)),      // old packing: collides with (1, 0)
      (1, 0L),
      (0, (1L << 42) + 7L), // old packing: collides with (4, 7)
      (4, 7L),
      (1048575, (1L << 44) - 1L) // max partition, max offset: top of the id space
    ).toDF("partition", "offset")
      .select(col("partition"), col("offset"),
        lit(null).cast("binary").as("value"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("timestamp"))
    val ids = KafkaWire.toWire(rows).select("event_id").collect().map(_.getLong(0))
    assert(ids.distinct.length == rows.count(), s"envelope ids collided: ${ids.toSeq}")
  }

  test("config-driven entry points compile against the shared surface") {
    // compile-time proof the cfg overloads exist and typecheck; not
    // started (no broker). The file-mode equivalents run in
    // StormStreamSpec / ObservabilitySpec.
    val fns = (
      KafkaWire.readKafkaWire(_: org.apache.spark.sql.SparkSession, _: GraftConfig),
      KafkaWire.startTopicToTopic(_: org.apache.spark.sql.SparkSession, _: GraftConfig),
      StormStream.startEnrichment(_: org.apache.spark.sql.SparkSession, _: GraftConfig))
    assert(fns != null)
  }
}
