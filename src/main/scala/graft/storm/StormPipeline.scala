package graft.storm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import StormFunctions._

/** The batch enrichment pipeline: raw feed columns -> enriched storm
  * events. Equivalent of ParseRawEvent + EnrichStormEvent
  * (/root/reference/internal/domain/transform.go:23-45,146-166) as one
  * declarative `select` — a narrow map over the scan, no shuffle,
  * fully whole-stage-codegen'd.
  */
object StormPipeline {

  /** Wire schema of the collector's JSON payload (RawCSVRecord,
    * /root/reference/internal/domain/event.go:12-25). */
  val rawSchema: StructType = StructType(Seq(
    "Time", "Size", "F_Scale", "Speed", "Location", "County",
    "State", "Lat", "Lon", "Comments", "EventType").map(StructField(_, StringType)))

  /** Render a feed row as its Kafka-wire JSON value. */
  def toRawJson(df: DataFrame): DataFrame =
    df.withColumn("raw_value", to_json(struct(
      col("time").as("Time"), col("size").as("Size"),
      col("f_scale").as("F_Scale"), col("speed").as("Speed"),
      col("location").as("Location"), col("county").as("County"),
      col("state").as("State"), col("lat").as("Lat"), col("lon").as("Lon"),
      col("comments").as("Comments"), col("event_type").as("EventType"))))

  /** Parse Kafka-wire JSON values back to feed columns. `parse_ok`
    * marks poison pills (malformed payloads) — they are quarantined by
    * the caller, never fatal (reference pipeline.go poison-pill rule). */
  def parseRawJson(df: DataFrame, valueCol: String = "raw_value"): DataFrame = {
    val parsed = from_json(col(valueCol), rawSchema)
    // PERMISSIVE from_json yields an all-null struct for corrupt JSON
    // (not a null struct), so poison detection keys on a field the
    // collector always populates.
    df.withColumn("rec", parsed)
      .withColumn("parse_ok", col("rec").isNotNull && col("rec.EventType").isNotNull)
      .select(
        col("event_id"), col("ts"), col("parse_ok"),
        col("rec.EventType").as("event_type"), col("rec.Size").as("size"),
        col("rec.F_Scale").as("f_scale"), col("rec.Speed").as("speed"),
        col("rec.Location").as("location"), col("rec.County").as("county"),
        col("rec.State").as("state"), col("rec.Lat").as("lat"),
        col("rec.Lon").as("lon"), col("rec.Comments").as("comments"),
        col("rec.Time").as("time"))
  }

  /** Full enrichment over raw feed columns. Output uses engine-stable
    * types (doubles parsed from canonical strings, RFC3339 strings for
    * times) so results hash identically across engines.
    *
    * Staged as successive projections over *attribute references* —
    * composing the Columns directly in Scala would inline each derived
    * tree into every consumer (severity alone references magnitude 9×,
    * which references etype/unit/mag_raw trees again), blowing the
    * expression tree up exponentially and stalling the optimizer.
    * Catalyst keeps these stages separate (CollapseProject refuses to
    * duplicate non-cheap expressions), so each value is computed once
    * per row; the whole thing remains a narrow, codegen'd map.
    */
  def enrich(feed: DataFrame): DataFrame =
    feed
      .select(col("*"),
        magnitudeRaw(col("event_type"), col("size"), col("f_scale"), col("speed")).as("mag_raw"),
        parseFloatOrZero(col("lat")).as("lat_d"),
        parseFloatOrZero(col("lon")).as("lon_d"),
        parseEventTime(col("ts"), col("time")).as("event_time"),
        normalizeEventType(col("event_type")).as("etype"))
      .select(col("*") +:
        (Seq(
          normalizeUnit(col("etype"), lit("")).as("unit_n"),
          generateId(col("event_type"), col("state"), col("lat_d"), col("lon_d"),
            col("time"), col("mag_raw")).as("id")) ++
          // location regex runs ONCE here as staged attributes; the
          // final projection's three location outputs are cheap whens
          // over these (the standalone trio would re-execute locRe per
          // output column)
          locationParts(col("location")).map { case (n, c) => c.as(n) }): _*)
      .select(col("*"),
        normalizeMagnitude(col("etype"), col("mag_raw"), col("unit_n")).as("mag_n"))
      .select(
        col("event_id"),
        col("id"),
        col("etype").as("event_type"),
        col("lat_d").as("lat"), col("lon_d").as("lon"),
        col("mag_n").as("magnitude"),
        col("unit_n").as("unit"),
        deriveSeverity(col("etype"), col("mag_n")).as("severity"),
        rfc3339(col("event_time")).as("event_time_str"),
        rfc3339(deriveTimeBucket(col("event_time"))).as("time_bucket_str"),
        extractSourceOffice(col("comments")).as("source_office"),
        col("location").as("location_raw"),
        locationNameFromParts(col("loc_t"), col("loc_dir_s"), col("loc_name_s"))
          .as("location_name"),
        locationDistanceFromParts(col("loc_dist_s")).as("location_distance"),
        locationDirectionFromParts(col("loc_dir_s")).as("location_direction"),
        col("state"), col("county"))
}
