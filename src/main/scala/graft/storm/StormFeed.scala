package graft.storm

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** Deterministic storm-report feed synthesized from the driver's
  * `events` table (TESTDATA.md) — the test-harness stand-in for the
  * reference's Kafka `raw-weather-reports` topic.
  *
  * The mapping is expressed once, in engine-common SQL (identical text
  * runs under Spark SQL and the DuckDB oracle), so the hash-checked
  * part of every storm query is the *enrichment logic*, not the feed
  * construction. Covers all raw-shape edge cases the reference handles:
  * UNK / blank magnitudes, EF-prefixed scales, bare vs "<dist> <dir>
  * <place>" locations, office codes vs lookalike "(k91)" comments,
  * RFC3339 vs legacy HHMM vs blank vs garbage times.
  */
object StormFeed {

  val adapterSql: String = """
SELECT
  event_id, ts,
  CASE event_type WHEN 'click' THEN 'hail' WHEN 'view' THEN 'hail'
    WHEN 'purchase' THEN 'wind' WHEN 'signup' THEN 'tornado'
    ELSE 'squall' END AS event_type,
  CASE WHEN event_id % 13 = 0 THEN 'UNK'
       WHEN event_id % 17 = 0 THEN ' '
       ELSE CAST(CAST(floor(value) AS BIGINT) AS STRING) END AS size,
  CASE WHEN event_id % 13 = 0 THEN 'UNK'
       WHEN event_id % 19 = 0 THEN CAST(event_id % 6 AS STRING)
       ELSE 'EF' || CAST(event_id % 6 AS STRING) END AS f_scale,
  CASE WHEN event_id % 13 = 0 THEN 'UNK'
       ELSE printf('%d.%d',
              CAST((CAST(floor(value * 7) AS BIGINT) - (CAST(floor(value * 7) AS BIGINT) % 10)) / 10 AS BIGINT),
              CAST(floor(value * 7) AS BIGINT) % 10) END AS speed,
  CASE WHEN event_id % 4 = 0 THEN 'TOWN' || CAST(user_id AS STRING)
       ELSE printf('%d.%d',
              CAST((CAST(floor(value) AS BIGINT) - (CAST(floor(value) AS BIGINT) % 10)) / 10 AS BIGINT),
              CAST(floor(value) AS BIGINT) % 10) || ' ' ||
            CASE user_id % 4 WHEN 0 THEN 'N' WHEN 1 THEN 'SW' WHEN 2 THEN 'ESE' ELSE 'W' END ||
            ' TOWN' || CAST(user_id AS STRING) END AS location,
  'C' || CAST(user_id % 10 AS STRING) AS county,
  CASE user_id % 5 WHEN 0 THEN 'TX' WHEN 1 THEN 'OK' WHEN 2 THEN 'KS' WHEN 3 THEN 'NE' ELSE 'IA' END AS state,
  printf('%d.%02d',
    CAST(25 + ((event_id % 2341) - ((event_id % 2341) % 100)) / 100 AS BIGINT),
    (event_id % 2341) % 100) AS lat,
  '-' || printf('%d.%02d',
    CAST(((12500 - (event_id % 5843)) - ((12500 - (event_id % 5843)) % 100)) / 100 AS BIGINT),
    (12500 - (event_id % 5843)) % 100) AS lon,
  CASE WHEN event_id % 3 = 0 THEN 'Report received at site ' || CAST(event_id AS STRING) || '. (' ||
         chr(65 + CAST(event_id % 26 AS INT)) || chr(65 + CAST(user_id % 26 AS INT)) || chr(65 + CAST(event_id % 7 AS INT)) || ')'
       WHEN event_id % 3 = 1 THEN 'Spotter report near marker ' || CAST(user_id AS STRING) || ' (k9' || CAST(event_id % 10 AS STRING) || ')'
       ELSE 'No remark.' END AS comments,
  CASE WHEN event_id % 7 = 0 THEN ''
       WHEN event_id % 5 = 0 THEN printf('%02d%02d', hour(ts), minute(ts))
       WHEN event_id % 23 = 0 THEN '9x77'
       ELSE printf('%04d-%02d-%02dT%02d:%02d:%02dZ', year(ts), month(ts), day(ts), hour(ts), minute(ts), second(ts)) END AS time
FROM events"""

  /** The raw feed as a DataFrame (column-per-field, Kafka-value-like). */
  def feed(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("events")
    spark.sql(adapterSql)
  }
}
