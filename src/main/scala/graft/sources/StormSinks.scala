package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write surface for enriched storm events — the Spark-native
  * equivalent of the reference's Kafka produce + Postgres upsert
  * (/root/reference/internal/pipeline): a partitioned parquet lake
  * layout plus an idempotent-merge writer.
  *
  * Scale notes: partitioning by (event_type, event_date) gives
  * partition pruning on the two dominant predicates (type filters and
  * date ranges) at any size; writes stay one file per task within each
  * partition. The merge writer reproduces the reference's
  * ON CONFLICT DO NOTHING semantics on the deterministic event ID,
  * which is what makes at-least-once replays collapse.
  */
object StormSinks {

  /** Append enriched events as parquet partitioned by
    * (event_type, event_date). `maxRecordsPerFile` bounds file size
    * so a skewed partition (one storm-heavy day) still produces
    * splittable files. */
  def writePartitioned(enriched: DataFrame, outDir: String,
      maxRecordsPerFile: Long = 5000000L): Unit =
    enriched
      .withColumn("event_date", substring(col("event_time_str"), 1, 10))
      .write
      .partitionBy("event_type", "event_date")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("append")
      .parquet(outDir)

  /** Idempotent merge into an existing lake dir: drop incoming rows
    * whose deterministic `id` already exists (ON CONFLICT DO NOTHING,
    * reference transform.go:127-139 rationale), then append the rest.
    * The anti-join reads only the `id` column of the target (column
    * pruning) and broadcasts nothing — it shuffles on the 8-byte id. */
  def mergeById(enriched: DataFrame, outDir: String): Long = {
    val spark = enriched.sparkSession
    val existing =
      try spark.read.parquet(outDir).select(col("id"))
      catch { case _: Throwable => return { writePartitioned(enriched, outDir); enriched.count() } }
    val fresh = enriched.join(existing, Seq("id"), "left_anti")
      .localCheckpoint() // materialize BEFORE writing into the dir we read
    val n = fresh.count()
    if (n > 0) writePartitioned(fresh, outDir)
    n
  }
}
