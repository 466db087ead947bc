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

  /** Small-file compaction — the lake-maintenance pass every
    * append-heavy layout needs: streaming micro-batches and per-task
    * writes accumulate files far below the ideal scan granularity,
    * and at 100 TB the file-listing + task-scheduling overhead of
    * millions of tiny files dominates reads. Rewrites the directory
    * to `targetFiles` files per (event_type, event_date) partition
    * (the write stays partition-parallel: one shuffle keyed on the
    * partition columns), atomically swapping via a temp dir + rename
    * so a reader never sees a half-compacted lake. Content is
    * byte-identical rows, just re-packed. */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetFiles: Int = 1): Unit = {
    require(targetFiles > 0, s"targetFiles must be positive, got $targetFiles")
    val df = spark.read.parquet(dir)
    val tmp = dir + ".compact-tmp"
    // repartition on (partition cols + a bounded salt): each lake
    // partition's rows land in exactly `targetFiles` tasks — per-
    // partition file count control that stays parallel ACROSS
    // partitions (a plain repartition(n) would serialize everything
    // through n tasks total)
    df.repartition(col("event_type"), col("event_date"),
        pmod(xxhash64(col("id")), lit(targetFiles.toLong)))
      .write
      .partitionBy("event_type", "event_date")
      .mode("overwrite")
      .parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val (src, dst) = (new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(dir))
    fs.delete(dst, true)
    fs.rename(src, dst)
  }

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
