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
    * partition columns), then swapping directories via two renames.
    * Content is byte-identical rows, just re-packed.
    *
    * Crash-safety of the swap (NOT atomic — directory rename is a
    * metadata op on HDFS/local but copy+delete on object stores, and
    * two renames always leave a gap): the live dir is renamed ASIDE
    * first (`dir` → `dir.compact-old`), then the compacted tmp takes
    * its place, then the old copy is deleted. A crash at any point
    * leaves EVERY row recoverable on disk — either the lake is intact,
    * or the full pre-compaction copy sits at `dir.compact-old` (a
    * previous fs.delete(dst)-then-rename ordering could crash holding
    * only the tmp dir, i.e. silent lake unavailability at the live
    * path). Readers racing the swap can observe a missing dir for the
    * instant between the renames — schedule compaction in the
    * maintenance window, or serve readers through a versioned-pointer
    * layout (manifest file naming the current version dir) when
    * 24/7 reads must never block. */
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
    val src = new org.apache.hadoop.fs.Path(tmp)
    val dst = new org.apache.hadoop.fs.Path(dir)
    val old = new org.apache.hadoop.fs.Path(dir + ".compact-old")
    fs.delete(old, true) // leftover from a crashed previous run
    if (!fs.rename(dst, old))
      throw new java.io.IOException(s"compact: could not move $dst aside to $old")
    if (!fs.rename(src, dst)) {
      // restore the original lake before failing — nothing is lost
      fs.rename(old, dst)
      throw new java.io.IOException(s"compact: could not promote $src to $dst")
    }
    fs.delete(old, true)
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
