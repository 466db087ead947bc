package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.storm.StormPipeline

/** Explicit-schema readers for the storm wire formats (reference ingest
  * surface: CSV-style JSON records, /root/reference/internal/domain/
  * event.go:12-25). Schema inference is disabled by construction —
  * at 100 TB an inference pass is a second full scan, and a drifting
  * inferred schema silently changes downstream types.
  */
object StormSources {

  /** JSON wire records (RawCSVRecord objects): JSON-lines by default,
    * `multiLine = true` for a pretty-printed JSON array file (the shape
    * the reference's genmock fixtures use). */
  def rawJson(spark: SparkSession, path: String, multiLine: Boolean = false): DataFrame =
    spark.read
      .option("multiLine", multiLine.toString)
      .schema(StormPipeline.rawSchema).json(path)

  /** Headered CSV of RawCSVRecord fields (all strings on the wire). */
  def rawCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(StormPipeline.rawSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Parquet with schema assertion: fail fast on drift instead of
    * propagating a surprise column type into the pipeline. */
  def parquetChecked(spark: SparkSession, path: String,
      expected: org.apache.spark.sql.types.StructType): DataFrame = {
    val df = spark.read.parquet(path)
    val got = df.schema.map(f => f.name -> f.dataType).toMap
    expected.foreach { f =>
      require(got.get(f.name).contains(f.dataType),
        s"schema drift on '${f.name}': expected ${f.dataType}, found ${got.get(f.name)}")
    }
    df
  }
}
