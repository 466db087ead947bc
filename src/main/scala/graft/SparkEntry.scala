package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full storm-enrichment pipeline (SURVEY §2 #10). */
  def entry(spark: SparkSession): DataFrame =
    queries("storm_enrich")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.analytics.Analytics.queries ++
      graft.storm.StormQueries.queries ++
      graft.operators.PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.analytics.Analytics.oracleSql ++
      graft.storm.StormQueries.oracleSql ++
      graft.operators.PipelineQueries.oracleSql
}
