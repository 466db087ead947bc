package graft

import org.apache.spark.sql.SparkSession

/** Shared session construction for every entry point (Bench, Verify,
  * Smoke, Explain, Profile, tests): one place for the graft SQL
  * extensions and the engine-stability configs, so no read-path
  * accessor ever mutates session state as a side effect. */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries INT64 TIMESTAMP(NANOS), which Spark only
      // reads as long behind this flag; set once at construction (it
      // previously leaked out of Tables.events mid-session)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // keep managed-table data (bucketed-table tests/tools) out of
      // the repo working dir
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-warehouse")
      .config("spark.ui.enabled", "false")
}
