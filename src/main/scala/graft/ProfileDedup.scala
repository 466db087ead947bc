package graft

import org.apache.spark.sql.functions._
import graft.storm.{StormFeed, StormPipeline}

/** Scratch profiler for storm_dedup's stage costs (round-4 look at its
  * 4s suite time). Times each prefix of the pipeline in one JVM. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val f = StormFeed.feed(spark, sfDir)
    t("feed")(f.count())
    t("feed_again")(f.count())
    t("union")(f.unionAll(f).count())
    t("enrich_union")(StormPipeline.enrich(f.unionAll(f)).count())
    t("enrich_union_2")(StormPipeline.enrich(f.unionAll(f)).count())
    t("select2")(StormPipeline.enrich(f.unionAll(f))
      .select(col("id"), col("event_type")).count())
    t("dropdup")(StormPipeline.enrich(f.unionAll(f))
      .select(col("id"), col("event_type")).dropDuplicates("id").count())
    t("full")(StormPipeline.enrich(f.unionAll(f))
      .select(col("id"), col("event_type")).dropDuplicates("id")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_unique"))
      .orderBy(col("event_type")).count())
    t("full_again")(StormPipeline.enrich(f.unionAll(f))
      .select(col("id"), col("event_type")).dropDuplicates("id")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_unique"))
      .orderBy(col("event_type")).count())
    // force-evaluate the id column WITHOUT an aggregation on it:
    // count() prunes projections, so wrap in an agg over a derived value
    t("ids_only_eval")(StormPipeline.enrich(f.unionAll(f))
      .agg(count(when(length(col("id")) > 3, 1)).as("n")).head().getLong(0))
    t("all_cols_eval")(StormPipeline.enrich(f.unionAll(f))
      .agg(count(when(length(concat_ws("|", col("id"), col("severity"),
        col("location_name"), col("event_time_str"))) > 3, 1)).as("n"))
      .head().getLong(0))
    val two = StormPipeline.enrich(f.unionAll(f))
      .select(col("id"), col("event_type")).localCheckpoint()
    t("dedup_of_materialized")(two.dropDuplicates("id").count())
    t("dedup_of_materialized_2")(two.dropDuplicates("id").count())
    // isolate sub-costs over the same doubled feed
    val u = f.unionAll(f)
    def forced(c: org.apache.spark.sql.Column): Long =
      u.agg(count(when(c.isNotNull, 1)).as("n")).head().getLong(0)
    t("feed_strings_only")(forced(length(col("location")) + length(col("comments"))))
    t("parsefloat_latlon")(forced(
      graft.storm.StormFunctions.parseFloatOrZero(col("lat")) +
      graft.storm.StormFunctions.parseFloatOrZero(col("lon"))))
    t("magraw_only")(forced(graft.storm.StormFunctions.magnitudeRaw(
      col("event_type"), col("size"), col("f_scale"), col("speed"))))
    t("eventtime_only")(forced(graft.storm.StormFunctions.parseEventTime(
      col("ts"), col("time"))))
    t("sha_only")(forced(sha2(concat_ws("|", col("event_type"), col("state"),
      col("time"), col("location")), 256)))
    // A/B the id expression forms in ONE JVM (cross-run numbers are
    // host-wave-noisy): old = format_string payload + sha duplicated
    // across CASE branches; new = decimal-cast renders + sha once
    import graft.storm.StormFunctions.{magnitudeRaw, parseFloatOrZero}
    val latD = parseFloatOrZero(col("lat"))
    val lonD = parseFloatOrZero(col("lon"))
    val magR = magnitudeRaw(col("event_type"), col("size"), col("f_scale"), col("speed"))
    val oldPayload = concat_ws("|", col("event_type"), col("state"),
      format_string("%.4f", latD), format_string("%.4f", lonD),
      col("time"), format_string("%.2f", magR))
    val oldShort = substring(sha2(oldPayload, 256), 1, 16)
    val oldId = when(col("event_type") === "", oldShort)
      .otherwise(concat(col("event_type"), lit("-"), oldShort))
    val newId = graft.storm.StormFunctions.generateId(col("event_type"),
      col("state"), latD, lonD, col("time"), magR)
    for (i <- 1 to 3) {
      t(s"id_OLD_$i")(forced(length(oldId) > 3))
      t(s"id_NEW_$i")(forced(length(newId) > 3))
    }
    t("ids_equal")(u.agg(count(when(oldId === newId, 1)).as("n")).head().getLong(0))
    spark.stop()
  }
}
