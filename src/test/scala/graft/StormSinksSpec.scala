package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.StormSinks
import graft.storm.{StormFeed, StormPipeline}

class StormSinksSpec extends SparkSpec {

  test("partitioned lake write: pruning layout + replay-idempotent merge") {
    val out = Files.createTempDirectory("graft-sink").toString + "/lake"
    val enriched = StormPipeline.enrich(StormFeed.feed(spark, sfDir))
    val n = enriched.count()

    val written = StormSinks.mergeById(enriched, out)
    assert(written == n)
    // physical layout: event_type=<v>/event_date=<d> directories
    val typeDirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(typeDirs.nonEmpty && typeDirs.forall(_.startsWith("event_type=")))

    // partition pruning: a type+date filter must prune the scan
    val lake = spark.read.parquet(out)
    assert(lake.count() == n)
    val pruned = lake.where(col("event_type") === "hail")
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))

    // replaying the same batch (at-least-once redelivery) adds nothing
    assert(StormSinks.mergeById(enriched, out) == 0)
    assert(spark.read.parquet(out).count() == n)

    // a genuinely new record still lands
    val extra = StormPipeline.enrich(
      StormFeed.feed(spark, sfDir).limit(1)
        .withColumn("state", lit("ZZ")))
    assert(StormSinks.mergeById(extra, out) == 1)
    assert(spark.read.parquet(out).count() == n + 1)
  }
}
