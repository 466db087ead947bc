package graft

import org.apache.spark.sql.functions._
import graft.observability.Metrics
import graft.storm.{StormFeed, StormPipeline}

class ObservabilitySpec extends SparkSpec {

  test("metrics count rows in/out and poison pills via accumulators") {
    val m = new Metrics(spark)
    val wire = StormPipeline.toRawJson(StormFeed.feed(spark, sfDir))
      .withColumn("raw_value",
        when(col("event_id") % 97 === 0, substring(col("raw_value"), 1, 10))
          .otherwise(col("raw_value")))
    val parsed = m.countParsed(StormPipeline.parseRawJson(wire))
    val good = parsed.where(col("parse_ok")).count()
    val snap = m.snapshot
    assert(snap("rows_in") == 1000)
    assert(snap("poison_pills") == snap("rows_in") - good)
    assert(snap("rows_out") == good)
    assert(snap("records_read") > 0)
    m.unregister()
  }
}
