package graft

import org.apache.spark.sql.functions._
import graft.observability.Metrics
import graft.storm.{StormFeed, StormPipeline}

class ObservabilitySpec extends SparkSpec {

  test("observe-based metrics count rows in/out and poison pills, no UDF") {
    val m = new Metrics(spark)
    val wire = StormPipeline.toRawJson(StormFeed.feed(spark, sfDir))
      .withColumn("raw_value",
        when(col("event_id") % 97 === 0, substring(col("raw_value"), 1, 10))
          .otherwise(col("raw_value")))
    val parsed = m.instrumentParsed(StormPipeline.parseRawJson(wire))
    val good = parsed.where(col("parse_ok")).count()
    // QueryExecutionListener delivery is asynchronous — wait for it
    org.apache.spark.graft.TestBus.drain(spark.sparkContext)
    val snap = m.snapshot
    assert(snap("rows_in") == 1000)
    assert(snap("rows_out") == good)
    assert(snap("poison_pills") == snap("rows_in") - good)
    assert(snap("records_read") > 0)
    // the observation node is plan-native: no ScalaUDF anywhere
    assert(!parsed.queryExecution.executedPlan.toString.contains("UDF"))
    m.unregister()
  }

  test("observe counters are exactly-once per action (second action re-counts once)") {
    val m = new Metrics(spark)
    val parsed = m.instrumentParsed(
      StormPipeline.parseRawJson(StormPipeline.toRawJson(StormFeed.feed(spark, sfDir))))
    parsed.count()
    parsed.count()
    org.apache.spark.graft.TestBus.drain(spark.sparkContext)
    // two separate actions -> two deliveries, each exactly the row count
    assert(m.snapshot("rows_in") == 2000)
    m.unregister()
  }
}
