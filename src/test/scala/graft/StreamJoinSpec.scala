package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.StreamJoin

/** Stream-stream interval join (SURVEY §2 #67): the watermarked
  * two-sided stateful join produces the same rows as the static join
  * when the watermark delay exceeds the data's disorder, and
  * checkpoint replay adds nothing. */
class StreamJoinSpec extends SparkSpec {

  test("stream-stream interval join == static join; replay is idempotent") {
    val base = Files.createTempDirectory("graft-stream-join").toString
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .withColumn("ts", col("ts").cast("timestamp"))
    // several files so the join spans micro-batches (files arrive in
    // arbitrary event-time order — the wide delay covers the disorder)
    ev.coalesce(4).write.mode("overwrite").parquet(s"$base/in")

    // 45-day watermark > the 30-day dataset span: nothing evicted, so
    // stream results must exactly equal the static join
    StreamJoin.start(spark, s"$base/in", s"$base/out", s"$base/cp",
        maxLagSec = 3600, delay = "45 days")
      .awaitTermination()

    val streamed = spark.read.parquet(s"$base/out")
    val static = StreamJoin.joined(
      ev.where(col("event_type") === "click"),
      ev.where(col("event_type") === "purchase"), maxLagSec = 3600)
    assert(streamed.count() > 0, "join produced nothing")
    val sCols = streamed.select(static.columns.map(col).toSeq: _*)
    assert(sCols.exceptAll(static).isEmpty && static.exceptAll(sCols).isEmpty,
      "stream join != static join")

    // restart on the same checkpoint with no new input: no duplicates
    StreamJoin.start(spark, s"$base/in", s"$base/out", s"$base/cp",
        maxLagSec = 3600, delay = "45 days")
      .awaitTermination()
    assert(spark.read.parquet(s"$base/out").count() == static.count())
  }
}
