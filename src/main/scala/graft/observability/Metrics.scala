package graft.observability

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Pipeline observability — the Spark-native equivalent of the
  * reference's Prometheus counters/histograms/gauge
  * (/root/reference/internal/observability/metrics.go): rows in/out,
  * poison-pill count, bytes read, task time.
  *
  * Row counters ride `Dataset.observe` — Spark's purpose-built
  * observation node: aggregates are computed inside the existing
  * codegen'd plan (no UDF, no extra pass) and delivered to the driver
  * exactly once per successful action via QueryExecutionListener
  * (batch) or in each StreamingQueryProgress (streams). Unlike
  * transformation-side accumulators, task retries and speculative
  * duplicates never double-count.
  */
final class Metrics(spark: SparkSession) {

  /** Observation-point name attached by [[instrumentParsed]]. */
  val observationName = "graft_parse"

  private val rowsIn = new AtomicLong(0)
  private val rowsOut = new AtomicLong(0)
  private val poisonPills = new AtomicLong(0)
  private val recordsRead = new AtomicLong(0)
  private val bytesRead = new AtomicLong(0)
  private val taskTimeMs = new AtomicLong(0)

  /** Instrument a parsed wire DataFrame (must carry `parse_ok`): counts
    * total/good/poison rows at this point of the plan. Works unchanged
    * for batch (counters roll up via QueryExecutionListener) and
    * streaming (per-batch values surface in
    * StreamingQueryProgress.observedMetrics — see [[StreamMetrics]]). */
  def instrumentParsed(parsed: DataFrame): DataFrame =
    parsed.observe(observationName,
      count(lit(1)).as("rows_in"),
      count(when(col("parse_ok"), 1)).as("rows_out"),
      count(when(!col("parse_ok"), 1)).as("poison_pills"))

  /** Roll an observed-metrics row (from either listener kind) into the
    * cumulative counters. */
  private[graft] def record(row: org.apache.spark.sql.Row): Unit = {
    rowsIn.addAndGet(row.getAs[Long]("rows_in"))
    rowsOut.addAndGet(row.getAs[Long]("rows_out"))
    poisonPills.addAndGet(row.getAs[Long]("poison_pills"))
  }

  private val qeListener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.get(observationName).foreach(record)
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
  }
  spark.listenerManager.register(qeListener)

  private val taskListener = new SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        recordsRead.addAndGet(m.inputMetrics.recordsRead)
        bytesRead.addAndGet(m.inputMetrics.bytesRead)
        taskTimeMs.addAndGet(m.executorRunTime)
      }
    }
  }
  spark.sparkContext.addSparkListener(taskListener)

  def snapshot: Map[String, Long] = Map(
    "rows_in" -> rowsIn.get, "rows_out" -> rowsOut.get,
    "poison_pills" -> poisonPills.get,
    "records_read" -> recordsRead.get, "bytes_read" -> bytesRead.get,
    "task_time_ms" -> taskTimeMs.get)

  def unregister(): Unit = {
    spark.listenerManager.unregister(qeListener)
    spark.sparkContext.removeSparkListener(taskListener)
  }
}
