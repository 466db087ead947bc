package graft.observability

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Pipeline observability — the Spark-native equivalent of the
  * reference's Prometheus counters/histograms/gauge
  * (/root/reference/internal/metrics): rows in/out, poison-pill count,
  * bytes read, task time. Counters are driver-side accumulators
  * (exactly-once per successful task from Spark's accumulator
  * semantics for actions) plus a SparkListener rolling up executor
  * metrics — no per-row driver work, so observability is free at scale.
  */
final class Metrics(spark: SparkSession) extends Serializable {
  val rowsIn: LongAccumulator = spark.sparkContext.longAccumulator("graft.rows_in")
  val rowsOut: LongAccumulator = spark.sparkContext.longAccumulator("graft.rows_out")
  val poisonPills: LongAccumulator = spark.sparkContext.longAccumulator("graft.poison_pills")

  private val recordsRead = new AtomicLong(0)
  private val bytesRead = new AtomicLong(0)
  private val taskTimeMs = new AtomicLong(0)

  private val listener = new SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        recordsRead.addAndGet(m.inputMetrics.recordsRead)
        bytesRead.addAndGet(m.inputMetrics.bytesRead)
        taskTimeMs.addAndGet(m.executorRunTime)
      }
    }
  }
  spark.sparkContext.addSparkListener(listener)

  /** Instrument a wire DataFrame: counts rows and poison pills as they
    * flow (accumulator updates ride the existing narrow map — no extra
    * pass, no action). */
  def countParsed(parsed: DataFrame): DataFrame = {
    val inC = rowsIn; val poisonC = poisonPills; val outC = rowsOut
    val countIt = udf { ok: Boolean =>
      inC.add(1); if (ok) outC.add(1) else poisonC.add(1); ok }
    parsed.withColumn("parse_ok", countIt(col("parse_ok")))
  }

  def snapshot: Map[String, Long] = Map(
    "rows_in" -> rowsIn.value, "rows_out" -> rowsOut.value,
    "poison_pills" -> poisonPills.value,
    "records_read" -> recordsRead.get, "bytes_read" -> bytesRead.get,
    "task_time_ms" -> taskTimeMs.get)

  def unregister(): Unit = spark.sparkContext.removeSparkListener(listener)
}
