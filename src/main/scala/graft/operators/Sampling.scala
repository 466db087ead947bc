package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * Training mixtures need *reproducible* samples: the same corpus and
  * config must pick the same rows on every run, on any cluster layout.
  * `rand()`-based sampling is seed-and-partitioning dependent; this is
  * content-hash-based instead — a row's fate depends only on its id and
  * the salt. That also makes samples composable: two samples with
  * different salts are independent, and a 10% sample is a strict subset
  * of the 20% sample at the same salt (nested, so mixture weights can
  * be re-tuned without resampling everything).
  *
  * Scale shape: a narrow map (hash + compare) with full predicate
  * pushdown of everything else — no shuffle, no state. At 100 TB the
  * scan is the cost; sampling itself is free.
  */
object Sampling {

  /** Granularity of the sampling lattice: rates resolve to 1/10⁶. */
  val Buckets: Long = 1000000L

  /** Uniform [0, 10⁶) bucket from a row id: first 8 hex digits of
    * md5(salt:id). md5 (not xxhash64) so an external system — or the
    * DuckDB oracle — can reproduce membership with stock functions. */
  def hashBucket(id: Column, salt: String): Column =
    conv(substring(md5(concat_ws(":", lit(salt), id.cast("string"))), 1, 8),
      16, 10).cast("long") % Buckets

  /** Per-stratum Bernoulli sample: keep a row iff its bucket clears the
    * stratum's rate. `rates` maps stratum value → rate in [0,1];
    * strata not listed fall back to `defaultRate`. */
  def stratifiedSample(df: DataFrame, idCol: Column, stratumCol: Column,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = "smp"): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1),
      "rates must be in [0,1]")
    val threshold = rates.foldLeft(lit((defaultRate * Buckets).toLong)) {
      case (acc, (stratum, rate)) =>
        when(stratumCol === stratum, lit((rate * Buckets).toLong)).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket(idCol, salt))
      .where(col("bucket") < threshold)
  }
}
