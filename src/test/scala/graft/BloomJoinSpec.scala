package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Runtime bloom-filter join — the non-partition-key complement of
  * dynamic partition pruning (DppSpec): a selective dim filter injects
  * a bloom probe into the fact scan so most fact rows drop BEFORE the
  * join shuffle. The size thresholds are deployment dials (defaults
  * only bite at multi-GB scan sizes); this pins that the knob works in
  * this Spark build at test scale with the thresholds lowered, and
  * that results are unchanged by the injected filter. */
class BloomJoinSpec extends SparkSpec {

  test("lowered thresholds inject a bloom filter; results unchanged") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // bloom filters target shuffle joins — a broadcast join already
      // probes cheaply, so force the shuffle plan at test scale
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity"))
      val ord = Tables.orders(spark, sfDir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter") ||
        plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      // the filter is advisory — results must equal the plain join
      val want = li.join(
          Tables.orders(spark, sfDir)
            .where(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey").as("k")),
          col("l_orderkey") === col("k"))
        .agg(count(lit(1)), sum(col("l_quantity"))).head
      val got = joined.head
      assert(got.getLong(0) == want.getLong(0))
      assert(math.abs(got.getDouble(1) - want.getDouble(1)) < 1e-6)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
