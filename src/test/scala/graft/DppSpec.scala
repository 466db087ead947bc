package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dynamic partition pruning: when a fact table is partitioned on the
  * join key and the dim side carries a selective filter, Spark injects
  * a runtime partition filter from the dim's keys — at 100 TB the fact
  * scan reads only the matching partitions instead of the whole lake.
  * This pins the capability so a config or plan regression (DPP
  * silently off) fails the build. */
class DppSpec extends SparkSpec {

  test("partitioned fact join gets a dynamicpruning partition filter") {
    val base = Files.createTempDirectory("graft-dpp").toString
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .write.partitionBy("l_returnflag").mode("overwrite").parquet(s"$base/fact")
    // dim filtered on a NON-join attribute: the fact-side partition
    // keys are unknown until runtime, which is exactly the case DPP
    // exists for (a filter on the join column itself would constant-
    // propagate into static partition pruning instead)
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("flag")).distinct()
      .withColumn("label",
        when(col("flag") === "R", "returned").otherwise("kept"))
      .write.mode("overwrite").parquet(s"$base/dim")

    val fact = spark.read.parquet(s"$base/fact")
    val dim = spark.read.parquet(s"$base/dim").where(col("label") === "returned")
    val joined = fact.join(dim, col("l_returnflag") === col("flag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n$plan")
    // and the result matches the unpartitioned computation
    val want = Tables.lineitem(spark, sfDir).where(col("l_returnflag") === "R")
      .agg(count(lit(1)), sum(col("l_quantity"))).head
    val got = joined.head
    assert(got.getLong(0) == want.getLong(0))
    assert(math.abs(got.getDouble(1) - want.getDouble(1)) < 1e-6)
  }
}
