package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins
import graft.sources.Tables

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join: identical result to the plain join, salt spreads hot keys") {
    // skewed fact: 80% of rows share one nation key
    val fact = Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        when(col("c_custkey") % 5 =!= 0, lit(7L)).otherwise(col("c_nationkey")).as("n_key"))
    val dim = Tables.nation(spark, sfDir).select(col("n_nationkey").as("n_key"), col("n_name"))
    val plain = fact.join(dim, "n_key").select("c_custkey", "n_name")
    val salted = Joins.saltedJoin(fact, dim, "n_key", factor = 8)
      .select("c_custkey", "n_name")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the salt column must be part of the physical join key
    val saltedPlan = Joins.saltedJoin(fact, dim, "n_key", 8).queryExecution.executedPlan.toString
    assert(saltedPlan.contains("__salt"))
  }

  test("bucketed tables: co-located join plans without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(spark, sfDir)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sfDir)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_quantity"))
      val plan = joined.queryExecution.executedPlan.toString
      // the shuffle was paid at write time: no exchange on either side
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it still computes the right thing
      val expected = Tables.orders(spark, sfDir).join(
        Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
