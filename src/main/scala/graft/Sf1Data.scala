package graft

import org.apache.spark.sql.functions._

/** Build the sf1 evidence dataset: a FULL table set at 10× the bench
  * SF (sf0.1 → sf1-equivalent), written once to a cache dir, so the
  * heavy operator families can be verified AND timed at the next
  * scale step with the same driver contract (graft.Verify +
  * tools/verify_local.py) the per-round gate uses.
  *
  * documents / embeddings / events / customer / orders grow by the
  * SAME v3 bijective synthesis ScaleCheck validated (shared replica
  * methods — cross-replica token disjointness re-asserted here); the
  * remaining TPC-H tables grow by key-shifted replication with
  * foreign keys shifted IN STEP (lineitem follows orders' orderkey
  * shift and gets its own part/supp shifts matched by part/supplier),
  * so every join relation stays within-replica. nation/region copy
  * through unchanged — dimension tables do not grow with data scale,
  * and replicating them would break the fixed 25-nation semantics.
  *
  * Usage: sbt "runMain graft.Sf1Data [sfDir] [outDir]"
  * (defaults: /root/testdata/sf0.1 → /tmp/graft-sf1). Cached behind a
  * _SF1_OK marker like ScaleCheck's fixture dirs.
  */
object Sf1Data {
  val Mult = 10

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft-sf1"
    val spark = GraftSession.builder("local[32]", 32)
      .appName("graft-sf1data").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val marker = new java.io.File(outDir, "_SF1_OK")
    if (marker.exists) { println(s"[sf1data] cached at $outDir"); return }

    def write(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.repartition(32).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      println(s"[sf1data] $name written")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    write("documents", (0 until Mult)
      .map(ScaleCheck.synthDocsReplica(docs, _)).reduce(_ unionAll _))
    // the synthesis contract: zero cross-replica token collisions
    val baseTok = docs.select(explode(split(col("text"), "\\s+")).as("t"))
      .where(col("t") =!= "").distinct().count()
    val bigTok = spark.read.parquet(s"$outDir/documents.parquet")
      .select(explode(split(col("text"), "\\s+")).as("t"))
      .where(col("t") =!= "").distinct().count()
    require(bigTok == Mult.toLong * baseTok,
      s"cross-replica token collision: $baseTok -> $bigTok " +
        s"(expected ${Mult.toLong * baseTok})")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    write("embeddings", (0 until Mult)
      .map(ScaleCheck.synthEmbReplica(emb, _)).reduce(_ unionAll _))
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    write("events", (0 until Mult)
      .map(ScaleCheck.synthEventsReplica(ev, _)).reduce(_ unionAll _))
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    write("customer", (0 until Mult)
      .map(ScaleCheck.synthCustomerReplica(cust, _)).reduce(_ unionAll _))
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    write("orders", (0 until Mult)
      .map(ScaleCheck.synthOrdersReplica(ord, _)).reduce(_ unionAll _))
    // lineitem follows orders (l_orderkey) and carries part/supplier
    // shifts matched below, so q3/q5-style join chains stay
    // within-replica; per-replica value distributions are untouched
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    write("lineitem", (0 until Mult).map(r => li
        .withColumn("l_orderkey", col("l_orderkey") + lit(r * 100000000L))
        .withColumn("l_partkey", col("l_partkey") + lit(r * 10000000L))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * 1000000L)))
      .reduce(_ unionAll _))
    val part = spark.read.parquet(s"$sfDir/part.parquet")
    write("part", (0 until Mult).map(r => part
        .withColumn("p_partkey", col("p_partkey") + lit(r * 10000000L)))
      .reduce(_ unionAll _))
    val supp = spark.read.parquet(s"$sfDir/supplier.parquet")
    write("supplier", (0 until Mult).map(r => supp
        .withColumn("s_suppkey", col("s_suppkey") + lit(r * 1000000L)))
      .reduce(_ unionAll _))
    // fixed-cardinality dims copy through unchanged
    for (t <- Seq("nation", "region"))
      write(t, spark.read.parquet(s"$sfDir/$t.parquet"))
    marker.createNewFile()
    println(s"[sf1data] complete at $outDir")
    spark.stop()
  }
}
