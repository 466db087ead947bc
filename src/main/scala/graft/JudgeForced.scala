package graft
// temporary judge harness (round-5 verification) — deleted after use
object JudgeForced {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = 32
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[judge] heapMax=${Runtime.getRuntime.maxMemory()}")
    val splitDir = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      s"/graft-bench-split-$cpus-" + java.lang.Integer.toHexString(sfDir.hashCode)
    val marker = new java.io.File(splitDir, "_SPLIT_OK")
    if (!marker.exists) {
      graft.sources.Tables.all.foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").repartition(cpus)
          .write.mode("overwrite").parquet(s"$splitDir/$t.parquet")
      }
      marker.createNewFile()
    }
    // same warmup as Bench
    locally {
      import org.apache.spark.sql.functions._
      spark.range(1 << 20).select((col("id") * 2).as("x"))
        .groupBy(col("x") % 7).agg(sum(col("x"))).count()
      spark.catalog.clearCache(); System.gc()
    }
    args.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val tc = (System.nanoTime() - t0) / 1e9
      val tf0 = System.nanoTime()
      SparkEntry.queries(name)(spark, splitDir).queryExecution.toRdd.count()
      val tf = (System.nanoTime() - tf0) / 1e9
      spark.catalog.clearCache(); System.gc()
      println(f"[judge] $name count=$tc%.2f s forced=$tf%.2f s")
    }
    spark.stop()
  }
}
