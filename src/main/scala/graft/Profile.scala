package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev tool: stage-level timing for the heavy dedup operators. */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    time("docs count")(docs.count())
    time("normalize only")(docs.select(graft.functions.Text.normalize(col("text"))).count())
    time("fingerprint only")(docs.select(graft.functions.Text.fingerprint(col("text"))).count())
    time("exactGroups")(graft.operators.Dedup.exactGroups(docs).count())
    time("exactGroups doubled") {
      val d2 = docs.unionAll(docs.withColumn("doc_id", col("doc_id") + 1000000))
      graft.operators.Dedup.exactGroups(d2).count()
    }
    val sh = time("shingles k=3")(
      docs.select(col("doc_id"), graft.operators.Dedup.shingles(col("text"), 3).as("sh")))
    time("shingles count")(sh.selectExpr("sum(size(sh))").show())
    time("minhash signatures")(
      sh.select(graft.operators.Dedup.minhashSignature(col("sh"), 32)).count())
    time("simhash64 values (sha)")(
      docs.select(graft.operators.Dedup.simhash64Sha(col("text"))).count())
    time("simhash pairs full")(graft.operators.Dedup.simhashPairs(docs, 3).count())
    time("jaccard pairs full")(graft.operators.Dedup.jaccardPairs(docs, 3, 0.5).count())
    time("cluster extraction")(
      graft.operators.Dedup.clusters(
        graft.operators.Dedup.jaccardPairs(docs, 3, 0.5)).count())
    spark.stop()
  }
}
