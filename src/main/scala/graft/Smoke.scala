package graft
import org.apache.spark.sql.SparkSession
/** Driver-smoke mimic: SparkEntry.entry at sf0.001 must return rows>0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n schema=${df.schema.fieldNames.mkString(",")}")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
