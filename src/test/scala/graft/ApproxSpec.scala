package graft

import org.apache.spark.sql.functions._
import graft.analytics.Analytics
import graft.sources.Tables

/** Sketch values can't hash-match another engine (sketch internals
  * differ); this spec pins the raw sketches against exact answers,
  * and the shipped q_approx query (qApproxChecked) additionally
  * carries its error bounds as oracle-checkable booleans. */
class ApproxSpec extends SparkSpec {

  test("checked form: every error-bound boolean is true (oracle shape)") {
    val rows = Analytics.qApproxChecked(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows; c <- Seq("users_within_3rsd", "p50_within_rank_eps", "p95_within_rank_eps"))
      assert(r.getBoolean(r.fieldIndex(c)), s"$c false in $r")
  }

  test("HLL distinct users within the configured 2% rsd (5% hard cap)") {
    val ev = Tables.events(spark, sfDir)
    val approx = Analytics.qApprox(spark, sfDir)
      .select(col("event_type"), col("approx_users")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (t, n) =>
      val rel = math.abs(approx(t) - n).toDouble / n
      assert(rel <= 0.05, s"$t: approx=${approx(t)} exact=$n rel=$rel")
    }
  }

  test("approx percentiles bracket the exact rank within 1% of rows") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.qApprox(spark, sfDir).collect()
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      val vals = ev.where(col("event_type") === t)
        .select("value").collect().map(_.getDouble(0)).sorted
      val n = vals.length
      for ((q, cName) <- Seq(0.5 -> "p50_value", 0.95 -> "p95_value")) {
        val v = r.getAs[Double](cName)
        // rank of the returned value must be within 1% of the target
        val rank = vals.count(_ <= v).toDouble / n
        assert(math.abs(rank - q) <= 0.01 || vals.contains(v),
          s"$t $cName=$v rank=$rank target=$q")
      }
    }
  }
}
