package graft

import org.apache.spark.sql.functions._
import graft.analytics.Analytics
import graft.sources.Tables

/** Specs for q_retention (#107), q_transitions (#108), q_skyline
  * (#109): each replayed in plain Scala, plus an adversarial
  * losslessness case for the skyline's grid pre-prune. */
class CohortSkylineSpec extends SparkSpec {
  import spark.implicits._

  test("q_retention: offset-0 row equals cohort size, retention in (0,1]") {
    val rows = Analytics.qRetention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cohort_wk")).foreach { case (_, rs) =>
      val zero = rs.find(_.getAs[Long]("week_offset") == 0).get
      // every cohort member is active in their first week by definition
      assert(zero.getAs[Long]("n_users") == zero.getAs[Long]("cohort_size"))
      assert(zero.getAs[Double]("retention") == 1.0)
    }
    rows.foreach { r =>
      val ret = r.getAs[Double]("retention")
      assert(ret > 0 && ret <= 1.0)
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("cohort_size"))
    }
  }

  test("q_transitions: rows sum to n_events - n_users, per-from p sums to 1") {
    val ev = Tables.events(spark, sfDir)
    val nEvents = ev.count()
    val nUsers = ev.select($"user_id").distinct().count()
    val rows = Analytics.qTransitions(spark, sfDir).collect()
    // each user contributes (events - 1) transitions
    assert(rows.map(_.getAs[Long]("n")).sum == nEvents - nUsers)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (_, rs) =>
      val psum = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"probabilities sum to $psum")
    }
  }

  test("q_decay: exact fixed-point replay, recency monotonicity") {
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"value", $"ts").collect()
    val ref = java.time.LocalDate.parse("2024-02-01")
    val want = ev.groupBy(_.getLong(0)).map { case (u, rows) =>
      u -> rows.map { r =>
        val age = math.max(0, java.time.temporal.ChronoUnit.DAYS.between(
          r.getTimestamp(2).toLocalDateTime.toLocalDate, ref)).toInt
        math.round(r.getDouble(1) * 100) * (1000000000000L / (1L << age))
      }.sum
    }
    val got = Analytics.qDecay(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("decayed_i")).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (u, w) => assert(got(u) == w, s"user $u") }
  }

  test("q_skyline: equals the brute-force dominance frontier") {
    val p = Tables.part(spark, sfDir)
      .select($"p_partkey",
        round($"p_retailprice" * 100).cast("long").as("price_i"),
        $"p_size".cast("long").as("sz"))
      .as[(Long, Long, Long)].collect()
    val want = p.filter { case (_, pa, sa) =>
      !p.exists { case (_, pb, sb) =>
        pb <= pa && sb >= sa && (pb < pa || sb > sa) }
    }.map(t => (t._1, t._2, t._3)).toSet
    val got = Analytics.qSkyline(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("skyline grid prune is lossless on adversarial shapes") {
    // shapes that stress the prune: all-equal prices (one bucket),
    // strictly ascending staircase (nothing prunable), strictly
    // descending anti-staircase (everything but one dominated), and
    // duplicate (price, size) pairs (mutually non-dominating).
    val fixtures = Seq(
      Seq((1L, 100L, 5L), (2L, 100L, 7L), (3L, 100L, 7L), (4L, 100L, 3L)),
      (1L to 50L).map(i => (i, 100L + i, i)),
      (1L to 50L).map(i => (i, 100L + i, 51L - i)),
      Seq((1L, 10L, 1L), (2L, 10L, 1L), (3L, 20L, 2L), (4L, 30L, 1L)))
    fixtures.zipWithIndex.foreach { case (rows, fi) =>
      val df = rows.toDF("p_partkey", "price_i", "sz")
      val dir = java.nio.file.Files.createTempDirectory(s"skyfix$fi").toString
      df.select($"p_partkey",
          ($"price_i".cast("double") / 100.0).as("p_retailprice"),
          $"sz".cast("int").as("p_size"),
          lit("x").as("p_name"), lit("x").as("p_brand"), lit("x").as("p_type"))
        .write.mode("overwrite").parquet(s"$dir/part.parquet")
      val got = Analytics.qSkyline(spark, dir).as[(Long, Long, Long)].collect().toSet
      val want = rows.filter { case (_, pa, sa) =>
        !rows.exists { case (_, pb, sb) =>
          pb <= pa && sb >= sa && (pb < pa || sb > sa) }
      }.toSet
      assert(got == want, s"fixture $fi: got $got want $want")
    }
  }
}
