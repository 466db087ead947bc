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

  test("asof join: equals the naive latest-match join, left-outer, inclusive ties") {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("cv"))
    val purch = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val got = Joins.asofJoin(purch,
      clicks.select(col("user_id"), col("ts"), col("ts").as("c_ts"), col("cv")),
      Seq("user_id"), "ts", "ts", Seq("c_ts", "cv"))
    // naive: range theta-join, then keep the latest click per purchase
    val c = clicks.select(col("user_id").as("u"), col("ts").as("c_ts"), col("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id")).orderBy(col("c_ts").desc)
    val naive = purch
      .join(c, purch("user_id") === c("u") && c("c_ts") <= purch("ts"), "left")
      .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .select(col("user_id"), col("event_id"), col("ts"), col("c_ts"), col("cv"))
    assert(got.count() == purch.count(), "asof must be left-outer: one row per left row")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    // inclusive at equal timestamps, like ASOF's t >= match
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("k", "t")
    val r = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "hit"))
      .toDF("k", "rt", "x")
    val tie = Joins.asofJoin(l, r, Seq("k"), "t", "rt", Seq("x")).collect()
    assert(tie.length == 1 && tie(0).getAs[String]("x") == "hit")
  }

  test("range join: equals the theta join, and plans with no nested loop") {
    val ev = Tables.events(spark, sfDir)
    val windows = ev.where(col("event_type") === "error")
      .select(col("event_id").as("err_id"),
        unix_micros(col("ts")).as("lo"),
        (unix_micros(col("ts")) + lit(600000000L)).as("hi"))
    val purch = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), unix_micros(col("ts")).as("pt"))
    val got = Joins.rangeJoin(purch, windows, Nil, "pt", "lo", "hi", 600000000L)
      .select(col("err_id"), col("p_id"))
    val naive = purch.join(windows,
        col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select(col("err_id"), col("p_id"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    assert(got.count() > 0, "fixture must exercise at least one containment match")
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a quadratic plan:\n$plan")
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

  test("spatialNeighborPairs == brute-force L-inf theta join, negative coords included") {
    import spark.implicits._
    // deterministic scatter straddling the equator/prime meridian so
    // negative micro-degrees exercise the floor-division cells (a
    // truncating div would mis-bucket negatives and drop pairs)
    val pts = (0L until 400L).map { i =>
      (i, -0.05 + (i % 37).toDouble * 0.003, -0.04 + (i % 53).toDouble * 0.002)
    }.toDF("pid", "plat", "plon")
    val r = 2500L // 0.0025 degrees
    val fast = graft.operators.Joins
      .spatialNeighborPairs(pts, col("pid"), col("plat"), col("plon"), r)
      .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val q = pts.select(col("pid"),
      floor(col("plat") * 1000000.0).cast("long").as("u"),
      floor(col("plon") * 1000000.0).cast("long").as("v"))
    val brute = q.as("a").crossJoin(q.as("b"))
      .where(col("a.pid") < col("b.pid") &&
        abs(col("a.u") - col("b.u")) <= r && abs(col("a.v") - col("b.v")) <= r)
      .select(col("a.pid"), col("b.pid")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(fast == brute, s"missing=${brute -- fast} extra=${fast -- brute}")
    assert(brute.nonEmpty)
    // the plan is a hash equi-join on the cell, not a nested loop
    val plan = graft.operators.Joins
      .spatialNeighborPairs(pts, col("pid"), col("plat"), col("plon"), r)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      plan.take(500))
  }

  test("fuzzyPairsDist1 == brute-force levenshtein<=1 (FastSS is lossless)") {
    import spark.implicits._
    // equality, substitution, deletion, insertion, doubled letters,
    // plus decoys at distance 2+
    val words = Seq("storm", "storn", "stor", "storms", "sttorm", "stoorm",
      "hail", "hails", "bail", "rail", "trail", "wind", "winds", "mind",
      "aa", "ab", "a", "b", "xyzzy").zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
    val fast = graft.operators.Joins.fuzzyPairsDist1(words, col("id"), col("w"))
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = words.as("a").crossJoin(words.as("b"))
      .where(col("a.id") < col("b.id") &&
        levenshtein(col("a.w"), col("b.w")) <= 1)
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.w"), col("b.w")).as("d")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(fast == brute, s"missing=${brute -- fast} extra=${fast -- brute}")
    assert(brute.nonEmpty) // the case actually exercises matches
  }

  test("asofNearestJoin == brute-force argmin: both directions, ties prior, no-match nulls") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // left rows across 6 keys; right rows only on keys 0-4 (key 5 has
    // no match); timestamps collide deliberately to exercise ties
    val left = (1 to 300).map(i =>
      (s"k${i % 6}", i.toLong, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusSeconds(rnd.nextInt(500)))))
    val right = (1 to 200).map(j =>
      (s"k${j % 5}", java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusSeconds(rnd.nextInt(500))), j * 10L))
      .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq // unique (key, ts)
    val got = graft.operators.Joins.asofNearestJoin(
        left.toDF("k", "lid", "lt"), right.toDF("k", "rt", "pay"),
        Seq("k"), "lt", "rt", Seq("pay"))
      .select($"lid", $"pay", $"nearest_time").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got.size == left.size)
    left.foreach { case (k, lid, lt) =>
      val cands = right.filter(_._1 == k)
      if (cands.isEmpty) assert(got(lid) == (None, None), s"lid=$lid")
      else {
        val best = cands.minBy { case (_, rt, _) =>
          (math.abs(rt.getTime - lt.getTime),
            if (rt.getTime <= lt.getTime) 0 else 1, rt.getTime) }
        assert(got(lid)._1.contains(best._3), s"lid=$lid payload")
        assert(got(lid)._2.contains(best._2), s"lid=$lid time")
      }
    }
  }

  test("asofNearestJoin plans no UnboundedFollowing frame (O(p) per hot key, 1 shuffle)") {
    import spark.implicits._
    val left = Seq(("k", 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05"))).toDF("k", "lid", "lt")
    val right = Seq(("k", java.sql.Timestamp.valueOf("2024-01-01 00:00:07"), 1L)).toDF("k", "rt", "pay")
    val df = graft.operators.Joins.asofNearestJoin(left, right, Seq("k"), "lt", "rt", Seq("pay"))
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("unboundedfollowing"),
      "next-row frame must be the descending running frame, not unboundedfollowing:\n" + physical)
    // AQE wraps the plan, so count exchanges in the printed initial plan
    val shuffles = "Exchange hashpartitioning".r.findAllIn(physical).size
    assert(shuffles == 1, s"expected a single shuffle, got $shuffles:\n" + physical)
  }
}
