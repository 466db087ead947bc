package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The materialization policy point (Materialize.once): local mode is
  * the default; reliable mode must produce row-identical results while
  * actually writing replicated checkpoint files — the executor-loss-
  * safe path a 1000-executor deployment switches on. */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  private def withReliable[A](f: => A): A = {
    val dir = Files.createTempDirectory("graft-reliable-ckpt").toString
    spark.conf.set(Materialize.ModeKey, "reliable")
    spark.conf.set(Materialize.DirKey, dir)
    spark.sparkContext.setCheckpointDir(dir)
    try f
    finally {
      spark.conf.set(Materialize.ModeKey, "local")
      spark.conf.unset(Materialize.DirKey)
    }
  }

  test("reliable mode checkpoints to the configured dir and preserves rows") {
    val df = (1 to 100).map(i => (i.toLong, (i % 7).toLong)).toDF("a", "b")
    withReliable {
      val m = Materialize.once(df)
      assert(m.collect().toSet == df.collect().toSet)
      // the subtree is gone from the plan: no in-memory-lineage source
      assert(m.queryExecution.analyzed.collect {
        case _: org.apache.spark.sql.execution.LogicalRDD => 1
      }.nonEmpty)
      val ckptFiles = new java.io.File(
        spark.sparkContext.getCheckpointDir.get.stripPrefix("file:")).listFiles()
      assert(ckptFiles != null && ckptFiles.nonEmpty,
        "reliable mode must write checkpoint files")
    }
  }

  test("Dedup.clusters is mode-invariant (reliable == local), including free()") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // one chain
      (10L, 11L), (11L, 12L),       // second component
      (20L, 21L)                    // third
    ).toDF("doc_a", "doc_b")
    val local = operators.Dedup.clusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val reliable = withReliable {
      operators.Dedup.clusters(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(reliable == local)
    assert(local == Set(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("scd2Merge is mode-invariant (reliable == local)") {
    val current = Seq(
      ("k1", "v1", "2024-01-01", null.asInstanceOf[String], true),
      ("k2", "v2", "2024-01-01", null.asInstanceOf[String], true),
      ("k0", "v0", "2023-01-01", "2024-01-01", false)
    ).toDF("k", "v", "valid_from", "valid_to", "is_current")
    val snapshot = Seq(("k1", "v1b"), ("k3", "v3")).toDF("k", "v")
    def run() = operators.Scd.scd2Merge(current, snapshot, Seq("k"), Seq("v"), "2024-06-01")
      .collect().map(_.toSeq).toSet
    val local = run()
    val reliable = withReliable(run())
    assert(reliable == local)
  }

  test("tracking collects every once()-materialized frame; nested scopes propagate, even on failure") {
    val df = (1 to 20).map(i => (i.toLong, (i % 3).toLong)).toDF("a", "b")
    val ((m, innerFrames), outerFrames) = Materialize.tracking {
      Materialize.tracking(Materialize.once(df))
    }
    assert(m.count() == 20)
    assert(innerFrames.size == 1 && (innerFrames.head eq m),
      "inner scope must hand back the frame once() materialized")
    assert(outerFrames.size == 1 && (outerFrames.head eq m),
      "inner scope must ALSO report its frame to the enclosing scope")
    Materialize.free(m)
    // failure path: a frame materialized before the inner body threw
    // must still reach the enclosing scope (or a retry loop strands
    // one frame set per attempt — the r11 ADVICE finding)
    val (_, failFrames) = Materialize.tracking {
      intercept[RuntimeException](Materialize.tracking {
        Materialize.once(df).count()
        throw new RuntimeException("boom")
      })
    }
    assert(failFrames.size == 1,
      "frames from a failed inner scope must propagate to the outer scope")
    failFrames.foreach(Materialize.free)
  }

  test("scoped frees everything the body materializes — success AND failure paths") {
    val df = (1 to 20).map(i => (i.toLong, (i % 3).toLong)).toDF("a", "b")
    // leak detection by ID DIFFERENCE, not count equality: the session
    // is shared across suites and the async ContextCleaner can retire
    // an OLDER suite's block mid-test, which would make a count
    // comparison flake downward (observed once in a full-suite run)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val n = Materialize.scoped {
      val a = Materialize.once(df)
      val b = Materialize.once(a.where(col("a") > 5))
      b.count()
    }
    assert(n == 15)
    val leaked1 = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked1.isEmpty,
      s"scoped must free every frame its body materialized: $leaked1")
    intercept[RuntimeException](Materialize.scoped {
      Materialize.once(df).count()
      throw new RuntimeException("boom")
    })
    val leaked2 = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked2.isEmpty,
      "a failed scope must still free its frames (retried micro-batches " +
        s"re-materialize; keeping the dead set leaks one per attempt): $leaked2")
  }

  test("unknown mode is rejected") {
    spark.conf.set(Materialize.ModeKey, "bogus")
    try intercept[IllegalArgumentException](
      Materialize.once(Seq((1, 2)).toDF("a", "b")))
    finally spark.conf.set(Materialize.ModeKey, "local")
  }

  test("iterative materialize: inherited stats stay clamped, no cross-round snowball") {
    // checkpointing inherits the source plan's Statistics; in an
    // iterative self-join each round's inherited sizeInBytes is a
    // polynomial of the previous round's — repeated squaring that made
    // label-propagation analysis time DOUBLE per round and finally
    // threw "BigInteger would overflow supported range" on a
    // long-diameter graph (30 rounds below reproduce the shape; the
    // clamp keeps per-round stats, and so analysis cost, flat)
    val cap = org.apache.spark.sql.GraftStatsBridge.DefaultCap
    var df = spark.range(50).toDF("id")
    (1 to 30).foreach { r =>
      val joined = df.as("a").join(df.as("b"), Seq("id"))
        .join(df.as("c"), Seq("id")).select(col("id"))
      df = Materialize.once(joined)
      val s = df.queryExecution.analyzed.stats.sizeInBytes
      assert(s <= cap, s"round $r stats $s exceed the clamp")
    }
    assert(df.count() == 50)
    // and a small frame's exact stats survive untouched (broadcast
    // decisions for genuinely small materialized frames are unchanged)
    val small = Materialize.once(spark.range(10).toDF("id"))
    val s = small.queryExecution.analyzed.stats.sizeInBytes
    assert(s > 0 && s < 1000000, s"small-frame stats $s lost")
  }

  test("stats clamp is strategy-invariant: honest-huge and clamped sizes plan identically") {
    import org.apache.spark.sql.GraftStatsBridge
    // a checkpointed big side whose INHERITED stats we control exactly
    val ckpt = spark.range(2000).toDF("id").localCheckpoint()
    val honest = GraftStatsBridge.withStats(ckpt, GraftStatsBridge.DefaultCap * 16)
    val clamped = GraftStatsBridge.clampStats(honest)
    assert(honest.queryExecution.analyzed.stats.sizeInBytes ==
      GraftStatsBridge.DefaultCap * 16)
    assert(clamped.queryExecution.analyzed.stats.sizeInBytes ==
      GraftStatsBridge.DefaultCap)
    // the boundary itself: exactly-at-cap stats are untouched
    val atCap = GraftStatsBridge.clampStats(
      GraftStatsBridge.withStats(ckpt, GraftStatsBridge.DefaultCap))
    assert(atCap.queryExecution.analyzed.stats.sizeInBytes ==
      GraftStatsBridge.DefaultCap)
    // join strategy against a tiny broadcastable side must be the SAME
    // for the honest and the clamped form: broadcast the small side,
    // never the big one (pre-AQE sparkPlan = the stats-driven decision)
    val small = spark.range(64).toDF("k")
    def joinShape(big: org.apache.spark.sql.DataFrame): Seq[String] =
      small.join(big, col("k") === col("id")).queryExecution.sparkPlan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          s"bhj:${j.buildSide}"
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => "smj"
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
          s"shj:${j.buildSide}"
      }
    val sHonest = joinShape(honest)
    val sClamped = joinShape(clamped)
    assert(sHonest == sClamped,
      s"clamp flipped the join strategy: honest=$sHonest clamped=$sClamped")
    assert(sHonest == Seq("bhj:BuildLeft"),
      s"tiny side must broadcast against a huge side, got $sHonest")
    // ...and BELOW the cap nothing changes at all: an honest small
    // size still auto-broadcasts the checkpointed side itself
    val smallStats = GraftStatsBridge.clampStats(
      GraftStatsBridge.withStats(ckpt, 1024))
    assert(smallStats.queryExecution.analyzed.stats.sizeInBytes == 1024)
    val s2 = spark.range(1 << 20).toDF("k").join(smallStats,
      col("k") === col("id")).queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        s"bhj:${j.buildSide}"
    }
    assert(s2 == Seq("bhj:BuildRight"), s"small honest side must broadcast: $s2")
  }
}
