package graft

import org.apache.spark.sql.functions._
import graft.storm.{StormFeed, StormPipeline}

/** Plan-shape regression guards: the scale properties PLANS.md
  * documents, as assertions — a plan regression (lost broadcast, lost
  * pushdown, accidental cartesian, un-pruned scan) fails the build
  * instead of waiting for a human to re-read explain output.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("enrichment is a narrow map: zero exchanges") {
    val p = StormPipeline.enrich(StormFeed.feed(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"enrichment shuffles:\n$p")
  }

  test("q3_join broadcasts the dim and pushes filters to the scan") {
    val p = plan("q3_join")
    assert(p.contains("BroadcastHashJoin"), "customer dim not broadcast")
    assert("PushedFilters: \\[[^]]".r.findFirstIn(p).isDefined, "no pushed filters")
  }

  test("storm_dedup shuffles on the pruned id key only") {
    assert(plan("storm_dedup").contains("hashpartitioning(id"),
      "dedup shuffle not keyed on the pruned id column")
  }

  test("similarity joins never degenerate to a cartesian") {
    // dedup_embed's IVF assignment intentionally broadcast-nested-loops
    // over the 16 centroids (like knn_cosine's query broadcast); the
    // text near-dup pipelines must have no unkeyed join at all
    for (q <- Seq("dedup_jaccard", "dedup_minhash", "dedup_simhash", "dedup_embed")) {
      assert(!plan(q).contains("CartesianProduct"), s"$q has a cartesian product")
    }
    for (q <- Seq("dedup_jaccard", "dedup_minhash", "dedup_simhash")) {
      assert(!plan(q).contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
  }

  test("knn_cosine's broadcast nested loop is the one sanctioned cross join") {
    assert(plan("knn_cosine").contains("BroadcastNestedLoopJoin"))
  }

  test("jaccard scan prunes to (doc_id, text)") {
    // since r18-opt the pair pipeline materializes its shingle-set
    // table once (the multi-consumer rule), so the parquet scan lives
    // in the checkpoint job, not the served plan: assert pruning on
    // the frame that is materialized — exactly what that job executes
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val sets = docs.select(col("doc_id"),
      graft.operators.Dedup.shingles(col("text"), 3).as("sh"))
    val p = sets.queryExecution.executedPlan.toString
    assert(p.contains("struct<doc_id:bigint,text:string>"),
      "documents scan reads more than (doc_id, text)")
    // ...and the served plan reads checkpointed sets, never parquet
    assert(!plan("dedup_jaccard").contains("Scan parquet"),
      "dedup_jaccard re-scans parquet instead of the materialized sets")
  }

  test("knn_ivf assignment partial-aggregates before its exchange") {
    assert(plan("knn_ivf").contains("partial_max"),
      "IVF argmax lost its map-side combine")
  }

  test("sampling and chunking stay narrow: no exchange before the sort") {
    // final orderBy contributes one rangepartitioning exchange; the
    // operators themselves must add none (hash filter / explode only)
    for (q <- Seq("sample_stratified", "doc_chunk")) {
      val exchanges = "Exchange".r.findAllIn(plan(q)).length
      assert(exchanges <= 1, s"$q shuffles beyond the output sort")
    }
  }

  test("asof join plans with no join operator; range join hash-joins on the bucket") {
    val asof = plan("q_asof")
    assert(!asof.contains("Join"), s"asof should be union+window, found a join:\n$asof")
    assert(asof.contains("last("), "asof lost its last(ignoreNulls) window")
    val range = plan("q_range")
    assert(range.contains("BroadcastHashJoin") || range.contains("SortMergeJoin") ||
      range.contains("ShuffledHashJoin"), "range join lost its equi-join form")
    assert(!range.contains("BroadcastNestedLoopJoin") && !range.contains("CartesianProduct"),
      s"range join degenerated:\n$range")
  }

  test("q_pivot plans a single partial-agg shuffle (no distinct-values job)") {
    val p = plan("q_pivot")
    assert(p.contains("partial_pivot") || p.contains("partial_count"),
      "pivot lost its map-side combine")
  }

  test("q_funnel is pure aggregation: no joins of the fact table") {
    val p = plan("q_funnel")
    assert(!p.contains("Join"), s"funnel grew a self-join:\n$p")
    assert(p.contains("partial_"), "funnel lost its map-side combine")
  }

  test("q_gapfill joins spine to rollup keyed, then windows per type") {
    val p = plan("q_gapfill")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"gapfill spine join degenerated:\n$p")
    assert(p.contains("last("), "gapfill lost its forward-fill window")
  }

  test("text_repetition stays narrow; text_vocab takes top-k, not a global sort") {
    val rep = plan("text_repetition")
    assert("Exchange".r.findAllIn(rep).length <= 1,
      s"repetition signals shuffle beyond the output sort:\n$rep")
    assert(plan("text_vocab").contains("TakeOrderedAndProject"),
      "vocab top-100 planned as a global sort")
  }

  test("text_tfidf: keyed joins only, plus the one-row corpus-count broadcast") {
    val p = plan("text_tfidf")
    assert(!p.contains("CartesianProduct"), s"tfidf has a cartesian:\n$p")
    assert(p.contains("partial_count"), "tfidf lost its map-side combine")
  }

  test("q_json scan prunes to (event_type, props); q_zorder stays join-free") {
    assert(plan("q_json").contains("struct<event_type:string,props:string>"),
      "json rollup reads more than (event_type, props)")
    val p = plan("q_zorder")
    assert(!p.contains("Join"), s"zorder rollup grew a join:\n$p")
    assert(p.contains("partial_"), "zorder rollup lost its map-side combine")
  }

  test("text_lmscore joins stay keyed; the one-row vocab count broadcasts") {
    val p = plan("text_lmscore")
    assert(!p.contains("CartesianProduct"), s"lmscore has a cartesian:\n$p")
    assert(p.contains("partial_count"), "lmscore lost its map-side combine")
  }

  test("mm_resize prunes to (doc_id, text); percap joins only the broadcast thresholds") {
    assert(plan("mm_resize").contains("struct<doc_id:bigint,text:string>"),
      "resize pipeline reads more than (doc_id, text)")
    // skew-safe cap: ONE broadcast hash join of the (group, threshold)
    // rows (a handful) onto the fact — never a shuffled or nested-loop
    // join — feeding the ranked window
    val p = plan("sample_percap")
    assert(p.contains("BroadcastHashJoin"),
      s"per-group cap lost its broadcast threshold pre-thin:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"per-group cap thresholds must broadcast, not shuffle:\n$p")
    assert(p.contains("Window"), "per-group cap lost its ranked window")
  }

  test("q_percentile is one partial-aggregated shuffle") {
    val p = plan("q_percentile")
    assert(p.contains("partial_percentile") || p.contains("partial_count"),
      "percentile lost its map-side combine")
    assert(!p.contains("Join"), s"percentile grew a join:\n$p")
  }

  test("trailing/anomaly/geo/integrity keep their aggregate-window shapes") {
    for (q <- Seq("q_trailing", "q_anomaly", "storm_geo", "q_integrity")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to a nested loop:\n$p")
    }
    assert(plan("q_trailing").contains("Window"), "trailing lost its RANGE window")
    assert(plan("q_anomaly").contains("Window"), "anomaly lost its trailing window")
    assert(plan("storm_geo").contains("partial_"), "geo rollup lost map-side combine")
  }

  test("scd2/temporal/triangles: keyed joins only") {
    // the classified full-outer join is materialized ONCE (localCheckpoint
    // — it feeds three union branches; see Scd.scd2Merge), so the final
    // plan unions projections of the RDD scan instead of re-running the
    // join per class
    val s2 = plan("q_scd2")
    assert(s2.contains("ExistingRDD"),
      s"scd2 classified join not materialized:\n$s2")
    assert(!s2.contains("CartesianProduct") && !s2.contains("BroadcastNestedLoopJoin"),
      s"scd2 degenerated:\n$s2")
    val t = plan("q_temporal")
    assert(!t.contains("Join"), s"temporal should ride the asof union+window:\n$t")
    val g = plan("graph_triangles")
    assert(!g.contains("CartesianProduct") && !g.contains("BroadcastNestedLoopJoin"),
      s"triangle join degenerated:\n$g")
    // the edge list must be MATERIALIZED once (localCheckpoint → RDD
    // scans): a plan that still contains the documents parquet scan
    // re-executes the corpus-scale similarity join per self-join alias
    assert(g.contains("ExistingRDD"),
      s"triangle edges not checkpointed:\n$g")
    assert(!g.toLowerCase.contains("parquet"),
      s"triangle plan re-reads the corpus (similarity join re-executed):\n$g")
  }

  test("no query's plan fans a subtree out into more than 6 parquet scans") {
    // the multi-consumer recompute guard: exchange reuse does NOT fire
    // across union/join consumer branches, so an un-materialized
    // subtree referenced k times scans (and computes) k times — found
    // live in graph_triangles (3x similarity join), text_tfidf (8
    // scans), dedup_semantic (12), text_lmscore, and scd2Merge, all
    // fixed by materializing the shared subtree once. The widest
    // LEGITIMATE plans are q5_multijoin (5 tables), dedup_jaccard and
    // q_integrity (6 scans by documented design), so 6 is the budget:
    // a regression of this class lands at 8+.
    val scanRe = "(FileScan|Scan) parquet".r
    val over = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val p = plan(name)
      val n = scanRe.findAllIn(p).length
      if (n > 6) Some(s"$name=$n") else None
    }
    assert(over.isEmpty, s"queries over the scan budget (recompute?): $over")
  }

  test("curriculum manifest never sorts globally: one (phase, shard) hash exchange") {
    // the OPERATOR (not the presentation-sorted query wiring) must
    // plan exactly the window's hash shuffle — a trailing global
    // orderBy would add a rangepartitioning exchange that range-
    // shuffles the whole manifest at corpus scale
    val p = graft.operators.Pretrain
      .curriculum(graft.sources.Tables.documents(spark, sfDir), nShards = 8)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges == 1, s"curriculum plans $exchanges exchanges, want 1:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"curriculum range-shuffles (global sort crept back):\n$p")
    assert(p.contains("hashpartitioning(phase"),
      s"curriculum's one exchange is not the (phase, shard) window hash:\n$p")
  }

  test("k-means assignment keeps the map-side argmax; semantic dedup anti-joins") {
    assert(plan("embed_kmeans").contains("partial_max"),
      "k-means argmax lost its map-side combine")
    val p = plan("dedup_semantic")
    assert(!p.contains("CartesianProduct"), s"semantic dedup has a cartesian:\n$p")
    assert(p.contains("LeftAnti"), "semantic dedup lost its anti join")
  }
}
