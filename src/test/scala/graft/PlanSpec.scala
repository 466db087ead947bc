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
    assert(plan("dedup_jaccard").contains("struct<doc_id:bigint,text:string>"),
      "documents scan reads more than (doc_id, text)")
  }

  test("knn_ivf assignment partial-aggregates before its exchange") {
    assert(plan("knn_ivf").contains("partial_max"),
      "IVF argmax lost its map-side combine")
  }
}
