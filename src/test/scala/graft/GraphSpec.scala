package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Deterministic integer PageRank (operators.Graph.pagerankInt): the
  * DuckDB oracle pins the exact arithmetic; these pin the graph
  * semantics. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("symmetric positions rank equally; hubs outrank satellites") {
    // star: hub 1 joined to 2,3,4 — satellites are interchangeable
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val r = Graph.pagerankInt(star, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.size == 4)
    assert(r(2L) == r(3L) && r(3L) == r(4L), s"satellites differ: $r")
    assert(r(1L) > r(2L), s"hub must outrank satellites: $r")
  }

  test("two disjoint symmetric pairs rank identically; mass ~ massScale") {
    val pairs = Seq((10L, 11L), (20L, 21L)).toDF("doc_a", "doc_b")
    val r = Graph.pagerankInt(pairs, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.values.toSet.size == 1, s"symmetric nodes diverged: $r")
    // integer truncation only loses sub-ppm mass
    val total = r.values.sum
    assert(total > 999999000000L * 99 / 100 && total <= 1000000000000L, total.toString)
  }

  test("deterministic across partition layouts") {
    val edges = (1L to 200L).map(i => (i, i % 37 + 1000L))
    val a = Graph.pagerankInt(edges.toDF("doc_a", "doc_b").repartition(1), iters = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val b = Graph.pagerankInt(edges.reverse.toDF("doc_a", "doc_b").repartition(7), iters = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(a == b)
  }
}
