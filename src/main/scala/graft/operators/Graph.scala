package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over near-dup pair lists (the similarity graph the
  * dedup family produces). Companion of [[Dedup.clusters]] (components)
  * and the triangle query (motifs): PageRank ranks documents by
  * similarity-graph centrality — the "canonical copy" signal that
  * min-id tie-breaking lacks (hub documents score high; satellites
  * low).
  */
object Graph {

  /** Deterministic INTEGER PageRank over an undirected pair list.
    *
    * All arithmetic is 64-bit integer: per-node mass starts at
    * `massScale div n`, each round every node keeps
    * `(15 · base) div 100` teleport mass plus `(85 · Σ incoming) div
    * 100`, where each neighbor contributes `rank div degree`. Integer
    * division makes every step order-free and engine-exact — a DuckDB
    * oracle replays the whole training loop bit-for-bit (same trick as
    * the k-means centroid means), which a floating-point PageRank
    * cannot offer (per-node sums would depend on reduction order).
    * The truncation loses < degree units of mass per node per round —
    * irrelevant at massScale 10¹² — and is applied identically in both
    * engines.
    *
    * Scale shape: one edge-list materialization (shared by all
    * rounds + the degree table via [[graft.Materialize.once]]), then
    * per round one keyed join edges⋈ranks and one partial-agg shuffle
    * of contribution sums — GraphX's Pregel PageRank does exactly this
    * dataflow per superstep.
    *
    * Deep iteration: every `checkpointEvery` rounds the rank table is
    * re-materialized and the previous checkpoint's blocks freed (the
    * [[Dedup.clusters]] cadence), so plan depth and block residue stay
    * bounded at any `iters`; the final result is materialized
    * self-contained and every intermediate freed, so nothing of the
    * loop outlives the call. Hub skew: real similarity graphs have
    * high-degree hubs, which concentrate the per-round join's `src`
    * partitions — ordinary equi-join skew (AQE splits oversized
    * partitions; pre-salt with [[Joins.saltedJoin]] if a single hub
    * exceeds what one split round-robins away). The contribution SUM
    * on `dst` partial-aggregates map-side, so a hot destination never
    * concentrates rows. */
  def pagerankInt(pairs: DataFrame, iters: Int = 3,
      massScale: Long = 1000000000000L, checkpointEvery: Int = 4): DataFrame = {
    require(iters >= 1 && massScale > 0, s"bad pagerank params: $iters/$massScale")
    require(checkpointEvery >= 1, s"bad checkpointEvery: $checkpointEvery")
    val p0 = graft.Materialize.once(pairs.select(col("doc_a"), col("doc_b")))
    val edges = p0.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(p0.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // undirected degree; every endpoint appears, so no dangling nodes.
    // Materialized once: it re-enters the plan every round.
    val deg = graft.Materialize.once(
      edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")))
    val n = deg.count()
    val base = massScale / math.max(n, 1L)
    val teleport = 15L * base / 100L
    var ranks = deg.select(col("id"), col("deg"), lit(base).as("r"))
    var lastCkpt: Option[DataFrame] = None
    for (i <- 1 to iters) {
      val inc = edges
        .join(ranks.selectExpr("id AS src", "r div deg AS c"), "src")
        .groupBy(col("dst").as("id")).agg(sum(col("c")).as("s"))
      ranks = deg.join(inc, Seq("id"), "left")
        .selectExpr("id", "deg",
          s"CAST($teleport AS BIGINT) + (85 * coalesce(s, CAST(0 AS BIGINT))) div 100 AS r")
      if (i % checkpointEvery == 0 && i < iters) {
        val m = graft.Materialize.once(ranks)
        lastCkpt.foreach(graft.Materialize.free)
        lastCkpt = Some(m)
        ranks = m
      }
    }
    val out = graft.Materialize.once(
      ranks.select(col("id").as("doc_id"), col("r").as("rank_i")))
    lastCkpt.foreach(graft.Materialize.free)
    graft.Materialize.free(deg)
    graft.Materialize.free(p0)
    out
  }
}
