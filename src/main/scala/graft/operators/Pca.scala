package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic top-principal-component extraction over the embedding
  * column — matrix-free distributed power iteration, the
  * dimensionality-reduction / whitening primitive an embedding
  * pipeline runs before visualization, drift monitoring, or cheap
  * pre-filters (project-then-bucket).
  *
  * Never materializes the d×d covariance: each iteration computes
  * C·v = (1/n)·Σ x·(x·v) − μ·(μ·v) from one narrow per-row dot product
  * and one (dim)-keyed partial aggregation — 64·n rows into map-side
  * combine, 64 rows out — exactly the shape that survives 10⁹ vectors
  * (the d²·n explode a naive covariance build pays never happens).
  *
  * Engine-replayable by the same discipline as
  * [[Knn.kmeansAssignments]]: per-row contributions x_i·(x·v) quantize
  * to the 1e-6 long grid (order-free sums), the mean μ is the exact
  * integer-grid mean, dot products are sequential double arithmetic
  * (the cosine-oracle contract), sqrt is IEEE-correctly-rounded
  * everywhere, and the iterate re-rounds to 6 decimals after
  * normalization — so the DuckDB oracle replays every iteration
  * bit-for-bit. Deterministic init v₀ = e₀ (no RNG): convergence needs
  * a v₀ not orthogonal to PC1, which a fixed basis vector satisfies on
  * anything but adversarial data; the operator is deterministic either
  * way, which is what the correctness contract needs.
  */
object Pca {

  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** The corpus as (vec_id, v: array<double>) plus the 1-row exact
    * integer-grid mean vector (μ). */
  private def meanVec(e: DataFrame): DataFrame =
    e.select(posexplode(col("v")))
      .select(col("pos"),
        floor(col("col") * lit(1000000.0) + lit(0.5)).cast("long").as("qc"))
      .groupBy(col("pos"))
      .agg(sum(col("qc")).as("s"), count(lit(1)).as("n"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("s"), col("n")))),
        x => x.getField("s").cast("double") /
          (x.getField("n").cast("double") * lit(1000000.0))).as("mu"))

  /** `iters` rounds of power iteration; returns a 1-row DataFrame
    * (v: array<double>, mu: array<double>) with the final unit-norm
    * component (components rounded to 6 decimals). The dimension is
    * DERIVED from the data (v₀ is built index-wise from μ itself), so
    * a caller can never hand a mismatched dim and get silent all-NULL
    * dot products out of zip_with's null-padding. */
  def pc1(embs: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val e = embs.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("x"))
    val mu = meanVec(e.select(col("vec_id"), col("x").as("v")))
    // v0 = e0 — fixed, RNG-free. The 1-row iterate is materialized
    // every round: it is referenced TWICE per iteration (the x·v pass
    // and the mean-center step), and without truncation the lineage
    // doubles each round — plan size and upstream re-execution go
    // exponential in iters (the Materialize multi-consumer rule's
    // iterative worst case). A 1-row checkpoint is free.
    var v = graft.Materialize.once(mu.select(col("mu"),
      transform(col("mu"),
        (_, i) => when(i === 0, lit(1.0)).otherwise(lit(0.0))).as("v")))
    var r = 0
    while (r < iters) {
      val vb = broadcast(v)
      // per-row y = x·v (narrow), then per-dim order-free long sums
      val sums = e.crossJoin(vb)
        .select(col("x"), dotD(col("x"), col("v")).as("y"))
        .select(posexplode(col("x")).as(Seq("pos", "xi")), col("y"))
        .select(col("pos"),
          floor(col("xi") * col("y") * lit(1000000.0) + lit(0.5))
            .cast("long").as("qc"))
        .groupBy(col("pos"))
        .agg(sum(col("qc")).as("s"), count(lit(1)).as("n"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("s"), col("n")))),
          x => x.getField("s").cast("double") /
            (x.getField("n").cast("double") * lit(1000000.0))).as("xs"))
      // w = xs − μ·(μ·v); v' = round(w / ||w||, 6)
      val prev = v
      v = graft.Materialize.once(sums.crossJoin(vb)
        .select(col("mu"),
          zip_with(col("xs"), col("mu"),
            (s, m) => s - m * dotD(col("mu"), col("v"))).as("w"))
        // degenerate corpus (all vectors equal the mean, or the
        // iterate annihilated) → ||w|| = 0; dividing would silently
        // propagate NaN components into every projection. Fail fast
        // with a named error instead (PcaSpec pins it).
        .select(col("mu"), sqrt(dotD(col("w"), col("w"))).as("__nrm"), col("w"))
        .select(col("mu"),
          when(col("__nrm") > 0,
            transform(col("w"), x => round(x / col("__nrm"), 6)))
            .otherwise(raise_error(lit(
              "graft.Pca.pc1: zero-norm power iterate (degenerate corpus - " +
                "all vectors equal to the mean?)")))
            .as("v")))
      graft.Materialize.free(prev)
      r += 1
    }
    v
  }

  /** Per-vector mean-centered PC1 projection: (vec_id, proj) with
    * proj = round((x − μ)·v, 6) = round(x·v − μ·v, 6). One broadcast
    * of the trained 1-row component, one narrow scan. */
  def project(embs: DataFrame, iters: Int = 3): DataFrame = {
    val comp = broadcast(pc1(embs, iters))
    embs.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("x"))
      .crossJoin(comp)
      .select(col("vec_id"),
        round(dotD(col("x"), col("v")) - dotD(col("mu"), col("v")), 6).as("proj"))
  }
}
