package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Trained linear quality classifier — the model-based successor to
  * rule quality filters: distill the Gopher rule set into a linear
  * model over cheap integer text features (logistic regression with a
  * piecewise-linear "hard sigmoid" link), then score every document
  * with one narrow map. The production use is the standard two-stage
  * quality pipeline: rules label a seed set, the linear probe
  * generalizes them to a smooth score that ranks borderline documents
  * instead of guillotining them.
  *
  * Deterministic and ENGINE-REPLAYABLE end-to-end, the embed_pca /
  * kmeans discipline applied to supervised training:
  * - features quantize to the 1e-6 grid (floor(v·1e6 + 0.5)/1e6) from
  *   exact integer token counts, so both engines start from identical
  *   doubles;
  * - the link is the HARD sigmoid clamp(z/4 + 1/2, 0, 1) — exact
  *   rational arithmetic, no transcendental exp whose last-ulp
  *   differences across libm implementations could straddle a
  *   rounding boundary;
  * - per-row gradient contributions quantize to 1e-6-grid longs and
  *   sum ORDER-FREE; each step's weights re-round to the 1e-6 grid —
  *   so the DuckDB oracle replays the full 8-step training loop and
  *   every score bit-for-bit.
  *
  * Scale shape: training is `steps` passes, each ONE aggregation over
  * the corpus producing 5 longs + a count (map-side combine; nothing
  * corpus-sized shuffles), weights travel as literals; scoring is one
  * narrow codegen'd map. The driver holds 5 doubles per step — the
  * same bounded-collect pattern as Pca's 1-row iterate. */
object Classify {

  /** 1e-6-grid re-round: floor(v·1e6 + 0.5)/1e6, both engines. */
  private def r6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)).cast("double") / lit(1000000.0)

  /** The integer measurement pass shared with corpus_gopher (same
    * expressions, same staging), plus the rule label. */
  private def measured(docs: DataFrame): DataFrame = {
    val staged = docs
      .select(col("doc_id"), Text.tokensOrEmpty(col("text")).as("tk"))
      .withColumn("bg", Text.bigramsOf(col("tk")))
    val enArr = array(Text.stopwords.head._2.map(lit): _*)
    staged.select(col("doc_id"),
      size(col("tk")).cast("long").as("n"),
      aggregate(col("tk"), lit(0L), (a, t) => a + length(t)).as("tot_len"),
      size(filter(col("tk"), t => t.rlike("[a-z]"))).cast("long").as("n_alpha"),
      size(filter(col("tk"), t => array_contains(enArr, t))).cast("long").as("stop_hits"),
      Text.topTokenCount(col("tk")).cast("long").as("top_n"),
      size(col("bg")).cast("long").as("n_bg"),
      size(array_distinct(col("bg"))).cast("long").as("n_bg_d"))
  }

  /** (doc_id, x1..x4, y, label): 1e-6-grid features in [0, 1] from the
    * gopher measurement pass — saturating length, alpha-token ratio,
    * stopword ratio, duplicate-bigram ratio — and the Gopher-rule
    * label this probe distills. */
  def features(docs: DataFrame): DataFrame = {
    val m = measured(docs)
    val pass = (col("n") >= 30 && col("n") <= 100000) &&
      (col("tot_len") >= lit(3L) * col("n") &&
        col("tot_len") <= lit(10L) * col("n") && col("n") > 0) &&
      (lit(5L) * col("n_alpha") >= lit(4L) * col("n") && col("n") > 0) &&
      (col("stop_hits") >= 2) &&
      (lit(5L) * col("top_n") <= col("n")) &&
      ((col("n_bg") - col("n_bg_d")) * 5 <= col("n_bg"))
    m.select(col("doc_id"),
      r6(least(col("n"), lit(200L)).cast("double") / lit(200.0)).as("x1"),
      r6(col("n_alpha").cast("double") / greatest(col("n"), lit(1L)).cast("double")).as("x2"),
      r6(col("stop_hits").cast("double") / greatest(col("n"), lit(1L)).cast("double")).as("x3"),
      r6((col("n_bg") - col("n_bg_d")).cast("double")
        / greatest(col("n_bg"), lit(1L)).cast("double")).as("x4"),
      when(pass, lit(1.0)).otherwise(lit(0.0)).as("y"),
      pass.as("label"))
  }

  /** z = w0 + w1·x1 + … (left-associated, the order the oracle
    * replays) and the hard-sigmoid link p = clamp(z/4 + 1/2, 0, 1). */
  private def linkP(w: Array[Double]): Column = {
    val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
      lit(w(3)) * col("x3") + lit(w(4)) * col("x4")
    least(greatest(lit(0.25) * z + lit(0.5), lit(0.0)), lit(1.0))
  }

  /** `steps` deterministic full-batch gradient steps from w = 0:
    * w_j ← round6(w_j − lr · Σ floor((p−y)·x_j·1e6 + 0.5) / (n·1e6)).
    * One corpus aggregation per step; 5 doubles cross the driver. */
  def trainWeights(feats: DataFrame, steps: Int = 8, lr: Double = 8.0): Array[Double] = {
    require(steps >= 1, s"need steps >= 1, got $steps")
    var w = Array(0.0, 0.0, 0.0, 0.0, 0.0)
    var t = 0
    while (t < steps) {
      val staged = feats.select(col("x1"), col("x2"), col("x3"), col("x4"),
        (linkP(w) - col("y")).as("r"))
      val row = staged.select(
          floor(col("r") * lit(1000000.0) + lit(0.5)).cast("long").as("g0"),
          floor(col("r") * col("x1") * lit(1000000.0) + lit(0.5)).cast("long").as("g1"),
          floor(col("r") * col("x2") * lit(1000000.0) + lit(0.5)).cast("long").as("g2"),
          floor(col("r") * col("x3") * lit(1000000.0) + lit(0.5)).cast("long").as("g3"),
          floor(col("r") * col("x4") * lit(1000000.0) + lit(0.5)).cast("long").as("g4"))
        .agg(sum(col("g0")), sum(col("g1")), sum(col("g2")), sum(col("g3")),
          sum(col("g4")), count(lit(1)))
        .head()
      val nd = row.getLong(5)
      // on an empty frame the sums are NULL and nd = 0 — getLong would
      // NPE and the update would divide by zero; fail with intent
      require(nd > 0, "corpus_classify needs a non-empty corpus")
      w = w.indices.toArray.map { j =>
        val g = row.getLong(j).toDouble / (nd.toDouble * 1000000.0)
        math.floor((w(j) - lr * g) * 1000000.0 + 0.5) / 1000000.0
      }
      t += 1
    }
    w
  }

  /** Score documents under GIVEN weights — the serving face: a
    * training job publishes `w` once, every consumer (batch scoring,
    * the streaming classify gate) runs this one narrow map. Same
    * output shape and 1e-6-grid rounding as [[scores]]. */
  def scoreWith(docs: DataFrame, w: Array[Double]): DataFrame = {
    require(w.length == 5, s"need 5 weights (w0..w4), got ${w.length}")
    features(docs).select(col("doc_id"), r6(linkP(w)).as("score"),
      (r6(linkP(w)) >= lit(0.5)).as("pred"), col("label"))
  }

  /** Train on the corpus, score the corpus: (doc_id, score, pred,
    * label) with score = round6(p) under the trained weights and
    * pred = score ≥ 0.5. Building this DataFrame RUNS the training
    * aggregations (the eager-materialization caveat Pca shares). */
  def scores(docs: DataFrame, steps: Int = 8, lr: Double = 8.0): DataFrame = {
    // every training step AND the final scoring consume the feature
    // frame — without truncation that is steps+1 full tokenization
    // passes over the corpus (the multi-consumer recompute rule);
    // materialized, the expensive token/bigram pass runs ONCE and the
    // steps re-scan a (doc_id, 4 doubles, y, label) frame
    val feats = graft.Materialize.once(features(docs))
    val w = trainWeights(feats, steps, lr)
    feats.select(col("doc_id"), r6(linkP(w)).as("score"),
      (r6(linkP(w)) >= lit(0.5)).as("pred"), col("label"))
  }
}
