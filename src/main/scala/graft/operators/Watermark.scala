package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Greenlist watermark detection (SURVEY §2 #154): the synthetic-text
  * gate a pretrain corpus runs to keep model-generated text out (or to
  * audit a distillation set for it). A watermarking decoder
  * (Kirchenbauer et al. 2023) biases token i toward a pseudo-random
  * "green list" seeded on token i−1; the detector counts green
  * transitions and z-tests the count against the unwatermarked γ·T
  * expectation. Draws are md5-derived on the (prev, cur) transition
  * ([[Text.watermarkGreens]]) so the DuckDB oracle replays every draw;
  * z = (g − γT)/√(Tγ(1−γ)) is the identical IEEE expression in both
  * engines; the verdict is length-gated at [[MinScored]] transitions —
  * a 7-token all-green doc z-scores 4.6 by chance structure, so length
  * gates the VERDICT, not the arithmetic.
  *
  * Scale: one narrow codegen'd map over the doc scan (tokens staged as
  * an attribute ref), zero shuffle — the same shape batch and
  * streaming (the 24/7 face feeds micro-batches through [[report]]
  * unchanged). */
object Watermark {
  /** Green-list fraction γ, in percent. */
  val GammaPct = 25
  /** Detection z threshold (the published 4-sigma convention). */
  val ZThresh = 4.0
  /** Minimum scored transitions for a meaningful verdict. */
  val MinScored = 20

  /** Per-document watermark report: (doc_id, n_scored, n_green,
    * green_ratio, z, watermarked). Docs with < 2 tokens score 0/0. */
  def report(src: DataFrame, gammaPct: Int = GammaPct,
      zThresh: Double = ZThresh, minScored: Int = MinScored): DataFrame = {
    require(gammaPct > 0 && gammaPct < 100, s"gammaPct in (0,100): $gammaPct")
    val g = gammaPct / 100.0
    val v = g * (1.0 - g)
    src.select(col("doc_id"), Text.tokensOrEmpty(col("text")).as("tk"))
      .select(col("doc_id"),
        greatest(size(col("tk")) - 1, lit(0)).cast("long").as("n_scored"),
        Text.watermarkGreens(col("tk"), gammaPct).as("n_green"))
      .select(col("doc_id"), col("n_scored"), col("n_green"),
        when(col("n_scored") > 0,
            round(col("n_green").cast("double") /
              col("n_scored").cast("double"), 6))
          .otherwise(lit(0.0)).as("green_ratio"),
        when(col("n_scored") > 0,
            round((col("n_green").cast("double") -
                lit(g) * col("n_scored").cast("double")) /
              sqrt(col("n_scored").cast("double") * lit(v)), 6))
          .otherwise(lit(0.0)).as("z"))
      .withColumn("watermarked",
        col("n_scored") >= minScored && col("z") > zThresh)
  }
}
