package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus drift detection: Population-Stability-Index terms over the
  * monitored feature distributions (language, source, length bucket),
  * Laplace-smoothed, on the exact 1e-6 integer grid so any engine
  * replays the terms bit-for-bit (the corpus_drift oracle does).
  *
  * Factored out of the corpus_drift query so the BATCH key and the
  * STREAMING gate ([[graft.streaming.CorpusStream.startDriftGate]])
  * share the featurization and the PSI arithmetic by construction —
  * the gate's last-batch terms equal the batch query's terms on the
  * same (reference, ingested) pair because they are the same
  * expressions, not a re-implementation (CorpusStreamSpec pins it).
  *
  * Scale shape: featureRows is a narrow per-row map (3 rows out per
  * doc); counts aggregate with map-side combine to one row per
  * (feature, bucket) — bucket-cardinality-sized, tiny at any corpus
  * size — and psiTerms runs entirely on those count rows. Nothing
  * downstream of the one count aggregation scales with the corpus.
  */
object Drift {

  /** Per-document monitored-feature rows: (doc_id, feature, bucket).
    * The three features corpus_drift watches — language, source, and
    * the 200-char length bucket. */
  def featureRows(doc: DataFrame): DataFrame = {
    def f(name: String, c: Column) = doc.select(col("doc_id"),
      lit(name).as("feature"), c.cast("string").as("bucket"))
    f("lang", col("lang"))
      .unionByName(f("source", col("source")))
      .unionByName(f("len", concat(lit("chars_"), expr("n_chars div 200"))))
  }

  /** Bucket counts for one document set: (feature, bucket, n). */
  def bucketCounts(doc: DataFrame, nCol: String): DataFrame =
    featureRows(doc).groupBy(col("feature"), col("bucket"))
      .agg(count(lit(1)).as(nCol))

  /** Exact integer-grid PSI terms from per-bucket pair counts
    * (feature, bucket, ref_n, cur_n): Laplace +1 smoothing over the
    * nb buckets of each feature,
    * term_i = round(round(ln((ref_n+1)(cur_tot+nb) /
    * (cur_n+1)(ref_tot+nb)), 6) · round(p − q, 6) · 1e6).
    * PSI = Σ term_i / 1e6 per feature; every term is engine-exact
    * (the log rounds to the 1e-6 grid before the product, and the
    * ratio is formed from one integer-exact division). Output keeps
    * the input's (feature, bucket, ref_n, cur_n) plus term_i. */
  def psiTerms(counts0: DataFrame): DataFrame = {
    // materialized ONCE: the pair-count table feeds the per-feature
    // totals aggregate AND the term join — un-truncated, the 3-way
    // feature union + count aggregation re-ran per reference (6
    // parquet scans in corpus_drift's plan; r18-opt). Bucket-sized.
    val counts = graft.Materialize.once(counts0)
    val tot = counts.groupBy(col("feature"))
      .agg(sum(col("ref_n")).as("ref_tot"), sum(col("cur_n")).as("cur_tot"),
        count(lit(1)).as("nb"))
    val p = (col("ref_n") + 1).cast("double") / (col("ref_tot") + col("nb")).cast("double")
    val q = (col("cur_n") + 1).cast("double") / (col("cur_tot") + col("nb")).cast("double")
    val ratio = ((col("ref_n") + 1) * (col("cur_tot") + col("nb"))).cast("double") /
      ((col("cur_n") + 1) * (col("ref_tot") + col("nb"))).cast("double")
    counts.join(tot, "feature")
      .select(col("feature"), col("bucket"), col("ref_n"), col("cur_n"),
        round(round(log(ratio), 6) * round(p - q, 6) * lit(1000000.0))
          .cast("long").as("term_i"))
  }
}
