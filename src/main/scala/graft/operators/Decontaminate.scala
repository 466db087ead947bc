package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share long
  * n-gram shingles with a held-out evaluation set — the standard
  * pre-training hygiene pass that keeps test data out of the corpus.
  *
  * Construction: distinct k-token shingles (k high enough that a
  * collision means real textual overlap, 8 by convention) on both
  * sides; the benchmark's shingle set is deduplicated and broadcast —
  * an eval suite is tiny next to a 100 TB corpus, so the corpus side
  * never shuffles: the probe is a map-side broadcast-hash semi-join.
  * Only the per-doc overlap count aggregates (one keyed shuffle of the
  * flagged docs, a vanishing fraction of the input).
  *
  * At extreme benchmark sizes, hash the shingles (xxhash64) before the
  * broadcast to cut the build side ~10×; kept as raw strings here so
  * the DuckDB oracle replays the join exactly.
  */
object Decontaminate {

  /** (doc_id, n_shared): corpus docs sharing ≥1 k-shingle with the
    * benchmark, with the count of distinct shared shingles (shingle
    * sets are distinct by construction, so count(*) is distinct). */
  def flag(corpus: DataFrame, benchmark: DataFrame, k: Int = 8): DataFrame = {
    val bench = benchmark
      .select(explode(Dedup.shingles(col("text"), k)).as("s"))
      .distinct()
    corpus
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), k)).as("s"))
      .join(broadcast(bench), "s")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** The keep side: corpus minus flagged docs (left-anti on the flag). */
  def clean(corpus: DataFrame, benchmark: DataFrame, k: Int = 8): DataFrame =
    corpus.join(flag(corpus, benchmark, k), Seq("doc_id"), "left_anti")
}
