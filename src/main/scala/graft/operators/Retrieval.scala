package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The append-capable published layout of the BM25 sparse index —
  * the last published index family to gain a continuous-ingest face
  * (minhash #95c, Jaccard #123c, clusters #123d and IVF-PQ all have
  * one; #95b's single-table layout serves but cannot absorb new docs
  * without a full corpus-sized rebuild).
  *
  * The split that makes append possible: tf/dl are PER-DOC (new docs
  * bring their own), while df / n_docs / avgdl are CORPUS-GLOBAL —
  * appending docs honestly would change every published weight. So
  * the append freezes the global statistics (exactly how a
  * Lucene/Elasticsearch segment scores against its snapshot
  * statistics, and the sparse twin of [[Pq.appendToIvfPqLake]]'s
  * frozen codebooks): new docs' KNOWN-vocabulary tokens score under
  * the published df/n_docs/avgdl, out-of-vocabulary tokens contribute
  * nothing (no frozen idf exists for them — the frozen-vocabulary
  * contract, what FAISS add() does with its frozen coarse space),
  * and the statistics retrain on the republish cadence. The
  * `retrieval_indexed_append` oracle replays publish + frozen-stats
  * append + probe in one hash, so the contract is correctness-gated,
  * not just documented.
  *
  * Tables (ONE atomic versioned group — weights can never pair with
  * another version's statistics):
  *   weights (doc_id, token, w_i) — the serving table (#95b's shape)
  *   dl      (doc_id, dl)         — per-doc lengths (append-side audit)
  *   df      (token, df)          — the frozen document frequencies
  *   stats   (n_docs, avgdl)      — the frozen corpus statistics
  */
object Retrieval {

  /** Train-once publish: build the full integer-grid BM25 index and
    * commit all four tables as one version. Returns the version. */
  def publishBm25Lake(doc: DataFrame, dir: String): Int =
    graft.Materialize.scoped {
      val (tf, dl0) = PipelineQueries.bm25TfDl(doc)
      val dl = graft.Materialize.once(dl0)
      val dfreq = graft.Materialize.once(
        tf.groupBy(col("token")).agg(count(lit(1)).as("df")))
      val stats = graft.Materialize.once(
        doc.agg(count(lit(1)).as("n_docs"))
          .crossJoin(dl.agg(sum(col("dl")).as("sum_dl")))
          .select(col("n_docs"),
            (col("sum_dl").cast("double") / col("n_docs").cast("double"))
              .as("avgdl")))
      graft.sources.StormSinks.writeVersionedGroup(doc.sparkSession, dir, Seq(
        "weights" -> PipelineQueries.bm25WeightsFrom(tf, dl, dfreq, stats),
        "dl" -> dl, "df" -> dfreq, "stats" -> stats))
    }

  /** Frozen-stats append: score `newDocs` under the PUBLISHED
    * statistics (one pointer resolution = one snapshot) and commit
    * their weights + dl as O(batch) delta segments under the same
    * pointer ([[graft.sources.StormSinks.appendDeltaGroup]]); df and
    * stats carry forward untouched. Probe-after-append is IDENTICAL
    * to a full rebuild of the grown corpus under the same frozen
    * statistics (RetrievalLakeSpec pins it); ranking quality decays
    * as the true df/avgdl drift from the frozen snapshot — the
    * republish-cadence signal, measurable with [[Knn.rankingEval]]
    * against the exact rebuild. `maxSegments` bounds read
    * amplification via the compaction cadence (#16i); 0 disables.
    * Appended doc_ids must be disjoint from published ones (writer
    * contract, same as every delta table here). Returns the version. */
  def appendToBm25Lake(spark: SparkSession, dir: String,
      newDocs: DataFrame, maxSegments: Int = 64): Int =
    graft.Materialize.scoped {
      import graft.sources.StormSinks
      val ver = StormSinks.currentVersionName(spark, dir)
      val dfreq = StormSinks.readGroupTableAt(spark, dir, ver, "df")
      val stats = StormSinks.readGroupTableAt(spark, dir, ver, "stats")
      val (tf, dl0) = PipelineQueries.bm25TfDl(newDocs)
      val dl = graft.Materialize.once(dl0)
      val v = StormSinks.appendDeltaGroup(spark, dir, appends = Seq(
        "weights" -> PipelineQueries.bm25WeightsFrom(tf, dl, dfreq, stats),
        "dl" -> dl))
      if (maxSegments > 0)
        StormSinks.maintainGroupSegments(spark, dir, maxSegments)
      v
    }

  /** The serving table at the current version (all segments, one
    * pointer resolution) — feed it to [[PipelineQueries.sparseTopK]]
    * or any sparse scorer. */
  def readBm25Weights(spark: SparkSession, dir: String): DataFrame =
    graft.sources.StormSinks.readGroupTableAt(spark, dir,
      graft.sources.StormSinks.currentVersionName(spark, dir), "weights")
}
