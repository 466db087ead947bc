package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.execution.LogicalRDD

/** Stats clamp for checkpointed frames.
  *
  * `Dataset.localCheckpoint`/`checkpoint` truncate the LINEAGE but
  * deliberately carry the source plan's `Statistics` into the
  * resulting [[LogicalRDD]] (so planning keeps size information). In
  * an ITERATIVE operator that is a trap: round r's plan joins round
  * r−1's checkpointed frame with itself, so the inherited
  * `sizeInBytes` is a polynomial of the previous round's — repeated
  * squaring across rounds. By round ~25 the BigInt has millions of
  * bits, every stats multiplication in
  * SizeInBytesOnlyStatsPlanVisitor crawls (measured: label-propagation
  * round times DOUBLING per round on a long-diameter graph), and
  * Catalyst finally dies with "BigInteger would overflow supported
  * range". Short-diameter graphs (few rounds) never showed it, which
  * is why dedup_cluster was fine and the √n-cell mutual-kNN graph was
  * not.
  *
  * The clamp keeps inherited stats UNCHANGED below the cap (small
  * frames keep their exact sizes and still auto-broadcast) and
  * replaces anything above it with a bare `sizeInBytes = cap`
  * statistic — still "huge" for every planning decision, but constant
  * across rounds, so per-round analysis cost stays flat and the
  * overflow is structurally impossible. Lives in the
  * org.apache.spark.sql package solely for access to the private[sql]
  * LogicalRDD constructor and Dataset.ofRows (the GraftColumnBridge
  * convention). */
object GraftStatsBridge {
  /** 2⁶⁰ bytes ≈ 1 EiB — far above any real frame, far below BigInt
    * pathology. */
  val DefaultCap: BigInt = BigInt(1) << 60

  /** Rewrite a checkpointed frame's inherited stats to an exact value.
    * Diagnostic/spec hook: MaterializeSpec uses it to prove the clamp
    * is strategy-invariant — a genuinely-huge honest size and its
    * clamped form must drive identical join planning, so the clamp
    * can never silently flip a broadcast decision at real scale. */
  def withStats(df: Dataset[Row], sizeInBytes: BigInt): Dataset[Row] =
    df.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val session =
          df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val p = new LogicalRDD(l.output, l.rdd, l.outputPartitioning,
          l.outputOrdering, l.isStreaming, l.stream)(
          session, Some(Statistics(sizeInBytes = sizeInBytes)), None)
        org.apache.spark.sql.classic.Dataset.ofRows(session, p)
      case other => throw new IllegalArgumentException(
        s"withStats needs a checkpointed (LogicalRDD) frame, got ${other.nodeName}")
    }

  def clampStats(df: Dataset[Row], cap: BigInt = DefaultCap): Dataset[Row] =
    df.queryExecution.analyzed match {
      case l: LogicalRDD if l.stats.sizeInBytes > cap =>
        val session =
          df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val clamped = new LogicalRDD(l.output, l.rdd, l.outputPartitioning,
          l.outputOrdering, l.isStreaming, l.stream)(
          session, Some(Statistics(sizeInBytes = cap)), None)
        org.apache.spark.sql.classic.Dataset.ofRows(session, clamped)
      case _ => df
    }
}
