package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.CorpusStream

/** Long-horizon soak of the composed one-scan ingest
  * ([[CorpusStream.startCorpusIngest]]): 50 micro-batches in one
  * AvailableNow run — an order of magnitude past the 2-3-batch parity
  * specs — asserting the three properties a 24/7 deployment actually
  * runs on:
  *
  *  1. BOUNDED STATE: the card state group's version dirs stay inside
  *     the inline vacuum's retention and its fps segments inside the
  *     compaction cadence, no matter how many batches committed; the
  *     block manager holds ZERO residue after the run (every
  *     per-batch materialization freed at its scope).
  *  2. BOUNDED DRIVER HEAP: post-GC used heap grows by less than a
  *     fixed slack over the whole run — a leak that grows per batch
  *     (listener accumulation, un-freed plans, stranded blocks) would
  *     compound 50×.
  *  3. FLAT PER-BATCH LATENCY: the median batch duration of the last
  *     10 batches stays within 3× the median of the first 10 — state
  *     reads are pointer-resolved snapshots and commits are O(batch)
  *     deltas, so batch cost must not trend with batch COUNT. (3× is
  *     deliberate slack for GC/JIT noise on tiny batches; the failure
  *     mode this guards — O(n-batches) state replay per batch — shows
  *     up as 10×+ by batch 50.)
  */
class IngestSoakSpec extends SparkSpec {

  private def usedHeapAfterGc(): Long = {
    System.gc(); Thread.sleep(200); System.gc()
    val rt = Runtime.getRuntime
    rt.totalMemory() - rt.freeMemory()
  }

  test("50-batch composed-ingest soak: bounded state, bounded heap, flat latency") {
    val base = Files.createTempDirectory("graft-ingest-soak").toString
    val docs = Tables.documents(spark, sfDir)
    // 50 waves, one file each: doc_id mod 50 slices the corpus into
    // deterministic, roughly equal micro-batches
    (0 until 50).foreach { w =>
      docs.where(col("doc_id") % 50 === w).coalesce(1)
        .write.mode("append").parquet(s"$base/in")
    }
    val nFiles = new java.io.File(s"$base/in").listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(nFiles == 50, s"expected 50 input files, got $nFiles")

    val faces = CorpusStream.IngestFaces(
      chunksDir = Some(s"$base/chunks"),
      cardStateDir = Some(s"$base/card"),
      funnelDir = Some(s"$base/funnel"))
    val heap0 = usedHeapAfterGc()
    val blocks0 = spark.sparkContext.getPersistentRDDs.keySet
    val q = CorpusStream.startCorpusIngest(spark, s"$base/in", faces,
      s"$base/cp", maxFilesPerTrigger = 1)
    q.awaitTermination()

    // all 50 batches ran, once each
    val funnel = spark.read.parquet(s"$base/funnel")
    assert(funnel.select(col("batch_seq")).distinct().count() == 50)
    assert(funnel.where(col("face") === "raw")
      .agg(sum(col("n_rows"))).head().getLong(0) == docs.count())

    // 1. bounded state: vacuum keeps the version count flat (keep=2
    // + the base segment the delta manifests reference); the fps
    // registry's segments stay inside the 64-segment cadence; zero
    // block-manager residue
    val vdirs = new java.io.File(s"$base/card").listFiles
      .count(_.getName.startsWith("v-"))
    assert(vdirs <= 4, s"card versions grew with batch count: $vdirs dirs")
    val segs = new java.io.File(s"$base/card").listFiles
      .count(_.getName.startsWith("seg-"))
    assert(segs <= 64, s"fps segments escaped the compaction cadence: $segs")
    assert((spark.sparkContext.getPersistentRDDs.keySet -- blocks0).isEmpty,
      "soak leaked materialized frames")

    // 2. bounded driver heap: < 512 MB growth over 50 batches (the
    // leak class this catches compounds per batch — a real one blows
    // far past this slack by batch 50)
    val heapGrowth = usedHeapAfterGc() - heap0
    assert(heapGrowth < 512L * 1024 * 1024,
      s"driver heap grew ${heapGrowth / 1024 / 1024} MB over the soak")

    // 3. flat latency: median of last 10 batch durations within 3x
    // the median of the first 10
    val durs = q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .map(p => p.durationMs.get("triggerExecution").toLong)
    assert(durs.size >= 50, s"expected >=50 progress rows, got ${durs.size}")
    def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
    val first = median(durs.take(10))
    val last = median(durs.takeRight(10))
    assert(last <= first * 3,
      s"per-batch latency trends with batch count: first10-median=${first}ms last10-median=${last}ms")

    // the cumulative card after 50 commits still equals one batch
    // aggregation (the parity invariant holds at soak horizon too)
    val card = CorpusStream.readCorpusCard(spark, s"$base/card")
    assert(card.agg(sum(col("n_docs"))).head().getLong(0) == docs.count())
    assert(card.agg(sum(col("dup_docs"))).head().getLong(0) == 0L,
      "the all-distinct corpus must produce zero dup verdicts")
  }
}
