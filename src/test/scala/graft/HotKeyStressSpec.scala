package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling}

/** PB-shaped adversarial-skew stress: one giant key among small ones —
  * the shape that OOMs per-key buffering operators at cluster scale.
  * Each case pins BOTH correctness on the hot key and the scale
  * mechanism (bounded shuffle volume / spill-not-OOM execution),
  * measured from real task metrics rather than asserted in prose, so
  * the hot-key claims in SURVEY §5 are continuously enforced.
  *
  * Sizes are test-JVM-scaled (10⁶-row hot keys, 4 cores, 8g heap) but
  * the MECHANISMS under test are size-independent: a windowed funnel
  * either spills or it buffers per key; a pre-thin either bounds the
  * shuffle or it doesn't; a prefix filter either posts hot shingles or
  * it doesn't.
  */
class HotKeyStressSpec extends SparkSpec {

  /** Run `action`, returning (result, max per-stage peakExecutionMemory
    * bytes, total shuffle-write records, total disk spill bytes). */
  private def metered[A](action: => A): (A, Long, Long, Long) = {
    val peak = new AtomicLong(0)
    val shuffleRecs = new AtomicLong(0)
    val spill = new AtomicLong(0)
    val l = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        peak.getAndAccumulate(m.peakExecutionMemory, math.max)
        shuffleRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        spill.addAndGet(m.diskBytesSpilled)
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = action
      Thread.sleep(500) // listener bus drains async
      (r, peak.get, shuffleRecs.get, spill.get)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("funnel: one 10^6-event user completes in bounded execution memory") {
    // one adversarial user emits a million events across the stages;
    // a per-user collect_list would buffer all of them in ONE aggregate
    // row — the chained window minimums must instead stream/spill
    val n = 1000000L
    val hot = spark.range(n).select(
      lit("whale").as("user_id"),
      when(col("id") % 3 === 0, "click").when(col("id") % 3 === 1, "view")
        .otherwise("purchase").as("et"),
      (col("id") * 1000L).as("t"))
    val small = spark.range(300).select(
      concat(lit("u"), col("id") % 100).as("user_id"),
      when(col("id") % 3 === 0, "click").when(col("id") % 3 === 1, "view")
        .otherwise("purchase").as("et"),
      (col("id") * 7919L).as("t"))
    val events = hot.unionByName(small)
    val (rows, peak, _, _) = metered {
      graft.analytics.Analytics.funnelStages(events).collect()
    }
    // the whale clicks at id=0, views at id=1, purchases at id=2 —
    // full funnel despite a million events in its window partition
    val whale = rows.find(_.getString(0) == "whale")
    assert(whale.exists(_.getInt(1) == 3), s"whale funnel wrong: $whale")
    // mechanism: execution memory stays far below the raw hot-key
    // payload; the window spills to disk instead of buffering the key
    // (peak is page-quantized per consumer — the bound is loose but a
    // collect_list of 10^6 rows in one buffer would blow through it)
    assert(peak < (1L << 30), s"peakExecutionMemory $peak >= 1 GiB")
  }

  test("capPerGroupSkewSafe: 10^6-row hot group shuffles thousands of rows, not the group") {
    val n = 1000000L
    val hot = spark.range(n).select(col("id").as("doc_id"), lit("hot").as("g"))
    val small = spark.range(2000000, 2000200).select(col("id").as("doc_id"),
      concat(lit("s"), col("id") % 7).as("g"))
    val df = hot.unionByName(small)
    val (safeRows, _, shuffled, _) = metered {
      Sampling.capPerGroupSkewSafe(df, col("doc_id"), col("g"), k = 50)
        .select("doc_id", "g", "rk").collect()
    }
    // correctness: exact per-group output, identical to the unthinned
    // ranked window (which pays a full 10^6-row shuffle to rank)
    val plain = Sampling.capPerGroup(df, col("doc_id"), col("g"), k = 50)
      .select("doc_id", "g", "rk").collect()
    assert(safeRows.map(_.toSeq).toSet == plain.map(_.toSeq).toSet)
    assert(safeRows.count(_.getString(1) == "hot") == 50)
    // mechanism: the md5 pre-thin admits ~factor*k rows of the hot
    // group (Binomial mean 500), so TOTAL shuffled records across all
    // stages stay thousands — the unthinned form shuffles the full
    // 10^6-row group into one window partition
    assert(shuffled < 100000L,
      s"skew-safe cap shuffled $shuffled records — pre-thin not engaged")
  }

  test("jaccard verify: a 2000-doc hot vocabulary generates no hot-shingle candidates") {
    // every doc shares a hot 3-word header (hot bigrams, df=2000) but
    // carries enough unique shingles that the AllPairs prefix never
    // posts a hot one; 10 planted duplicate pairs are the only true
    // near-dups. A naive shingle join would emit ~2*10^6 candidate
    // pairs from the hot bigrams alone.
    import spark.implicits._
    val base = spark.range(2000).select(col("id").cast("long").as("doc_id"),
      concat(lit("storm warning issued "),
        concat_ws(" ", (0 to 7).map(j => concat(lit(s"u${j}x"), col("id"))): _*))
        .as("text"))
    val dups = spark.range(10).select((col("id") + 10000).cast("long").as("doc_id"),
      concat(lit("storm warning issued "),
        concat_ws(" ", (0 to 7).map(j => concat(lit(s"u${j}x"), col("id"))): _*))
        .as("text"))
    val docs = base.unionByName(dups)
    val (pairs, _, shuffled, _) = metered {
      Dedup.jaccardPairs(docs, k = 2, threshold = 0.5).collect()
    }
    // exactly the planted duplicates (jaccard 1.0), nothing from the
    // hot header
    assert(pairs.length == 10, s"expected 10 planted pairs, got ${pairs.length}")
    assert(pairs.forall(r => r.getLong(1) == r.getLong(0) + 10000), pairs.take(3).toSeq.toString)
    assert(pairs.forall(_.getDouble(2) == 1.0))
    // mechanism: shuffle volume ~ postings + prefix + verified pairs —
    // orders of magnitude below the 2*10^6 hot-bigram candidate pairs
    assert(shuffled < 400000L,
      s"jaccard shuffled $shuffled records — hot shingles reached the prefix join")
  }
}
