package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.CorpusStream
import graft.sources.Tables

/** Spec for the streaming heavy-hitter token trends
  * (CorpusStream.startTokenTrends): MG guarantees over the full
  * stream, bounded state, restart merge, and replay idempotence. */
class TrendsSpec extends SparkSpec {
  import spark.implicits._

  private def latestSnapshot(outDir: String): (Long, Map[String, Long]) = {
    val df = spark.read.parquet(outDir)
    val maxB = df.agg(max($"batch_seq")).head().getLong(0)
    (maxB, df.where($"batch_seq" === maxB)
      .select($"token", $"est").as[(String, Long)].collect().toMap)
  }

  private def exactCounts(docs: org.apache.spark.sql.DataFrame): Map[String, Long] =
    docs.select(explode(graft.functions.Text.tokens(col("text"))).as("token"))
      .where($"token" =!= "")
      .groupBy($"token").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap

  test("recovery: an outDir holding only crash artifacts counts as a fresh stream") {
    // a crash during the first snapshot write leaves outDir existing
    // with only _temporary inside — recovery must treat that as fresh
    // (no committed part file), not crash-loop on an unreadable dir
    val base = Files.createTempDirectory("graft-trends-crash").toString
    Tables.documents(spark, sfDir).limit(50).coalesce(1)
      .write.mode("overwrite").parquet(s"$base/in")
    Files.createDirectories(java.nio.file.Paths.get(s"$base/out/_temporary/0"))
    CorpusStream.startTokenTrends(spark, s"$base/in", s"$base/out", s"$base/cp",
      capacity = 8).awaitTermination()
    val (_, snap) = latestSnapshot(s"$base/out")
    assert(snap.nonEmpty, "stream did not recover from crash artifacts")
  }

  test("trends: guarantees over the whole stream, k-slot state, restart + replay") {
    val base = Files.createTempDirectory("graft-trends").toString
    val docs = Tables.documents(spark, sfDir)
    val wave1 = docs.where($"doc_id" < 250)
    val wave2 = docs.where($"doc_id" >= 250)
    wave1.coalesce(3).write.mode("overwrite").parquet(s"$base/in")

    val k = 8
    CorpusStream.startTokenTrends(spark, s"$base/in", s"$base/out", s"$base/cp",
      capacity = k).awaitTermination()
    val (seq1, snap1) = latestSnapshot(s"$base/out")
    val ex1 = exactCounts(wave1)
    val n1 = ex1.values.sum
    assert(snap1.size <= k)
    snap1.foreach { case (t, est) =>
      assert(est <= ex1(t), s"$t over-estimated after wave 1")
      assert(est >= ex1(t) - n1 / (k + 1), s"$t under bound after wave 1")
    }

    // replay the same input on the same checkpoint: no new snapshot,
    // nothing double-merged
    CorpusStream.startTokenTrends(spark, s"$base/in", s"$base/out", s"$base/cp",
      capacity = k).awaitTermination()
    val (seqR, snapR) = latestSnapshot(s"$base/out")
    assert(seqR == seq1 && snapR == snap1, "replay changed the summary")

    // second wave: a fresh query (driver restart) must reload the
    // snapshot and keep the guarantees over the FULL stream prefix
    wave2.coalesce(2).write.mode("append").parquet(s"$base/in")
    CorpusStream.startTokenTrends(spark, s"$base/in", s"$base/out", s"$base/cp",
      capacity = k).awaitTermination()
    val (seq2, snap2) = latestSnapshot(s"$base/out")
    assert(seq2 > seq1)
    assert(snap2.size <= k)
    val exAll = exactCounts(docs)
    val nAll = exAll.values.sum
    snap2.foreach { case (t, est) =>
      assert(est <= exAll(t), s"$t over-estimated after wave 2")
    }
    // presence guarantee: anything above the merged threshold is kept.
    // merging across b snapshots/batches can each contribute an
    // n_i/(k+1) deficit; the mergeable-summaries bound stays n/(k+1)
    // TOTAL, so the presence threshold is unchanged.
    exAll.foreach { case (t, c) =>
      if (c > nAll / (k + 1))
        assert(snap2.contains(t), s"above-threshold token $t evicted")
    }
  }

  test("lost checkpoint with surviving snapshot fails fast (no silent batch skipping)") {
    val base = Files.createTempDirectory("graft-trends-ckpt").toString
    Tables.documents(spark, sfDir).limit(50).coalesce(1)
      .write.mode("overwrite").parquet(s"$base/in")
    CorpusStream.startTokenTrends(spark, s"$base/in", s"$base/out", s"$base/cp",
      capacity = 8).awaitTermination()
    assert(latestSnapshot(s"$base/out")._2.nonEmpty)
    // checkpoint lost, snapshot survives: batchIds would restart at 0
    // and genuinely-new batches would be skipped as replays - must throw
    val ex = intercept[IllegalStateException] {
      CorpusStream.startTokenTrends(spark, s"$base/in", s"$base/out",
        s"$base/cp-recreated", capacity = 8)
    }
    assert(ex.getMessage.contains("checkpoint"))
  }
}
