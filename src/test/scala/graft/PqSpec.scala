package graft

import org.apache.spark.sql.functions._
import graft.operators.{Knn, Pq}
import graft.sources.Tables

/** Spec for IVF-PQ (#119): recall audit against the exact brute-force
  * top-k, code/index shape bounds, and ADC approximation sanity. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val M = 8
  private val KC = 16

  test("recall audit vs exact cosine top-k, and ADC actually orders candidates") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.where($"vec_id" < 10)
    val exact = Knn.cosineTopK(e, q, k = 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pq = Pq.ivfPqTopK(e, q, k = 5, m = M, kCodes = KC, iters = 2)
      .select($"query_id", $"vec_id", $"cos", $"adc").collect()
    val got = pq.map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet == exact.keySet, "every query must return results")
    // ANN recall: same contract class as knn_ivf — the coarse cells
    // bound what is reachable; on this corpus the probed+PQ pipeline
    // must keep a healthy fraction of the true top-5 overall
    val hits = exact.keys.toSeq.map(qid =>
      (got(qid) intersect exact(qid)).size).sum
    val total = exact.values.map(_.size).sum
    assert(hits.toDouble / total >= 0.5,
      s"IVF-PQ recall@5 collapsed: $hits/$total")
    // ADC approximates the (unnormalized) dot product: for each
    // returned row the exact per-pair dot must be finite and the ADC
    // within a loose additive band of it (codebooks reconstruct, not
    // memorize) — catches sign/scale bugs without overfitting
    val embMap = e.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap.view.mapValues(_.map(_.toDouble).toArray).toMap
    pq.foreach { r =>
      val dotExact = embMap(r.getLong(0)).zip(embMap(r.getLong(1)))
        .map { case (a, b) => a * b }.sum
      val adc = r.getDouble(3)
      assert(math.abs(adc - dotExact) <= 1.0,
        s"ADC far off exact dot: adc=$adc exact=$dotExact for row $r")
    }
  }

  test("codes are a valid compact index: m codes per vector, all from live codebooks") {
    val e = Tables.embeddings(spark, sfDir)
    val books = Pq.trainCodebooks(e, m = M, kCodes = KC, iters = 2)
      .select($"block", $"cell_id").as[(Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(books.keySet == (0 until M).toSet)
    books.values.foreach(cs => assert(cs.nonEmpty && cs.size <= KC))
    // every vector encodes to exactly m codes, each a live codebook id
    val blk = Pq.blocks(e, M)
    assert(blk.groupBy($"vec_id").count().where($"count" =!= M).count() == 0)
    val n = e.count()
    assert(blk.count() == n * M)
    // subvector layout: m blocks of d/m reassemble the original vector
    val dim = e.select(size($"embedding")).head.getInt(0)
    val subLens = blk.select(size($"sub")).distinct().as[Int].collect()
    assert(subLens.toSeq == Seq(dim / M), s"got $subLens")
  }

  test("training is deterministic: two independent runs produce identical codebooks") {
    val e = Tables.embeddings(spark, sfDir)
    def dump() = Pq.trainCodebooks(e, m = 4, kCodes = 8, iters = 1)
      .select($"block", $"cell_id", $"c").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toList)).toSet
    assert(dump() == dump())
  }

  test("codebook trainer: final plan shape constant in iters (per-round materialization)") {
    val e = Tables.embeddings(spark, sfDir)
    // each round's codebook is materialized, so the returned frame is
    // the last round's ExistingRDD — zero parquet in its plan and no
    // nesting of earlier rounds, at any iters
    def shape(iters: Int): (Int, Boolean) = {
      val p = Pq.trainCodebooks(e, m = 4, kCodes = 8, iters = iters)
        .queryExecution.executedPlan.toString
      ("(FileScan|Scan) parquet".r.findAllIn(p).length, p.contains("ExistingRDD"))
    }
    val (scans2, rdd2) = shape(2)
    val (scans8, rdd8) = shape(8)
    assert(rdd2 && rdd8, "per-round codebooks not materialized")
    assert(scans2 == scans8 && scans8 == 0,
      s"codebook final plan grew with iters: $scans2 scans @2 vs $scans8 @8")
    // higher-iters training stays deterministic
    def dump() = Pq.trainCodebooks(e, m = 4, kCodes = 8, iters = 5)
      .select($"block", $"cell_id", $"c").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toList)).toSet
    assert(dump() == dump())
  }

  test("blocks rejects m that does not divide d instead of silently truncating") {
    val e = Tables.embeddings(spark, sfDir)
    val dim = e.select(size($"embedding")).head.getInt(0)
    val badM = dim - 1 // never divides dim for dim > 2
    val ex = intercept[Exception] {
      Pq.blocks(e, badM).collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))).mkString(" | ")
    assert(rootMsg(ex).contains("must divide"),
      s"expected the m | d guard to fire, got: ${rootMsg(ex)}")
  }
}
