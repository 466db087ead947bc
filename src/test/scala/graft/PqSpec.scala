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

  test("append under frozen codebooks == full re-encode; compaction invisible; recall audit runs") {
    val e = Tables.embeddings(spark, sfDir)
    val base = e.where($"vec_id" % 5 =!= 4)
    val delta = e.where($"vec_id" % 5 === 4)
    val q = e.where($"vec_id" < 10)
    val lake = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-append").toString
    assert(Pq.publishIvfPqLake(base, lake, m = M, kCodes = KC, iters = 2) == 0)
    // FAISS add(): encode the delta under the FROZEN published
    // codebooks, O(batch) delta commit under the same pointer
    assert(Pq.appendToIvfPqLake(spark, lake, delta, maxSegments = 0) == 1)
    // ADVICE r17: the delta segment must inherit the published
    // cell_id layout so indexed probes keep directory pruning over
    // deltas — a flat delta write would silently lose it until
    // compaction (and a layout-dropping compaction forever)
    def layoutPartitioned(dir: String): Boolean = {
      val f = new java.io.File(dir)
      f.isDirectory && f.listFiles.exists(_.getName.startsWith("cell_id="))
    }
    assert(layoutPartitioned(s"$lake/seg-1/vectors"),
      "appended vectors segment lost the cell_id partition layout")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val got = rows(Pq.ivfPqTopKIndexed(spark, lake, q, k = 5))
    // truth: a full re-encode of the GROWN corpus under the same
    // frozen (base-trained) coarse centroids and codebooks
    val nc = Knn.autoCells(base.count())
    val coarse = graft.Materialize.once(Knn.ivfCentroids(base, nc))
    val books = graft.Materialize.once(
      Pq.trainCodebooks(base, M, KC, iters = 2))
    val vectors = Knn.ivfAssign(e, coarse)
    val codes = graft.Materialize.once(
      Pq.blocks(e, M).transform(b =>
        b.join(broadcast(books), "block")
          .select(col("vec_id"), col("block"), col("sub"),
            struct(round(graft.expressions.native.dist2D(col("sub"), col("c")), 6)
              .as("d"), col("cell_id")).as("sc"))
          .groupBy(col("vec_id"), col("block"))
          .agg(min(col("sc")).as("best"))
          .select(col("vec_id"), col("block"),
            col("best.cell_id").as("code"))))
    val want = rows(Pq.probe(coarse, vectors, books, codes, q,
      k = 5, m = M, nProbe = 4, rerank = 4))
    assert(got == want,
      "append-then-probe diverged from full re-encode under frozen codebooks")
    // compaction folds the segments and must not change the ranking
    assert(graft.sources.StormSinks.maintainGroupSegments(spark, lake, 1))
    assert(rows(Pq.ivfPqTopKIndexed(spark, lake, q, k = 5)) == want,
      "compaction changed the probe result")
    // ... and the fold must CARRY the layout, not flatten it
    val foldedVer = graft.sources.StormSinks.currentVersionName(spark, lake)
    val foldedVectors = graft.sources.StormSinks
      .segmentsAt(spark, lake, foldedVer, "vectors").head
    assert(layoutPartitioned(foldedVectors),
      "compaction flattened the cell_id partition layout")
    // the quantization recall audit re-runs over the APPENDED index:
    // bounded, non-degenerate recall (the retrain-cadence signal)
    val rec = Knn.rankingRecall(e, q, ks = Seq(1, 5),
      Pq.ivfPqTopKIndexed(spark, lake, q, k = 5)
        .select($"query_id", $"rk", $"vec_id")).collect()
    assert(rec.length == 20) // 10 queries x 2 cutoffs
    rec.foreach { r =>
      val (k, hits) = (r.getAs[Long]("k"), r.getAs[Long]("hits"))
      assert(hits >= 0 && hits <= k)
      val v = r.getAs[Double]("recall")
      assert(v >= 0.0 && v <= 1.0)
    }
    assert(rec.map(_.getAs[Long]("hits")).sum > 0,
      "appended-index recall audit found zero overlap with exact - broken index")
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
