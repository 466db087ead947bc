package graft

import org.apache.spark.sql.functions._

/** sf1-equivalent scale rehearsal (VERDICT r7 #7): run the heaviest
  * queries against SPARK_GRAFT_SF_DIR and against a synthetic
  * `mult`× corpus, and report the per-query wall-clock scaling
  * factor. A query scaling worse than ~`mult` + overhead is
  * super-linear beyond data growth and needs a named cause.
  *
  * The synthetic corpus must grow the DATA without changing the
  * problem's local structure — naive replication fails both ways:
  * identical copies make every replica of a doc a mutual near-dup
  * (pair count explodes quadratically BY CONSTRUCTION, not by scale),
  * while fresh random text changes df profiles. Instead:
  * - documents: per-replica bijective token renaming (suffix `zR` on
  *   every token). A bijection preserves every within-replica set
  *   relation exactly — shingle sizes, pairwise Jaccard, df profile —
  *   while making cross-replica similarity zero, so expected pairs,
  *   clusters, triangles all scale ×mult, linearly.
  * - embeddings: per-replica rotation of the DIMENSION order —
  *   preserves every within-replica cosine exactly, scrambles
  *   cross-replica ones.
  * Min-of-2 per (query, dir) in one JVM; the small series runs first
  * as additional JIT warmup for the big one (comparing min-of-2
  * across dirs, warmup asymmetry favors neither precisely because
  * both timings are second-run minima).
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "10").toInt
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bigDir = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      s"/graft-scale-${mult}x-v2-" +
      java.lang.Integer.toHexString(sfDir.hashCode)
    val marker = new java.io.File(bigDir, "_SCALE_OK")
    if (!marker.exists) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      (0 until mult).map { r =>
        docs.select(
          (col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", "$1z" + r).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionAll _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$bigDir/documents.parquet")
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      (0 until mult).map { r =>
        emb.select(
          (col("vec_id") + lit(r.toLong * 10000000L)).as("vec_id"),
          expr(s"transform(sequence(0, size(embedding) - 1), " +
            s"i -> embedding[(i + $r) % size(embedding)])").as("embedding"),
          col("label"))
      }.reduce(_ unionAll _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$bigDir/embeddings.parquet")
      // events (r8 VERDICT #6): replicas shifted in EVERY key space so
      // per-replica local structure survives and cross-replica matches
      // are impossible where the semantics are key/time-local —
      //  - event_id += r·40562340 (the lcm of every event_id modulus
      //    in the feed adapter and the analytics edge branches:
      //    4·3·5·7·13·17·19·23 — so UNK/blank/garbage-time fractions
      //    and per-record shapes are IDENTICAL per replica; the
      //    lat/lon lattice moduli 2341/5843 are deliberately excluded,
      //    see the storm_neighbors caveat below),
      //  - user_id += r·26,000,000 (multiple of the 4/5/10/26 user
      //    moduli → state/county/office distributions preserved;
      //    sessions, funnels, cohorts, transitions stay within
      //    replica),
      //  - ts += r·31 days (the data spans one month, so replica time
      //    windows are disjoint: as-of / nearest / trailing windows
      //    can never match across replicas).
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      (0 until mult).map { r =>
        ev.select(
          (col("event_id") + lit(r * 40562340L)).as("event_id"),
          (col("ts") + expr(s"INTERVAL ${r * 31} DAYS")).as("ts"),
          (col("user_id") + lit(r * 26000000L)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionAll _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$bigDir/events.parquet")
      // customer/orders (q_temporal, q_scd2): key-space shifts only.
      // c_custkey += r·10,000,700 — a multiple of the 97/50/10 scd2
      // branch moduli (fractions preserved) spaced beyond the +10⁶
      // NEWKEY aliasing; orders follow with matching o_custkey so
      // as-of matches stay within replica (keys disjoint across).
      val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      (0 until mult).map(r => cust
          .withColumn("c_custkey", col("c_custkey") + lit(r * 10000700L)))
        .reduce(_ unionAll _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$bigDir/customer.parquet")
      val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      (0 until mult).map(r => ord
          .withColumn("o_orderkey", col("o_orderkey") + lit(r * 100000000L))
          .withColumn("o_custkey", col("o_custkey") + lit(r * 10000700L)))
        .reduce(_ unionAll _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$bigDir/orders.parquet")
      marker.createNewFile()
    }

    val defaultNames = Seq("dedup_jaccard", "dedup_cluster", "graph_triangles",
      "graph_pagerank", "corpus_clean", "corpus_chunks", "dedup_recall",
      "dedup_semantic", "dedup_embed", "embed_kmeans", "text_tfidf",
      "text_bm25",
      // round-8 continuation additions (heaviest of the new keys)
      "sample_softdedup", "graph_clusters", "text_ccnet", "embed_pca",
      "corpus_diversity",
      // round-9: the events/analytics family (r8 VERDICT #6). Caveat
      // for storm_neighbors: the synthetic corpus puts mult× events
      // into the SAME lat/lon lattice (coordinates derive from
      // event_id mod 2341/5843 in the feed adapter — the area cannot
      // grow), so the spatial join's OUTPUT grows ~mult² by data
      // semantics, not by operator defect; judge its wall against
      // rows_10x, which the row carries.
      "q_sessionize", "q_funnel", "q_retention", "q_transitions",
      "q_asof_nearest", "q_temporal", "q_scd2", "storm_neighbors",
      // round-9 second-half keys: incremental cluster maintenance
      // (the batch-bounded pair-probe claim), MMR (pool-bounded after
      // the ANN stage), IVF-PQ (auto cells + codebook training)
      "dedup_cluster_inc", "knn_mmr", "knn_ivfpq",
      // round-10 keys: lake-indexed cluster maintenance (probe ranks
      // the fresh side only — the corpus-rank absence claim), the
      // 8-round BPE trainer (vocabulary-sized rounds), keep-one
      // dupcut (election folded into the df aggregate)
      "dedup_cluster_lake", "text_bpe_train", "text_dupcut_keepone",
      // round-12: semantic decon — the broadcast crossJoin scales with
      // n·|bench| BY DESIGN (bench grows with the corpus in this
      // synthesis: every 20th vector), so judge decon_embed against
      // rows_10x; decon_embed_ivf is the cell-bounded swap-in whose
      // wall should stay near-linear. mm_dedup decodes every PNG then
      // chunk-bands (near-dup texts are within-replica only, so pairs
      // scale ~10×); corpus_classify is 8 corpus aggregations + a
      // narrow scoring map.
      "decon_embed", "decon_embed_ivf", "mm_dedup", "corpus_classify",
      // round-13 keys: line/paragraph cleaning (explode + keep-first
      // aggregation — the hot-boilerplate claim), classifier-gated
      // corpus prep (training loop + TakeOrdered rank gate)
      "text_lines", "dedup_paragraph", "corpus_clean_ml",
      // novelty is the corpus-sized (doc_id, gram) distinct + owner
      // join; fertility replays the BPE trainer + a per-lang agg;
      // diversify is the auto-cell k-means trainer + per-cell windows
      "corpus_novelty", "text_fertility", "embed_diversify", "text_entropy")
    // args select a subset (targeted re-measurement); the committed
    // artifact always comes from a no-args full run
    val names = if (args.nonEmpty) args.toSeq else defaultNames
    def cleanBetween(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def minOf2(name: String, dir: String): (Double, Long) = {
      var rows = 0L
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        rows = SparkEntry.queries(name)(spark, dir).count()
        val s = (System.nanoTime() - t0) / 1e9
        cleanBetween()
        s
      }
      (times.min, rows)
    }
    val results = names.map { n =>
      val (t1, rows1) = minOf2(n, sfDir)
      val (tN, rowsN) = minOf2(n, bigDir)
      val line = f"""{"query":"$n","sec_base":$t1%.3f,"sec_${mult}x":$tN%.3f,""" +
        f""""factor":${tN / t1}%.2f,"rows_base":$rows1,"rows_${mult}x":$rowsN}"""
      println(s"[scale] $line")
      line
    }
    // Since round 9 the shipped graph_clusters/graph_knn/knn_ivf/
    // dedup_embed keys derive nCells from the corpus size
    // (Knn.autoCells = max(16, ceil(sqrt(n))), oracle-mirrored), so
    // the plain rows above already measure the √n scaling — the old
    // fixed-16 vs √n comparison row is retired.
    val out = results.mkString("[\n", ",\n", "\n]") + "\n"
    if (args.isEmpty) // subset runs must not overwrite the full artifact
      java.nio.file.Files.write(java.nio.file.Paths.get("scalecheck_last.json"),
        out.getBytes("UTF-8"))
    spark.stop()
  }
}
