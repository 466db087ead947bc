package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Text
import graft.sources.Tables

/** Driver-facing queries + DuckDB oracles for the LLM-data-pipeline
  * operators (SURVEY §2 #25-37) over `documents` / `embeddings`.
  *
  * Every query except knn_lsh is hash-checked against a DuckDB oracle:
  * the near-dup signatures use sha-256-prefix hashes and the IVF
  * pipeline is hashing-free, so the oracle replays candidate
  * generation exactly. knn_lsh (random-hyperplane signs from xxhash64)
  * stays rows-only, pinned by KnnSpec's recall floor instead.
  */
object PipelineQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)
  private def embs(s: SparkSession, d: String): DataFrame = Tables.embeddings(s, d)

  /** Per-dir embeddings row count, memoized — six auto-sized keys
    * (IVF family, semantic dedup, IVF-PQ) derive their cell counts
    * from it; one scan per JVM instead of one per key invocation.
    * The production analogue is reading table statistics, not
    * scanning: immutable testdata makes the memo exact here. */
  private val embCountCache = scala.collection.concurrent.TrieMap.empty[String, Long]
  private def embCount(s: SparkSession, d: String): Long =
    embCountCache.getOrElseUpdate(d, embs(s, d).count())

  private val docCountCache = scala.collection.concurrent.TrieMap.empty[String, Long]
  private def docCount(s: SparkSession, d: String): Long =
    docCountCache.getOrElseUpdate(d, docs(s, d).count())

  /** DuckDB CTEs for the BM25 integer-grid index + sparse probe, up
    * to `ranked` (query_id, doc_id, score_i, rk) — shared by
    * text_retrieval / retrieval_indexed / retrieval_pack. */
  private lazy val RETRIEVAL_CTES: String =
    s"""t AS (
       |  SELECT doc_id, unnest(str_split($NORM, ' ')) AS token FROM documents
       |), tf AS (
       |  SELECT doc_id, token, count(*) AS tf FROM t WHERE token <> '' GROUP BY 1, 2
       |), dl AS (
       |  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
       |), dfq AS (
       |  SELECT token, count(*) AS df FROM tf GROUP BY 1
       |), stats AS (
       |  SELECT (SELECT count(*) FROM documents) AS n_docs,
       |    CAST((SELECT sum(dl) FROM dl) AS DOUBLE)
       |      / CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl
       |), wts AS (
       |  SELECT tf.doc_id, tf.token,
       |    CAST(round(round(ln((CAST(stats.n_docs AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5)
       |          / (CAST(dfq.df AS DOUBLE) + 0.5) + 1.0)
       |      * (CAST(tf.tf AS DOUBLE) * 2.2)
       |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (1.0 - 0.75
       |          + 0.75 * CAST(dl.dl AS DOUBLE) / stats.avgdl)), 6) * 1000000) AS BIGINT) AS w_i
       |  FROM tf JOIN dl USING (doc_id) JOIN dfq USING (token) CROSS JOIN stats
       |), qterms AS (
       |  SELECT doc_id AS query_id, token, w_i AS qw_i,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY w_i DESC, token) AS qrk
       |  FROM wts WHERE doc_id <= 10
       |), hits AS (
       |  SELECT q.query_id, w.doc_id, CAST(sum(q.qw_i * w.w_i) AS BIGINT) AS score_i
       |  FROM wts w JOIN (SELECT * FROM qterms WHERE qrk <= 3) q USING (token)
       |  GROUP BY 1, 2
       |), ranked AS (
       |  SELECT query_id, doc_id, score_i,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score_i DESC, doc_id) AS rk
       |  FROM hits
       |)""".stripMargin

  /** DuckDB replay of the BM25 integer-grid index + sparse top-k
    * probe — shared by text_retrieval and retrieval_indexed (the
    * persisted-index variant must be oracle-identical). */
  private lazy val RETRIEVAL_SQL: String =
    s"""WITH $RETRIEVAL_CTES
       |SELECT query_id, CAST(rk AS INT) AS rk, doc_id, score_i FROM ranked
       |WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin

  /** Full BM25 inverted index on the exact 1e-6 integer grid:
    * (doc_id, token, w_i). The corpus-sized tf aggregate feeds
    * dl/df/score; one Materialize inside keeps it single-execution.
    * This is the table [[graft.sources.StormSinks.writeVersionedTable]]
    * persists for the serving tier (retrieval_indexed). */
  private[graft] def bm25WeightsOf(doc: DataFrame): DataFrame = {
    val (tf, dl) = bm25TfDl(doc)
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val stats = doc.agg(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg(sum(col("dl")).as("sum_dl")))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs").cast("double")).as("avgdl"))
    bm25WeightsFrom(tf, dl, dfreq, stats)
  }

  /** (tf, dl) of a corpus: the per-document term statistics — the
    * only parts of the BM25 index that are PER-DOC (and therefore
    * appendable); df/n_docs/avgdl are corpus-global. */
  private[graft] def bm25TfDl(doc: DataFrame): (DataFrame, DataFrame) = {
    val toks = doc.select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
      .where(col("token") =!= "")
    val tf = graft.Materialize.once(
      toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf")))
    (tf, tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")))
  }

  /** The BM25 scoring formula over EXPLICIT statistics frames — ONE
    * definition shared by the train-in-session [[bm25WeightsOf]] and
    * the frozen-stats append ([[Retrieval.appendToBm25Lake]]), so
    * "score new docs under the published statistics" is provably the
    * same arithmetic as publish-time scoring. The df join is INNER:
    * tokens absent from `dfreq` (out-of-vocabulary under a frozen
    * index) contribute no weight — the frozen-vocabulary contract. */
  private[graft] def bm25WeightsFrom(tf: DataFrame, dl: DataFrame,
      dfreq: DataFrame, stats: DataFrame): DataFrame = {
    val tfD = col("tf").cast("double")
    val dfD = col("df").cast("double")
    val idf = log((col("n_docs").cast("double") - dfD + 0.5) / (dfD + 0.5) + 1.0)
    val denom = tfD + lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * col("dl").cast("double") / col("avgdl"))
    tf.join(dl, "doc_id").join(dfreq, "token")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("token"),
        round(round(idf * (tfD * 2.2) / denom, 6) * 1e6).cast("long").as("w_i"))
  }

  /** Iterative BPE merge trainer (#89b): `rounds` deterministic merge
    * rounds over the frequency-weighted vocabulary — the actual
    * tokenizer-training loop text_bpe's one-shot pair count points at.
    * Each round counts adjacent symbol pairs across the vocabulary
    * (weighted by corpus token frequency, overlapping positions
    * included — the standard zip(word, word[1:]) count), merges the
    * best pair (max weight, ties to the lexicographically LOWEST
    * (l, r) — pinned so an independent engine lands on the same merge
    * chain), and rewrites every vocabulary word.
    *
    * Engine-replayable representation: each word's symbol sequence is
    * ONE string with every symbol INDIVIDUALLY wrapped in single
    * spaces (" a  b " = "␣a␣"+"␣b␣"), legal because whitespace
    * tokenization guarantees space-free symbols. The merge is then
    * literal `replace(w, ' l  r ', ' lr ')`: leftmost-non-overlapping
    * replacement IS greedy left-to-right BPE merging — the per-symbol
    * wrap anchors boundaries ("␣a␣" can never match inside "␣ab␣")
    * AND survives the match, so a·a·a·a merges positions 1 and 3 into
    * [aa][aa] exactly like the sequential scan (a shared two-space
    * separator would be CONSUMED by the first match and silently
    * break the chained merge — CurationSpec's overlap fixture pins
    * this), and both engines' replace share that semantic.
    *
    * Scale shape: the corpus is touched ONCE (the token frequency
    * aggregate); every round after that is vocabulary-sized — a pair
    * explode (|vocab|·avg_len rows), one partial-agg shuffle, a
    * 1-row top-k, and a broadcast-rewrite. Both the per-round best
    * row and the rewritten vocabulary are materialized (the iterative
    * trainer rule — plans stay constant-depth in rounds; the previous
    * round's blocks are freed). Output: (step, l, r, wt) — the merge
    * table, the artifact a tokenizer trainer ships. */
  private[graft] def bpeTrainOf(doc: DataFrame, rounds: Int): DataFrame = {
    val (merges, vocab) = bpeTrainCore(doc, rounds)
    graft.Materialize.free(vocab)
    merges
  }

  /** Final per-token segmentation under the trained merge chain —
    * the APPLY half of the trainer (`text_bpe_apply` builds on it):
    * (token, sy = the token's symbols after all `rounds` merges).
    * Vocabulary-sized: the corpus is never touched beyond the
    * trainer's one frequency aggregate. */
  private[graft] def bpeSegmentsOf(doc: DataFrame, rounds: Int): DataFrame = {
    val (_, vocab) = bpeTrainCore(doc, rounds)
    vocab.select(col("token"),
      expr("filter(split(trim(w), '  '), x -> x <> '')").as("sy"))
  }

  /** BOTH trainer artifacts from one training run — the merge table
    * ([[bpeTrainOf]]'s shape) and the per-token segmentation
    * ([[bpeSegmentsOf]]'s shape) — for the publish-once tokenizer
    * lake ([[Pretrain.publishTokenizerLake]]): a tokenizer ships as
    * merges (the replayable training log) plus the materialized
    * vocabulary segmentation (the serving table), and publishing them
    * from ONE run keeps them mutually consistent by construction. */
  private[graft] def bpeArtifacts(doc: DataFrame,
      rounds: Int): (DataFrame, DataFrame) = {
    val (merges, vocab) = bpeTrainCore(doc, rounds)
    (merges, vocab.select(col("token"),
      expr("filter(split(trim(w), '  '), x -> x <> '')").as("sy")))
  }

  private def bpeTrainCore(doc: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    val toks = doc.select(explode(Text.tokens(col("text"))).as("token"))
      .where(col("token") =!= "")
    val freq = toks.groupBy(col("token")).agg(count(lit(1)).as("f"))
    var vocab = graft.Materialize.once(freq.select(col("token"), col("f"),
      array_join(expr(
        "transform(sequence(1, length(token)), " +
          "i -> concat(' ', substring(token, i, 1), ' '))"), "").as("w")))
    val merges = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var r = 1
    while (r <= rounds) {
      val sy = vocab.select(col("f"),
        expr("filter(split(trim(w), '  '), x -> x <> '')").as("sy"))
        .where(size(col("sy")) >= 2)
      val pw = sy.select(col("f"), explode(expr(
          "transform(sequence(1, size(sy) - 1), " +
            "i -> struct(element_at(sy, i) AS l, element_at(sy, i + 1) AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("f")).as("wt"))
      val best = graft.Materialize.once(
        pw.orderBy(col("wt").desc, col("l"), col("r")).limit(1)
          .select(lit(r).as("step"), col("l"), col("r"), col("wt")))
      merges += best
      // LEFT join (not crossJoin): when the corpus runs out of pairs
      // the best row is EMPTY, and the vocabulary must pass through
      // unchanged — a cross join would silently empty it, which the
      // segments consumer (bpeSegmentsOf) cannot tolerate
      val next = graft.Materialize.once(
        vocab.join(broadcast(best.select(col("l"), col("r"))), lit(true), "left")
          .select(col("token"), col("f"),
            when(col("l").isNull, col("w")).otherwise(expr(
              "replace(w, concat(' ', l, '  ', r, ' '), " +
                "concat(' ', l, r, ' '))")).as("w")))
      graft.Materialize.free(vocab)
      vocab = next
      r += 1
    }
    (merges.reduce(_ unionByName _), vocab)
  }

  /** Keep-one exact-substring removal (#94b): each cross-document-
    * duplicated 8-token window's content survives in exactly ONE
    * deterministically elected occurrence — the global min
    * (doc_id, p), an argmin the window-df aggregate already pays
    * for — and is cut everywhere else. Election beats cut on
    * overlap: a token covered by a canonical occurrence is KEPT even
    * when another duplicated window also covers it, so the elected
    * copy survives intact instead of being shredded by overlapping
    * non-canonical windows (CurationSpec pins both properties).
    * Scale shape = #94's: instance ngrams, one vocabulary-sized df +
    * election aggregate, per-doc marks as two position lists, the
    * edit a narrow HOF map with zero extra shuffle. */
  private[graft] def dupcutKeepOneOf(doc: DataFrame): DataFrame = {
    val tokd = doc
      .select(col("doc_id"), Text.tokensOrEmpty(col("text")).as("tk"))
    val inst = tokd.select(col("doc_id"),
      posexplode(Text.ngramsOf(col("tk"), 8)))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("w"))
    val stats = inst.groupBy(col("w")).agg(
      countDistinct(col("doc_id")).as("nd"),
      min(struct(col("doc_id"), col("p"))).as("canon"))
    val dupInst = inst.join(stats.where(col("nd") >= 2), "w")
    val isCanon = col("canon.doc_id") === col("doc_id") &&
      col("canon.p") === col("p")
    val marks = dupInst.groupBy(col("doc_id")).agg(
      sort_array(collect_set(when(isCanon, col("p")))).as("kps"),
      sort_array(collect_set(when(!isCanon, col("p")))).as("cps"))
    val joined = tokd.join(marks, Seq("doc_id"), "left")
      .select(col("doc_id"), col("tk"),
        coalesce(col("kps"), array().cast("array<int>")).as("kps"),
        coalesce(col("cps"), array().cast("array<int>")).as("cps"))
    val staged = joined.select(col("doc_id"), col("tk"),
      filter(col("tk"), (_, i0) =>
        exists(col("kps"), q => q <= i0 + 1 && i0 + 1 <= q + 7) ||
          !exists(col("cps"), q => q <= i0 + 1 && i0 + 1 <= q + 7)).as("kept"))
    staged.select(col("doc_id"),
      size(col("tk")).cast("long").as("n_tokens"),
      (size(col("tk")) - size(col("kept"))).cast("long").as("n_cut"),
      sha2(array_join(col("kept"), " "), 256).as("kept_sha"))
  }

  /** The sparse-retrieval serving probe over a BM25 weight index
    * ([[bm25WeightsOf]] or its lake re-read): 10 deterministic query
    * vectors (docs ≤ 10's top-3 terms, from the index itself) retrieve
    * top-3 docs by order-free BIGINT dot product; the index never
    * reshuffles (query side broadcast). */
  private[graft] def sparseTopK(weights: DataFrame, k: Int = 3): DataFrame = {
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("w_i").desc, col("token"))
    val qterms = weights.where(col("doc_id") <= 10)
      .withColumn("qrk", row_number().over(wq)).where(col("qrk") <= 3)
      .select(col("doc_id").as("query_id"), col("token"), col("w_i").as("qw_i"))
    val hits = weights.join(broadcast(qterms), "token")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("qw_i") * col("w_i")).as("score_i"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score_i").desc, col("doc_id"))
    hits.withColumn("rk", row_number().over(wr)).where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("doc_id"), col("score_i"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Winnowing fingerprint selection (#96): (doc_id, pos, fp) of the
    * selected 4-gram hashes under a w=4 window — see the `text_winnow`
    * entry's commentary for the packing/tiebreak argument. Shared by
    * text_winnow (the selection itself) and winnow_pairs (the
    * detection join over the selected index). */
  private[graft] def winnowFingerprints(doc: DataFrame): DataFrame = {
    val P = 1048576L
    val grams = doc
      .select(col("doc_id"),
        posexplode(Text.ngramsOf(Text.tokens(col("text")), 4)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        conv(substring(sha2(col("col"), 256), 1, 10), 16, 10)
          .cast("long").as("h"))
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos")).rowsBetween(0, 3)
    grams
      .select(col("doc_id"),
        min(col("h") * P + (lit(P - 1) - col("pos"))).over(wf).as("key"))
      .distinct()
      .select(col("doc_id"),
        (lit(P - 1) - col("key") % P).as("pos"),
        expr(s"key div $P").as("fp"))
  }

  /** #100's ranked same-cell top-3 neighbor set (vec_id, rk, nb_id,
    * cos), no output ordering — shared by graph_knn and the
    * graph_clusters mutual-edge symmetrization.
    *
    * nCells is THE scale dial (same-cell pair work = n²/nCells, so at
    * a fixed cell count the join is quadratic in corpus size — SURVEY
    * §5's nCells ≈ √n rule): the shipped queries derive it from the
    * corpus size via [[Knn.autoCells]] (max(16, ⌈√n⌉)) and the DuckDB
    * oracle replays the same formula from count(*), so the cell
    * assignment stays exact at every SF. ScaleCheck measured the fix:
    * graph_clusters 4.3× wall at 10× data with fixed 16 cells vs
    * ~2.8× at √n (SCALECHECK.md). `nCells <= 0` → auto. */
  private[graft] def knnTop3(s: SparkSession, d: String,
      nCells: Int = 0): DataFrame = {
    val nc = if (nCells > 0) nCells else Knn.autoCells(embCount(s, d))
    val assigned = graft.Materialize.once(
      Knn.ivfAssign(embs(s, d), Knn.ivfCentroids(embs(s, d), nc)))
    val nb = assigned.select(col("cell_id"), col("vec_id").as("nb_id"),
      col("embedding").as("nb_emb"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos").desc, col("nb_id"))
    assigned.join(nb, "cell_id")
      .where(col("vec_id") =!= col("nb_id"))
      .select(col("vec_id"), col("nb_id"),
        round(Knn.cosine(col("embedding"), col("nb_emb")), 6).as("cos"))
      .withColumn("rk", row_number().over(wr)).where(col("rk") <= 3)
      .select(col("vec_id"), col("rk"), col("nb_id"), col("cos"))
  }

  /** #102's full pipeline (mutual-kNN edges → min-label components)
    * with the cell-count dial exposed for scale rehearsal. */
  private[graft] def semanticClusters(s: SparkSession, d: String,
      nCells: Int = 0): DataFrame = {
    // materialized ONCE: the kNN edge list feeds BOTH intersect
    // branches (itself and its mirror) — un-truncated, the whole IVF
    // build + probe re-ran per branch (r18-opt)
    val rr = graft.Materialize.once(knnTop3(s, d, nCells)
      .select(col("vec_id").as("doc_a"), col("nb_id").as("doc_b")))
    val mutual = rr.intersect(
        rr.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .where(col("doc_a") < col("doc_b"))
    val labels = Dedup.clusters(mutual)
    embs(s, d).select(col("vec_id"))
      .join(labels.select(col("doc_id").as("vec_id"), col("cluster_id")),
        Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"))
      .orderBy(col("vec_id"))
  }

  /** Bigram-LM fluency scores (#62): train add-one-smoothed bigram
    * stats on the corpus itself, score each doc by mean log P(w2|w1).
    * Counts are vocabulary-sized aggregates; the per-doc mean goes
    * through exact decimal summation (order-independent), so the
    * oracle replays it despite double logs. Shared by text_lmscore
    * (the scores themselves) and text_ccnet (the bucketing on top). */
  private[graft] def lmScores(doc: DataFrame): DataFrame = {
    // token array staged as an attribute ref BEFORE bigramsOf: a
    // lambda body re-evaluates non-lambda subexpressions per element,
    // so composing bigramsOf(tokens(text)) directly re-tokenizes the
    // whole document once per bigram (measured 23s -> ~2s at sf0.1)
    val tokd = doc.select(col("doc_id"), Text.tokens(col("text")).as("tk"))
    // bigram instances feed BOTH the c2 aggregate and the scoring
    // join — materialize once (exchange reuse doesn't fire across
    // the branches; instance-level, so corpus-sized: set
    // spark.graft.materialize=reliable at 100 TB)
    val bgInst = graft.Materialize.once(tokd.select(col("doc_id"),
        explode(Text.bigramsOf(col("tk"))).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0)))
    val uni = tokd.select(explode(col("tk")).as("token"))
      .where(col("token") =!= "")
    // c1 has exactly one row per distinct token, so the vocabulary
    // size is count(c1) — deriving it there saves the second full
    // tokenize+explode pass the countDistinct scan used to make
    val c1 = graft.Materialize.once(
      uni.groupBy(col("token")).agg(count(lit(1)).as("c1")))
    val vocab = broadcast(c1.agg(count(lit(1)).as("v")))
    val c2 = bgInst.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    val terms = bgInst
      .join(c2, "bg")
      .join(c1.withColumnRenamed("token", "w1"), "w1")
      .crossJoin(vocab)
      .select(col("doc_id"),
        log((col("c2") + lit(1L)).cast("double") /
            (col("c1") + col("v")).cast("double"))
          .cast(DecimalType(28, 12)).as("lp"))
    terms.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("avg_logprob"))
  }

  /** The #51 offset-quota pack table over the corpus chunk stream —
    * (shard, pack_id, n_chunks, pack_tokens) at budget 256 / 16
    * shards: ONE definition of the pack-assignment rule, shared by
    * chunk_pack and the pack_stats rollup (its fill formula divides
    * by the same 256 budget). */
  private def packTable(s: SparkSession, d: String): DataFrame = {
    val chunks = Text.chunk(docs(s, d).select(col("doc_id"), col("text")),
      col("text"), chunkSize = 64, overlap = 16)
    Text.packChunks(chunks, budget = 256, nShards = 16)
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).cast("long").as("pack_tokens"))
  }

  /** The pretrain flagship's shared input — documents UNION the
    * planted fixture rows, plus the raw %20==7 benchmark slice: ONE
    * construction for the four pretrain keys, mirroring PRETRAIN_RAW's
    * psrc/bench verbatim (a fixture or convention change edits exactly
    * one Spark site and one oracle site). */
  private def pretrainSrcBench(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val doc = docs(s, d)
    val planted = s.createDataFrame(
      java.util.Arrays.asList(pretrainPlanted.map { case (id, t, lg) =>
        org.apache.spark.sql.Row(id, t, lg) }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType, nullable = false))))
    (doc.select(col("doc_id"), col("text"), col("lang")).unionByName(planted),
      doc.where(col("doc_id") % 20 === 7).select(col("doc_id"), col("text")))
  }

  /** The fused RRF ranking hybrid_rerank serves — dense cosine top-20
    * + sparse BM25 top-20, reciprocal-rank-fused on the exact integer
    * grid, top-5 per query: (query_id, rk, doc_id, rrf_i). ONE
    * definition shared by the serving key and the
    * retrieval_eval_hybrid audit, so the audited ranking can never
    * drift from the served one. */
  private def hybridRrfOf(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    val dense = Knn.cosineTopK(e, e.where(col("vec_id") < 10), k = 20)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rk").as("rk_d"))
    val doc = docs(s, d)
    // The sparse side IS the published BM25 grid: one definition
    // (bm25TfDl + bm25WeightsFrom via bm25WeightsOf) shared with
    // text_retrieval / publishBm25Lake, materialized here because the
    // hybrid reads it twice (query-term top-3 AND the posting scan).
    val weights = graft.Materialize.once(bm25WeightsOf(doc))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("w_i").desc, col("token"))
    val qterms = weights.where(col("doc_id") < 10)
      .withColumn("qrk", row_number().over(wq)).where(col("qrk") <= 3)
      .select(col("doc_id").as("query_id"), col("token"), col("w_i").as("qw_i"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score_i").desc, col("doc_id"))
    val sparse = weights.join(broadcast(qterms), "token")
      .where(col("doc_id") =!= col("query_id")) // match the dense self-exclusion
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("qw_i") * col("w_i")).as("score_i"))
      .withColumn("rk_s", row_number().over(wr)).where(col("rk_s") <= 20)
      .select(col("query_id"), col("doc_id"), col("rk_s"))
    val fused = dense.join(sparse, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(expr("CAST(1000000000 AS BIGINT) div (60 + rk_d)"), lit(0L)) +
         coalesce(expr("CAST(1000000000 AS BIGINT) div (60 + rk_s)"), lit(0L))).as("rrf_i"))
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rrf_i").desc, col("doc_id"))
    fused.withColumn("rk", row_number().over(wf)).where(col("rk") <= 5)
      .select(col("query_id"), col("rk"), col("doc_id"), col("rrf_i"))
  }

  /** The one-row recall report every index audit emits — (n_true,
    * n_found, n_missed, recall basis points), all exact integers —
    * over (doc_a, doc_b) pair frames. ONE definition for the MinHash
    * (dedup_recall), SimHash (simhash_recall) and perceptual aHash
    * (mm_recall) audits; [[recallReportSql]] is its oracle twin. */
  private def recallReport(exact0: DataFrame, found0: DataFrame): DataFrame = {
    // materialized ONCE: both pair frames feed their count aggregate
    // AND the missed anti-join — un-truncated, the TRUTH side (the
    // audit's brute-force quadratic verify) executed twice per report
    // (r18-opt). Pair-list-sized frames.
    val exact = graft.Materialize.once(exact0)
    val found = graft.Materialize.once(found0)
    val t = exact.agg(count(lit(1)).as("n_true"))
    val f = found.agg(count(lit(1)).as("n_found"))
    val m = exact.join(found, Seq("doc_a", "doc_b"), "left_anti")
      .agg(count(lit(1)).as("n_missed"))
    t.crossJoin(f).crossJoin(m)
      .select(col("n_true"), col("n_found"), col("n_missed"),
        expr("CASE WHEN n_true = 0 THEN CAST(10000 AS BIGINT) " +
          "ELSE (10000 * (n_true - n_missed)) div n_true END").as("recall_bp"))
  }

  /** [[recallReport]]'s DuckDB twin: the report tail over two named
    * pair CTEs with (doc_a, doc_b) columns. */
  private def recallReportSql(t: String, f: String): String =
    s"""tr AS (SELECT count(*) AS n_true FROM $t),
       |fo AS (SELECT count(*) AS n_found FROM $f),
       |mi AS (
       |  SELECT count(*) AS n_missed FROM $t
       |  WHERE NOT EXISTS (SELECT 1 FROM $f
       |    WHERE $f.doc_a = $t.doc_a AND $f.doc_b = $t.doc_b)
       |)
       |SELECT n_true, n_found, n_missed,
       |  CASE WHEN n_true = 0 THEN CAST(10000 AS BIGINT)
       |    ELSE CAST((10000 * (n_true - n_missed)) // n_true AS BIGINT) END AS recall_bp
       |FROM tr, fo, mi""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 25: exact dedup over a replayed (doubled) corpus
    "dedup_exact" -> ((s, d) => {
      val doc = docs(s, d)
      Dedup.exactGroups(doc.unionAll(doc.withColumn("doc_id", col("doc_id") + 1000000)))
        .select(col("fp"), col("n_copies"), col("canonical_id"))
        .orderBy(col("canonical_id"))
    }),
    // 26: MinHash-LSH near-dup pairs (rows-only; spec-pinned)
    "dedup_minhash" -> ((s, d) =>
      Dedup.minhashPairs(docs(s, d), k = 3, bands = 8, rowsPerBand = 4, threshold = 0.2)
        .orderBy(col("doc_a"), col("doc_b"))),
    // 90: incremental-ingest dedup — the daily-ingest shape: a new
    // batch (fresh docs 451..500 + 50 exact re-ingests of docs 1..50)
    // is classified against the EXISTING corpus (docs 1..450) without
    // ever generating a corpus-corpus pair: exact re-ingests by
    // fingerprint semi-join, near-dups by the asymmetric band join
    // (Dedup.minhashPairsAgainst). Per batch doc: (dup_exact,
    // dup_near, kept). At scale the corpus band table is a persistent
    // index and only the batch side is computed per run.
    "dedup_incremental" -> ((s, d) => {
      val doc = docs(s, d).select(col("doc_id"), col("text"))
      val corpus = doc.where(col("doc_id") <= 450)
      val batch = doc.where(col("doc_id") > 450)
        .unionAll(doc.where(col("doc_id") <= 50)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val near = Dedup.minhashPairsAgainst(corpus, batch, k = 3, bands = 8,
        rowsPerBand = 4, threshold = 0.2)
        .select(col("doc_new").as("doc_id")).distinct()
        .withColumn("dn", lit(true))
      val fpOld = corpus.select(Text.fingerprint(col("text")).as("fp")).distinct()
      val exact = batch.select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
        .join(fpOld, Seq("fp"), "left_semi")
        .select(col("doc_id")).withColumn("de", lit(true))
      batch.select(col("doc_id"))
        .join(exact, Seq("doc_id"), "left")
        .join(near, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("de"), lit(false)).as("dup_exact"),
          coalesce(col("dn"), lit(false)).as("dup_near"))
        .withColumn("kept", !col("dup_exact") && !col("dup_near"))
        .orderBy(col("doc_id"))
    }),
    // 25b: Bloom membership prefilter — the zero-shuffle fast path in
    // front of #90's exact-fingerprint join: the corpus folds to ONE
    // 128 KiB bitmap (native BloomAgg — constant-size mergeable
    // state) that broadcasts to the batch probe, so classifying an
    // ingest batch costs one batch scan and NO corpus-side work at
    // probe time. Same fixture as dedup_incremental: the 50 exact
    // re-ingests must read maybe_dup=true (no false negatives,
    // by construction); positions are sha-derived so the oracle
    // replays membership — including any false positive — exactly.
    "dedup_bloom" -> ((s, d) => {
      val doc = docs(s, d).select(col("doc_id"), col("text"))
      val corpus = doc.where(col("doc_id") <= 450)
      val batch = doc.where(col("doc_id") > 450)
        .unionAll(doc.where(col("doc_id") <= 50)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.bloomProbe(Dedup.bloomIndex(corpus), batch)
        .orderBy(col("doc_id"))
    }),
    // 25c: the published form — the bitmap written once to a
    // versioned graftlake table at corpus-publish time and probed
    // from a fresh columnar read (the #95/#95b/#119b build-once/
    // serve-many shape, now for the membership prefilter). Shares
    // dedup_bloom's oracle verbatim: the lake round-trip must be
    // invisible to the classification.
    "dedup_bloom_indexed" -> ((s, d) => {
      val doc = docs(s, d).select(col("doc_id"), col("text"))
      val lake = java.nio.file.Files
        .createTempDirectory("graft-bloom-lake").toString
      Dedup.publishBloomLake(doc.where(col("doc_id") <= 450), lake)
      val batch = doc.where(col("doc_id") > 450)
        .unionAll(doc.where(col("doc_id") <= 50)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.bloomProbeLake(s, lake, batch).orderBy(col("doc_id"))
    }),
    // 95: persisted-dedup-index probe — #90's corpus index PUBLISHED
    // to a versioned graftlake table and read back through the DSv2
    // source before probing (a fresh columnar scan, not the
    // in-session frame): build once / probe per ingest, proven
    // oracle-identical to the in-session asymmetric join. At 100 TB
    // this is THE ingest shape — the corpus-sized signature job runs
    // at publish time only, and each daily batch probes the lake
    // index (GraftLakeSpec additionally proves a fresh read of the
    // published version is row-identical and survives republish).
    "dedup_indexed" -> ((s, d) => {
      val doc = docs(s, d).select(col("doc_id"), col("text"))
      val lake = java.nio.file.Files
        .createTempDirectory("graft-minhash-lake").toString
      graft.sources.StormSinks.writeVersionedTable(
        Dedup.minhashIndex(doc.where(col("doc_id") <= 450)), lake)
      val idx = s.read.format("graftlake").load(lake)
      Dedup.minhashPairsBetweenIndexes(idx,
          Dedup.minhashIndex(doc.where(col("doc_id") > 450)), threshold = 0.2)
        .orderBy(col("doc_new"), col("doc_old"))
    }),
    // 91: dedup-index quality audit — recall of the MinHash-LSH index
    // against exact ground truth at the same threshold (jaccardPairs
    // is lossless for J >= t, so it IS the truth set; minhash verify
    // recomputes exact jaccard on candidates, so found ⊆ true and the
    // only question is recall). The one-row report (n_true, n_found,
    // n_missed, recall basis points — all exact integers) is what a
    // production dedup pipeline monitors to tune bands×rows. Scale:
    // both pair sets are the operators' own bounded shapes; the audit
    // adds one anti-join + three scalar aggregates.
    "dedup_recall" -> ((s, d) => {
      val doc = docs(s, d)
      val exact = graft.Materialize.once(
        Dedup.jaccardPairs(doc, k = 3, threshold = 0.5)
          .select(col("doc_a"), col("doc_b")))
      val found = graft.Materialize.once(
        Dedup.minhashPairs(doc, k = 3, bands = 8, rowsPerBand = 4, threshold = 0.5)
          .select(col("doc_a"), col("doc_b")))
      recallReport(exact, found)
    }),
    // 27b: recall audit for the CAPPED SimHash index — truth is the
    // brute-force hamming join over the same sha-derived signatures
    // (test-scale only, by construction: the audit is the measurement
    // tool that justifies trusting the banded path at corpus scale).
    // The pigeonhole is lossless below the occupancy cap, so any
    // missed pair is a cap drop — this key turns the caps' "a pair
    // survives if ANY chunk is below-cap" recall contract from a
    // spec-level argument into a driver-measured number.
    "simhash_recall" -> ((s, d) => {
      val doc = docs(s, d)
      val sims = graft.Materialize.once(doc.select(col("doc_id"),
        Dedup.simhash64Sha(col("text")).as("sim")))
      val exact = graft.Materialize.once(
        sims.select(col("doc_id").as("doc_a"), col("sim").as("sim_a"))
          .crossJoin(sims.select(col("doc_id").as("doc_b"), col("sim").as("sim_b")))
          .where(col("doc_a") < col("doc_b") &&
            bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) <= 3)
          .select(col("doc_a"), col("doc_b")))
      val found = graft.Materialize.once(
        Dedup.simhashPairs(doc, maxHamming = 3)
          .select(col("doc_a"), col("doc_b")))
      recallReport(exact, found)
    }),
    // 93: asymmetric containment pairs (quote/inclusion detection) —
    // directed "A mostly inside B" at C >= 0.6; the case Jaccard
    // misses when the container is much larger
    "text_containment" -> ((s, d) =>
      Dedup.containmentPairs(docs(s, d), k = 3, threshold = 0.6)
        .orderBy(col("doc_a"), col("doc_b"))),
    // 27: SimHash near-dup pairs. maxHamming=3 -> 16-bit pigeonhole
    // chunks (65,536 buckets/chunk — scale-safe; see Dedup.simhashPairs)
    "dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(docs(s, d), maxHamming = 3)
        .orderBy(col("doc_a"), col("doc_b"))),
    // 28: exact n-gram Jaccard similarity join (prefix-filtered;
    // trigram shingles keep document frequencies low -> small Σdf²)
    "dedup_jaccard" -> ((s, d) =>
      Dedup.jaccardPairs(docs(s, d), k = 3, threshold = 0.5)
        .orderBy(col("doc_a"), col("doc_b"))),
    // 38: pairwise near-dups -> dedup groups (connected components,
    // min-label propagation; oracle = recursive-CTE transitive closure)
    "dedup_cluster" -> ((s, d) =>
      Dedup.clusters(Dedup.jaccardPairs(docs(s, d), k = 3, threshold = 0.5))
        .orderBy(col("doc_id"))),
    // 38b: keep-BEST cluster representative — min-id canonicalization
    // is arrival order, not merit; this elects the longest-content
    // member per cluster (tie → min doc_id: a total order). Map-side
    // max(struct) partial agg, one candidate per (partition, cluster)
    // on the shuffle — never a whole-group window sort.
    "dedup_keep_best" -> ((s, d) => {
      val doc = docs(s, d)
      Dedup.keepBest(
          Dedup.clusters(Dedup.jaccardPairs(doc, k = 3, threshold = 0.5)), doc)
        .orderBy(col("cluster_id"))
    }),
    // 25d: dedup-method agreement audit — the flag-set overlap matrix
    // across the four text dedup families (exact fingerprint, capped
    // MinHash-LSH @0.2, capped SimHash ≤3, prefix-filtered Jaccard
    // @0.5): per method pair, how many docs BOTH flag (diagonal =
    // per-method totals). The number a dedup-stack decision is made
    // with — "what does simhash catch that minhash misses" — which no
    // single method's oracle can see. A 25-doc shifted-copy slice
    // makes the exact branch hot without degenerating the near-dup
    // sets. Each method's member set is its existing serving operator
    // (oracles share SH3/SIMHASH_CTES replays); the matrix is one
    // materialized tagged union self-joined on doc_id.
    "dedup_overlap" -> ((s, d) => {
      val doc = docs(s, d).select(col("doc_id"), col("text"))
      val src = doc.unionAll(doc.where(col("doc_id") <= 25)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val fp = src.select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      val dupFp = fp.groupBy(col("fp")).agg(count(lit(1)).as("nc"))
        .where(col("nc") >= 2).select(col("fp"))
      val exact = fp.join(dupFp, Seq("fp"), "left_semi").select(col("doc_id"))
      def members(pairs: org.apache.spark.sql.DataFrame) =
        pairs.select(col("doc_a").as("doc_id"))
          .unionAll(pairs.select(col("doc_b").as("doc_id"))).distinct()
      val tagged = graft.Materialize.once(
        exact.select(lit("exact").as("m"), col("doc_id"))
          .unionAll(members(Dedup.minhashPairs(src, k = 3, bands = 8,
            rowsPerBand = 4, threshold = 0.2))
            .select(lit("minhash").as("m"), col("doc_id")))
          .unionAll(members(Dedup.simhashPairs(src, maxHamming = 3))
            .select(lit("simhash").as("m"), col("doc_id")))
          .unionAll(members(Dedup.jaccardPairs(src, k = 3, threshold = 0.5))
            .select(lit("jaccard").as("m"), col("doc_id"))))
      tagged.as("a")
        .join(tagged.as("b"),
          col("a.doc_id") === col("b.doc_id") && col("a.m") <= col("b.m"))
        .groupBy(col("a.m").as("method_a"), col("b.m").as("method_b"))
        .agg(count(lit(1)).as("n_both"))
        .orderBy(col("method_a"), col("method_b"))
    }),
    // 79: triangle enumeration over the near-dup graph (graph motif
    // counting): triples of mutually-similar documents — the signal
    // that separates pairwise noise from genuinely replicated content.
    // Ordered-edge form (a<b<c by construction) counts each triangle
    // once and bounds join work by degree, the standard scalable shape.
    // The edge list is materialized ONCE before the three-way self-join:
    // each alias of the raw plan would re-execute the corpus-scale
    // prefix-filter + verify similarity join (~3x measured), while the
    // edge list itself is tiny next to the corpus scan.
    "graph_triangles" -> ((s, d) => {
      val e = graft.Materialize.once(
        Dedup.jaccardPairs(docs(s, d), k = 3, threshold = 0.5)
          .select(col("doc_a").as("a"), col("doc_b").as("b")))
      e.as("e1")
        .join(e.as("e2"), col("e1.b") === col("e2.a"))
        .join(e.as("e3"), col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
        .select(col("e1.a").as("doc_a"), col("e1.b").as("doc_b"),
          col("e2.b").as("doc_c"))
        .orderBy(col("doc_a"), col("doc_b"), col("doc_c"))
    }),
    // 83: audio modality — deterministic PCM clips (text bytes →
    // int16 samples) through a REAL WAV container round-trip, then
    // signal-level quality features (energy, zero-crossing rate,
    // peak): the audio leg of the multimodal surface. Features are
    // exact integer sums over decoded samples — the oracle replays
    // them from the same bytes; the container itself is spec-pinned
    // against the JDK's javax.sound reader.
    "mm_audio" -> ((s, d) =>
      Audio.extractFeatures(Audio.audioFromDocuments(docs(s, d))).toDF()
        .orderBy(col("media_id"))),
    // 81: deterministic integer PageRank over the same near-dup graph —
    // similarity-graph centrality as the canonical-copy signal (hub
    // docs rank high, satellites low). Integer mass arithmetic makes
    // the full 3-round training loop engine-exact; the oracle replays
    // it (the k-means trick applied to graph iteration).
    "graph_pagerank" -> ((s, d) =>
      Graph.pagerankInt(Dedup.jaccardPairs(docs(s, d), k = 3, threshold = 0.5),
          iters = 3)
        .orderBy(col("doc_id"))),
    // 123: incremental cluster maintenance — the per-ingest
    // complement of dedup_cluster: the first 70% of docs play the
    // published corpus (labels from the normal batch CC), the rest
    // arrive as a batch; only batch-touching pairs are generated,
    // corpus endpoints contract to their published labels, CC runs on
    // the batch-sized quotient graph, and labels remap. The ORACLE
    // recomputes connected components over the FULL union from
    // scratch — the hash verifies the incremental ALGEBRA (quotient
    // CC + min-label composition == full recompute), not a replay.
    "dedup_cluster_inc" -> ((s, d) => {
      val doc = docs(s, d)
      val cut = math.floor(docCount(s, d) * 0.7).toLong
      val corpus = doc.where(col("doc_id") < cut)
      val labels = Dedup.clusters(Dedup.jaccardPairs(corpus, k = 3, threshold = 0.5))
      Dedup.incrementalClusters(corpus, labels,
          doc.where(col("doc_id") >= cut), k = 3, threshold = 0.5)
        .orderBy(col("doc_id"))
    }),
    // 123b: LAKE-INDEXED incremental cluster maintenance — the
    // 100 TB deployment shape of dedup_cluster_inc: the corpus-sized
    // posting/df rank runs once at publish time (publishJaccardLake's
    // atomic dfs/prefix/sets group), and the per-ingest probe ranks
    // only the fresh docs under the index's frozen shingle order.
    // Exercises the full maintenance chain: full CC on the indexed
    // 60%, an in-session incremental merge of the next 10% (docs
    // ingested since publish), then the LAKE probe merges the final
    // 30% — and the ORACLE still recomputes connected components over
    // the full union from scratch, so the hash proves frozen-order
    // prefix probing + quotient composition == ground truth.
    "dedup_cluster_lake" -> ((s, d) => {
      val doc = docs(s, d)
      val n = docCount(s, d)
      val cut1 = math.floor(n * 0.6).toLong
      val cut2 = math.floor(n * 0.7).toLong
      val indexed = doc.where(col("doc_id") < cut1)
      val prior = doc.where(col("doc_id") >= cut1 && col("doc_id") < cut2)
      val lake = java.nio.file.Files
        .createTempDirectory("graft-jaccard-lake").toString
      // ONE corpus-sized rank total: the index publish owns it, and
      // the seed CC derives its pairs FROM the published index
      // (jaccardPairsLake) instead of ranking the corpus again
      Dedup.publishJaccardLake(indexed, lake, k = 3, threshold = 0.5)
      val labels0 = Dedup.clusters(Dedup.jaccardPairsLake(s, lake, threshold = 0.5))
      // the maintained label table feeds three consumer branches of
      // the next merge (contraction a/b + corpus remap) — materialize
      val labels1 = graft.Materialize.once(
        Dedup.incrementalClustersLake(s, lake, labels0, doc.where(lit(false)),
          prior, k = 3, threshold = 0.5))
      Dedup.incrementalClustersLake(s, lake, labels1, prior,
          doc.where(col("doc_id") >= cut2), k = 3, threshold = 0.5)
        .orderBy(col("doc_id"))
    }),
    // 125: corpus drift detection — Population Stability Index between
    // the published corpus (first 70% of doc_ids, the
    // dedup_cluster_inc convention) and the newly-ingested rest, per
    // feature (lang, source, length buckets): the data-ops gate a
    // continuously-ingesting pipeline runs before letting a batch
    // shift the training mixture. PSI = Σ (p−q)·ln(p/q) with +1
    // smoothing over the union bucket domain; the ratio inside ln is
    // ONE division of exact integer products, ln/differences round to
    // the 1e-6 grid (the sample_importance convention), terms ride
    // BIGINTs — engine-replayable. Scale: two partial-agg shuffles
    // over (feature, bucket) — corpus-linear, output is bucket-sized.
    "corpus_drift" -> ((s, d) => {
      val doc = docs(s, d)
      val cut = math.floor(docCount(s, d) * 0.7).toLong
      // one scan: featureRows keeps doc_id so ref/cur split stays a
      // per-row flag, and the pair counts come from one aggregation
      val counts = Drift.featureRows(doc)
        .withColumn("is_ref", col("doc_id") < cut)
        .groupBy(col("feature"), col("bucket"))
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("ref_n"),
          sum(when(!col("is_ref"), 1L).otherwise(0L)).as("cur_n"))
      Drift.psiTerms(counts).orderBy(col("feature"), col("bucket"))
    }),
    // 124: leakage-free train/val/test split — the split assignment a
    // training pipeline must make CLUSTER-aware: hashing doc_ids
    // independently puts near-duplicates of training docs into the
    // test split (the classic contamination-through-near-dup leak).
    // Here the md5 lattice hashes the near-dup CLUSTER id (90/5/5),
    // so a whole cluster always lands in one split. Deterministic,
    // engine-replayable (the sample_* md5 convention on the
    // dedup_cluster closure); no shuffle beyond the clustering.
    "corpus_split" -> ((s, d) => {
      val doc = docs(s, d)
      val labels = Dedup.clusters(Dedup.jaccardPairs(doc, k = 3, threshold = 0.5))
      val lab = doc.select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      val b = Sampling.hashBucket(col("cluster_id"), "split")
      lab.withColumn("split",
          when(b < 900000, "train").when(b < 950000, "val").otherwise("test"))
        .orderBy(col("doc_id"))
    }),
    // 39: the composed training-data pipeline — quality gate + near-dup
    // cluster dedup (keep each cluster's canonical min-id member):
    // what a corpus-prep job actually runs, end to end
    "corpus_clean" -> ((s, d) => {
      val doc = docs(s, d)
      val clu = Dedup.clusters(Dedup.jaccardPairs(doc, k = 3, threshold = 0.5))
      doc.select(col("doc_id"), Text.qualityScore(col("text")).as("quality"))
        .join(clu, Seq("doc_id"), "left")
        .where(col("quality") >= 0.5 &&
          (col("cluster_id").isNull || col("cluster_id") === col("doc_id")))
        .select(col("doc_id"), col("quality"))
        .orderBy(col("doc_id"))
    }),
    // 129: classifier-gated corpus prep — corpus_clean with the static
    // rule-set quality gate swapped for the trained linear probe (the
    // two-stage quality pipeline Classify's scaladoc describes: rules
    // label a seed set, the probe generalizes them). The gate is
    // RANK-based — keep the top 30% by score, CCNet's head-selection
    // shape — because an absolute τ is corpus-fragile (this corpus's
    // trained scores top out near 0.16 at sf0.01 and near 0.7 at
    // sf0.001; a fixed 0.5 kept everything or nothing). The gate is
    // Sampling.topFraction's grid-histogram cascade — exact
    // floor(3n/10) under (score DESC, md5-bucket, doc_id) with no
    // corpus-wide rank, no driver count, and no TakeOrdered merge
    // task holding k rows (corpus-unbounded, unlike the former
    // orderBy+limit gate whose single merge task capped it at ~10⁸
    // docs). The oracle nests the FULL 8-step training-loop replay
    // inside the cluster-dedup closure, so a drifting trained weight
    // breaks the hash, and replays the gate as a plain
    // row_number() OVER (ORDER BY score DESC, bucket, doc_id).
    "corpus_clean_ml" -> ((s, d) => {
      val doc = docs(s, d)
      val clu = Dedup.clusters(Dedup.jaccardPairs(doc, k = 3, threshold = 0.5))
      // scored feeds the histogram, the n aggregate, and the join-back
      // (the multi-consumer rule) — materialize once
      val scored = graft.Materialize.once(
        Classify.scores(doc).select(col("doc_id"), col("score")))
      Sampling.topFraction(scored, col("score"), col("doc_id"),
          num = 3L, den = 10L, salt = "cleanml")
        .join(clu, Seq("doc_id"), "left")
        .where(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
        .select(col("doc_id"), col("score"))
        .orderBy(col("doc_id"))
    }),
    // 130: C4-style line-level cleaning (Raffel et al. §2.2 +
    // RefinedWeb duplicate-line removal): per-line min-words and
    // "javascript" rules, page-level lorem-ipsum/brace drops, then
    // cross-document keep-first dedup of normalized lines. The
    // terminal-punctuation rule is OFF for this corpus (synthetic
    // punctuation-free text would lose every line); LinesSpec pins it
    // on against a planted fixture. The oracle hash-checks the
    // reassembled clean text.
    "text_lines" -> ((s, d) =>
      Lines.cleanLines(docs(s, d)).orderBy(col("doc_id"))),
    // 138: C4 §2.2's remaining rule — the page BLOCKLIST filter: drop
    // any page containing a blocklisted token (exact normalized-token
    // equality; Lines.badwords is interpolated into the oracle SQL so
    // the engines share one list). Pure narrow map (array HOF over a
    // literal array), zero shuffles at any corpus size; the audit
    // emits per-page hit counts so the drop is observable, and page
    // filtering composes as .where(col("kept")).
    "text_badwords" -> ((s, d) =>
      Lines.badwordAudit(docs(s, d)).orderBy(col("doc_id"))),
    // 138b: license/boilerplate detection — the legal-text complement
    // of the blocklist: pretrain corpora drop or down-weight pages
    // that are license headers, notice files, and rights boilerplate
    // (near-zero training signal, heavily duplicated across repos and
    // sites). Lowercase LITERAL phrase tests (instr, no regex) over
    // one interpolated list; the corpus is license-free so the planted
    // fixtures (MIT / Apache / GPL / SPDX / a "copyright office"
    // prose trap) carry the behavior. Pure narrow map — zero shuffle
    // at any corpus size.
    "text_license" -> ((s, d) =>
      docs(s, d).select(col("doc_id"), col("text"))
        .unionByName(plantedDocs(s, licensePlanted))
        .select(col("doc_id"),
          Text.licenseHits(col("text")).as("n_phrases"))
        .withColumn("has_license", col("n_phrases") >= 1L)
        .orderBy(col("doc_id"))),
    // 154: greenlist watermark detection (Kirchenbauer et al. 2023) —
    // the synthetic-text gate a pretrain corpus runs to keep
    // model-generated text out: count sha-derived green transitions,
    // z-test against the γ·T unwatermarked expectation, verdict
    // length-gated at WM_MIN scored transitions. The corpus is
    // natural (z ~ N(0,1)); the planted all-green chain (z ≈ 10.82)
    // and its short prefix (z ≈ 4.58 but under the length gate)
    // carry both verdict branches. Narrow codegen'd map, tokens
    // staged as an attribute ref, zero shuffle.
    "text_watermark" -> ((s, d) =>
      graft.operators.Watermark.report(
        docs(s, d).select(col("doc_id"), col("text"))
          .unionByName(plantedDocs(s, wmPlanted)))
        .orderBy(col("doc_id"))),
    // 139: HTML/markup stripping AHEAD of the text stack — crawl pages
    // arrive as HTML; this reduces them to the plain text every
    // downstream stage (fixText, text_lines, dedup_paragraph,
    // fingerprints) assumes. Script/style/comment spans drop, block
    // tags become newlines (preserving line/paragraph structure),
    // inline tags become spaces, the fixed entity table decodes
    // (&amp; last — double-escape safe), whitespace collapses. All
    // regexp/replace built-ins in the Java∩RE2 subset; the corpus is
    // markup-free so the planted pages carry the behavior, UNIONed in
    // both engines from the same interpolated constants. Pure narrow
    // map — zero shuffles at any corpus size.
    "html_extract" -> ((s, d) => {
      docs(s, d).select(col("doc_id"), col("text"))
        .unionByName(plantedDocs(s, htmlPlanted))
        .select(col("doc_id"), col("text"),
          graft.functions.Html.extractText(col("text")).as("text_plain"))
        .select(col("doc_id"), col("text_plain"),
          (col("text_plain") =!= col("text")).as("changed"))
        .orderBy(col("doc_id"))
    }),
    // 140: the composed end-to-end pretraining-prep flagship — the
    // full curation stack in its documented order (normalize →
    // blocklist → line clean → paragraph dedup → near-dup
    // keep-canonical → trained classifier rank gate → benchmark
    // decontamination → temperature sampling → shard manifest), as
    // ONE oracle-replayed query. Integration bugs live BETWEEN
    // operators; the per-operator oracles can't see them. The planted
    // NFD/mojibake pair (-12/-11) exercises fixText's composition
    // point ahead of the dedup keys. Benchmark = the raw %20==7 docs
    // (the decontaminate convention); the corpus keeps them and the
    // decon stage removes them (sharing 8-grams with themselves).
    "corpus_pretrain" -> ((s, d) => {
      val (src, bench) = pretrainSrcBench(s, d)
      graft.operators.Pretrain.run(src, bench)
        .orderBy(col("shard_id"), col("pos"))
    }),
    // 147: the flagship pipeline's stage-yield funnel — survivor
    // counts at EVERY stage boundary (the report a curation operator
    // watches: a bad blocklist push or classifier drift eats the
    // corpus HERE first). Counts come from the same stage frames the
    // manifest executes (Pretrain.stages is shared), so the funnel
    // cannot drift from the pipeline it audits.
    "pretrain_yield" -> ((s, d) => {
      val (src, bench) = pretrainSrcBench(s, d)
      graft.operators.Pretrain.yieldReport(src, bench)
    }),
    // 141: the step after the manifest — TRAINER-READY examples:
    // 64/16 context chunks of each manifest doc's cleaned text packed
    // into 256-token examples IN TRAINING ORDER (the pack window
    // partitions by the manifest shard and orders by
    // (pos, chunk_start)); shard-local windows keep the sort
    // ~n/nShards rows. Same source + benchmark as corpus_pretrain.
    "pretrain_examples" -> ((s, d) => {
      val (src, bench) = pretrainSrcBench(s, d)
      graft.operators.Pretrain.examples(src, bench)
        .orderBy(col("shard_id"), col("pack_id"))
    }),
    // 149: SFT prompt-masked example prep — the loss-mask boundary an
    // instruction-tuning trainer consumes: chat-template rendering,
    // maxLen truncation, and per-example shas of the FULL rendered
    // token stream and 0/1 mask stream (every token and mask bit
    // oracle-proven, not just the counts). Narrow codegen'd map,
    // zero shuffle.
    "sft_examples" -> ((s, d) =>
      graft.operators.Pretrain.sftExamples(docs(s, d),
        promptTokens = SFT_PROMPT, maxLen = SFT_MAXLEN)
        .orderBy(col("doc_id"))),
    // 149c: fill-in-the-middle transform — the code-model training
    // transform (FIM, Bavarian et al. 2022): a deterministic
    // FIM_RATE% of docs re-render PSM (<|fim_pre|> prefix <|fim_suf|>
    // suffix <|fim_mid|> middle) with sha-derived cut points both
    // engines replay; the rest pass through left-to-right. The
    // rendered-stream sha proves every token of the reordering.
    // Narrow codegen'd map, zero shuffle.
    "doc_fim" -> ((s, d) =>
      graft.operators.Pretrain.fimExamples(docs(s, d), ratePct = FIM_RATE)
        .orderBy(col("doc_id"))),
    // 155: long-context document stitching — same-source ingest-order
    // concat into <=CTX_STITCH-token contexts via the offset-quota
    // assignment (window-parallel, deterministic); per-context sha of
    // the full separator-joined text proves every stitched byte.
    // One source exchange + in-shuffle window + same-keyed agg.
    "corpus_stitch" -> ((s, d) =>
      graft.operators.Pretrain.stitchContexts(docs(s, d), budget = CTX_STITCH)
        .orderBy(col("source"), col("context_id"))),
    // 150: DPO preference-pair construction — i-th best vs i-th worst
    // per (source, sha-bucket) group by the deterministic quality
    // score, margin-gated; disjointness is structural (the orderings
    // are exact reverses + the 2i ≤ group-size guard). One hash
    // exchange on the bounded group key, two in-shuffle window ranks,
    // one ≤topK-per-group self-equi-join.
    "dpo_pairs" -> ((s, d) =>
      graft.operators.Pretrain.dpoPairs(docs(s, d), buckets = DPO_BUCKETS,
        topK = DPO_TOPK, minMargin = DPO_MARGIN)
        .orderBy(col("source"), col("bucket"), col("pair_rank"))),
    // 141b: the same examples packed in TRAINER-REAL tokens — the
    // 8-round BPE tokenizer trains on the raw corpus (tokenizers
    // precede curation) and each chunk costs the sum of its words'
    // trained segment sizes (character fallback for OOV — what a real
    // BPE does with unseen words, and the planted French rows ARE
    // unseen). The oracle splices the renamed BPE cascade into the
    // pretrain CTE chain, so the hash proves merge training, the
    // 9-stage pipeline, chunking, AND the BPE-budget pack together.
    "pretrain_examples_bpe" -> ((s, d) => {
      val (src, bench) = pretrainSrcBench(s, d)
      graft.operators.Pretrain.examplesBpe(src, bench, docs(s, d))
        .orderBy(col("shard_id"), col("pack_id"))
    }),
    // 141c: the SAME BPE-budget packs, but the tokenizer trains ONCE
    // and publishes through the versioned lake (merges + segments +
    // meta as one atomic group) — the train-once/probe-many split the
    // IVF-PQ and BM25 indexes already have, applied to the suite's
    // heaviest trainer. Shares pretrain_examples_bpe's oracle SQL
    // verbatim: the lake round trip must be invisible to the packs.
    "pretrain_examples_bpe_indexed" -> ((s, d) => {
      val (src, bench) = pretrainSrcBench(s, d)
      val lake = java.nio.file.Files
        .createTempDirectory("graft-bpe-lake").toString
      graft.operators.Pretrain.publishTokenizerLake(docs(s, d), lake)
      graft.operators.Pretrain.examplesBpeIndexed(s, lake, src, bench)
        .orderBy(col("shard_id"), col("pack_id"))
    }),
    // 131: paragraph-granularity exact dedup (Falcon/RefinedWeb):
    // blank-line split, normalized-paragraph fingerprint, keep-first
    // across the corpus, reassemble. The dedup_exact shifted-union
    // makes every paragraph a guaranteed repeat, so the removal path
    // is hot: the +1000000 copies lose all paragraphs and drop out.
    "dedup_paragraph" -> ((s, d) => {
      val t = docs(s, d).select(col("doc_id"), col("text"))
      Lines.dedupParagraphs(t.unionByName(
          t.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))))
        .orderBy(col("doc_id"))
    }),
    // 132: first-occurrence novelty scoring — per doc, the fraction of
    // its distinct 8-grams whose corpus-FIRST occurrence (min doc_id,
    // the ingest-order convention) is this doc: the marginal-content
    // measure dedup-aware sampling weighs by (a doc that is 90%
    // already-seen n-grams contributes 10% new signal regardless of
    // near-dup verdicts). Scale shape: one (doc_id, gram) distinct,
    // one min-owner aggregation (map-side combined — a boilerplate
    // gram in 10⁶ docs produces one partial per map task), one join
    // on the gram (hot grams are linear output; AQE skew split
    // applies). Docs shorter than 8 tokens have no grams and score
    // novelty 1.0 — no evidence of duplication.
    "corpus_novelty" -> ((s, d) => {
      val doc = docs(s, d)
      val grams = doc
        .select(col("doc_id"), Text.tokensOrEmpty(col("text")).as("tk"))
        .select(col("doc_id"), explode(Text.ngramsOf(col("tk"), 8)).as("g"))
        .distinct()
      val owner = grams.groupBy(col("g")).agg(min(col("doc_id")).as("owner"))
      val per = grams.join(owner, "g")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("doc_id") === col("owner"), 1L).otherwise(0L)).as("n_novel"))
      doc.select(col("doc_id")).join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          when(coalesce(col("n_grams"), lit(0L)) > 0,
            round(col("n_novel").cast("double") / col("n_grams").cast("double"), 6))
            .otherwise(lit(1.0)).as("novelty"))
        .orderBy(col("doc_id"))
    }),
    // 133: tokenizer fertility report — subtokens-per-word and
    // chars-per-subtoken by language under the TRAINED 8-round BPE
    // tokenizer (text_bpe_train's vocabulary): the stat that tells a
    // training-data pipeline which languages a tokenizer punishes
    // (fertility 2× means half the effective context). BPE merges
    // concatenate symbols, so Σ chars across a token's subtokens
    // equals the token's length — chars_per_subtoken needs no extra
    // bookkeeping. The oracle replays the full trainer cascade plus
    // the per-lang aggregation.
    "text_fertility" -> ((s, d) => {
      val doc = docs(s, d)
      val seg = graft.Materialize.once(bpeSegmentsOf(doc, rounds = 8)
        .select(col("token"), size(col("sy")).as("n_sub"),
          length(col("token")).cast("long").as("n_chars")))
      val tok = doc.select(col("doc_id"), col("lang"),
        explode(Text.tokensOrEmpty(col("text"))).as("token"))
      val nd = doc.groupBy(col("lang")).agg(countDistinct(col("doc_id")).as("n_docs"))
      tok.join(seg, "token")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_sub")).cast("long").as("n_subtokens"),
          sum(col("n_chars")).as("n_chars"))
        .join(nd, Seq("lang"))
        .select(col("lang"), col("n_docs"), col("n_words"), col("n_subtokens"),
          round(col("n_subtokens").cast("double") / col("n_words").cast("double"), 6)
            .as("fertility"),
          round(col("n_chars").cast("double") / col("n_subtokens").cast("double"), 6)
            .as("chars_per_subtoken"))
        .orderBy(col("lang"))
    }),
    // 45: the composed training-data pipeline end to end — quality
    // gate + cluster dedup (corpus_clean), stratified sample (#41),
    // context-window chunking (#42). What a pre-training corpus job
    // actually ships: parquet in, training chunks out.
    "corpus_chunks" -> ((s, d) => {
      val doc = docs(s, d)
      val clu = Dedup.clusters(Dedup.jaccardPairs(doc, k = 3, threshold = 0.5))
      // materialize the corpus_clean stage ONCE: the composed plan
      // otherwise regenerates the whole quality+jaccard+cluster
      // subtree's code under the sample/chunk stages, and that
      // first-execution codegen dominated the count series (6.1s vs
      // a 4.1s forced run — r8 VERDICT #3). Splitting here keeps each
      // generated stage small; values are unchanged.
      val kept = graft.Materialize.once(doc
        .select(col("doc_id"), col("lang"), col("text"),
          Text.qualityScore(col("text")).as("quality"))
        .join(clu, Seq("doc_id"), "left")
        .where(col("quality") >= 0.5 &&
          (col("cluster_id").isNull || col("cluster_id") === col("doc_id"))))
      val sampled = Sampling.stratifiedSample(kept, col("doc_id"), col("lang"),
        rates = Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.3), defaultRate = 0.1)
      Text.chunk(sampled.select(col("doc_id"), col("text")), col("text"),
          chunkSize = 64, overlap = 16)
        .select(col("doc_id"), col("chunk_start").cast("long").as("chunk_start"),
          col("chunk_text"), col("n_tokens").cast("long").as("n_tokens"))
        .orderBy(col("doc_id"), col("chunk_start"))
    }),
    // 29: brute-force cosine top-k, 10 broadcast query vectors
    "knn_cosine" -> ((s, d) => {
      val e = embs(s, d)
      Knn.cosineTopK(e, e.where(col("vec_id") < 10), k = 5)
        .select(col("query_id"), col("rk"), col("vec_id"), col("cos"))
    }),
    // 126: SEMANTIC benchmark decontamination — the embedding-space
    // complement of the n-gram `decontaminate` key: paraphrased or
    // re-worded eval contamination carries no 8-gram overlap but high
    // embedding cosine, so modern decontamination sweeps run BOTH.
    // Every corpus vector scores its max cosine against the benchmark
    // embedding set (vec_id % 20 == 7 — the `decontaminate` split
    // convention) and is flagged at >= 0.35 (this corpus's near-dup
    // band, the dedup_embed threshold). Scale shape: benchmark suites
    // are small — broadcast — and the argmax combines map-side, so
    // the corpus never shuffles more than (vec_id, cos) partials; a
    // corpus-scale benchmark swaps in the IVF probe (knn_ivf's
    // contract) exactly like knn_cosine.
    "decon_embed" -> ((s, d) => {
      val e = embs(s, d)
      val bench = e.where(col("vec_id") % 20 === 7)
        .select(col("embedding").as("b_emb"))
      e.where(col("vec_id") % 20 =!= 7)
        .crossJoin(broadcast(bench))
        .select(col("vec_id"),
          round(Knn.cosine(col("embedding"), col("b_emb")), 6).as("cos"))
        .groupBy(col("vec_id"))
        .agg(max(col("cos")).as("max_cos"))
        .select(col("vec_id"), col("max_cos"),
          (col("max_cos") >= 0.35).as("contaminated"))
        .orderBy(col("vec_id"))
    }),
    // 126b: decon_embed's corpus-scale swap-in made concrete — the
    // benchmark set indexed into IVF cells, each corpus vector probing
    // its 4 nearest. Same output shape and threshold as decon_embed;
    // max_cos is the probed maximum (DeconIvfSpec pins flag agreement
    // with the broadcast variant and HotKeyStressSpec bounds the
    // probed-pair count).
    "decon_embed_ivf" -> ((s, d) => {
      val e = embs(s, d)
      Knn.deconEmbedIvf(e.where(col("vec_id") % 20 =!= 7),
          e.where(col("vec_id") % 20 === 7), threshold = 0.35)
        .orderBy(col("vec_id"))
    }),
    // 103: hard-negative mining — per query vector, the 5 most-similar
    // vectors with a DIFFERENT label (contrastive-training negatives;
    // same-label hits are false negatives and never surface). Broadcast
    // probe like knn_cosine; ivfTopK is the corpus-scale swap-in.
    "knn_hardneg" -> ((s, d) => {
      val e = embs(s, d)
      Knn.hardNegatives(e, e.where(col("vec_id") < 10), k = 5)
        .select(col("query_id"), col("rk"), col("vec_id"), col("neg_label"), col("cos"))
    }),
    // 104: nearest-class-centroid (Rocchio) auto-labeling + agreement
    // audit — exact integer-grid label centroids, broadcast argmax,
    // fully oracle-replayable (the label-grouped cousin of embed_kmeans)
    "embed_classify" -> ((s, d) =>
      Knn.classifyByCentroid(embs(s, d)).orderBy(col("vec_id"))),
    // 30: LSH-bucketed ANN — sha-derived hyperplanes, so the oracle
    // replays signature/banding/candidates/re-rank exactly. bandBits
    // pinned to 4 (what autoBandBits picks at sf0.01–0.1 corpus sizes,
    // and what the oracle SQL replays) so the plan carries NO hidden
    // corpus.count() job — at scale, pass the known corpus size instead
    "knn_lsh" -> ((s, d) => {
      val e = embs(s, d)
      Knn.lshTopK(e, e.where(col("vec_id") < 10), k = 5, bandBits = 4)
        .select(col("query_id"), col("rk"), col("vec_id"), col("cos"))
    }),
    // 37: IVF ANN top-k — deterministic coarse cells + nProbe probing;
    // the whole pipeline (centroids, assignment, probes, re-rank) is
    // hashing-free, and nCells = Knn.autoCells(n) = max(16, ceil(sqrt(n)))
    // is derived from the corpus size (the one count() here is the
    // price of the dial at unknown n — at scale pass corpusSize), so
    // the DuckDB oracle replays the whole pipeline, cell count included
    "knn_ivf" -> ((s, d) => {
      val e = embs(s, d)
      Knn.ivfTopK(e, e.where(col("vec_id") < 10), k = 5, nProbe = 4,
        corpusSize = embCount(s, d))
        .select(col("query_id"), col("rk"), col("vec_id"), col("cos"))
    }),
    // 148: ANN recall audit — recall@{1,5,10} of the IVF ranking vs
    // the exact ranking per query: the index-quality number an
    // operator tunes nProbe/nCells with (the FAISS recall-curve
    // methodology). Both rankings run by construction (the
    // dedup_recall convention); post-top-k work is (queries × k)-sized.
    "knn_recall" -> ((s, d) => {
      val e = embs(s, d)
      Knn.annRecall(e, e.where(col("vec_id") < 10), ks = Seq(1, 5, 10),
        nProbe = 4, corpusSize = embCount(s, d))
    }),
    // 148b: the same audit for the QUANTIZED index — recall@{1,5} of
    // the IVF-PQ ranking vs exact: the recall gap against knn_recall
    // IS the quantization loss (the number PQ block/codebook tuning
    // watches). Shares rankingRecall's core and the exact side.
    "knn_recall_pq" -> ((s, d) => {
      val e = embs(s, d)
      val q = e.where(col("vec_id") < 10)
      Knn.rankingRecall(e, q, ks = Seq(1, 5),
        Pq.ivfPqTopK(e, q, k = 5, corpusSize = embCount(s, d)))
    }),
    // 148c: the same audit for the sign-LSH index — recall@{1,5} of
    // the banded-LSH ranking vs exact, completing the driver-measured
    // recall family (IVF #148, PQ #148b, LSH here): every approximate
    // ANN path now ships with its index-quality number. Shares
    // rankingRecall's core and the exact side.
    "knn_recall_lsh" -> ((s, d) => {
      val e = embs(s, d)
      val q = e.where(col("vec_id") < 10)
      Knn.rankingRecall(e, q, ks = Seq(1, 5),
        Knn.lshTopK(e, q, k = 5, bandBits = 4)
          .select(col("query_id"), col("rk"), col("vec_id")))
    }),
    // 148d: truncated-dimension (Matryoshka) recall audit — recall of
    // prefix-16-dim cosine ranking vs the full 64-dim exact ranking:
    // where #148/#148b/#148c price an INDEX structure, this prices a
    // REPRESENTATION cut (4× fewer vector bytes through every dense
    // stage). Shares rankingRecall's core and output shape.
    "knn_recall_trunc" -> ((s, d) => {
      val e = embs(s, d)
      Knn.truncRecall(e, e.where(col("vec_id") < 10),
        ks = Seq(1, 5, 10), dims = 16)
    }),
    // 122: MMR diversity re-rank — greedy λ=0.7 maximal-marginal-
    // relevance over the per-query top-10 ANN pool, exact scaled-
    // BIGINT objective (7·rel − 3·maxSim on the 1e-6 grid), fixed
    // unrolled selection so the oracle replays the whole greedy
    // trajectory. Everything after the ANN stage is pool-bounded.
    "knn_mmr" -> ((s, d) => {
      val e = embs(s, d)
      Knn.mmrRerank(e, e.where(col("vec_id") < 10), k = 5, pool = 10)
        .select(col("query_id"), col("rk"), col("vec_id"), col("mmr10_i"))
    }),
    // 119: IVF-PQ quantized ANN — product-quantization codebooks
    // (8 blocks × 16 codes, 2 Lloyd rounds on the exact integer grid)
    // over the auto-cell IVF, int8 codes in the index, asymmetric-
    // distance shortlist (1e-6 BIGINT grid, order-free sums), exact
    // re-rank of 4·k. The full training loop is deterministic, so the
    // oracle replays codebooks, codes, ADC and ranking end-to-end.
    "knn_ivfpq" -> ((s, d) => {
      val e = embs(s, d)
      Pq.ivfPqTopK(e, e.where(col("vec_id") < 10), k = 5,
        corpusSize = embCount(s, d))
        .select(col("query_id"), col("rk"), col("vec_id"), col("cos"), col("adc"))
    }),
    // 119b: the SAME ranking over the index PUBLISHED once through the
    // versioned lake — coarse centroids, PQ codebooks, int8 codes and
    // the cell-partitioned vectors train at publish time and commit as
    // ONE atomic group; the probe reads the published tables (query
    // vectors too — a serving tier reads only its index) and pays
    // query-side work only. Shares knn_ivfpq's oracle verbatim: the
    // lake round-trip is invisible to the ranking, which is the
    // "train once, probe many" claim made checkable.
    "knn_ivfpq_indexed" -> ((s, d) => {
      val lake = java.nio.file.Files
        .createTempDirectory("graft-ivfpq-lake").toString
      Pq.publishIvfPqLake(embs(s, d), lake, corpusSize = embCount(s, d))
      // the 10-row query list feeds the coarse probes AND the ADC
      // lookup table: materialize once so the published vectors table
      // is not scanned twice for it (PlanSpec's ≤6-scan budget)
      val queries = graft.Materialize.once(s.read.format("graftlake")
        .option("table", "vectors").load(lake)
        .where(col("vec_id") < 10).select(col("vec_id"), col("embedding")))
      Pq.ivfPqTopKIndexed(s, lake, queries, k = 5)
        .select(col("query_id"), col("rk"), col("vec_id"), col("cos"), col("adc"))
    }),
    // 36: embedding-cosine near-dup pairs, IVF flavor (same-cell
    // candidates + exact verify — oracle-replayable at the auto cell
    // count; the sign-LSH variant Knn.embeddingPairs stays spec-pinned
    // in KnnSpec)
    "dedup_embed" -> ((s, d) =>
      Knn.ivfPairs(embs(s, d), threshold = 0.35, corpusSize = embCount(s, d))
        .orderBy(col("vec_a"), col("vec_b"))),
    // 100: k-NN graph over ALL embeddings (each vector's top-3
    // same-cell neighbors by rounded cosine, ties to the lower id) —
    // the all-vertices complement of knn_ivf's 10-query probe and the
    // input every kNN-graph method (semantic clustering, label prop,
    // graph-based dedup) starts from. The IVF cell join bounds pair
    // work to n²/nCells (nCells ≈ √n at scale); the assignment is
    // materialized once so the self-join can't re-run it per side.
    // Isolated vectors (alone in their cell) have no edges, like MOSS
    // singletons — documented, the oracle agrees.
    "graph_knn" -> ((s, d) =>
      knnTop3(s, d).orderBy(col("vec_id"), col("rk"))),
    // 102: semantic clustering = connected components over the MUTUAL
    // #100 edges (a in b's top-3 AND b in a's top-3 — the standard
    // symmetrization that keeps asymmetric hub attachments from
    // chaining unrelated regions together). Rides the same
    // checkpointed min-label propagation as dedup_cluster; every
    // vector appears (singletons label themselves). The oracle replays
    // the closure with a recursive CTE.
    "graph_clusters" -> ((s, d) => semanticClusters(s, d)),
    // 58: deterministic Lloyd k-means — trained coarse quantizer;
    // exact-integer centroid means make every iteration replayable,
    // so the oracle re-runs the full training loop
    "embed_kmeans" -> ((s, d) =>
      Knn.kmeansAssignments(embs(s, d), k = 8, iters = 2)
        .select(col("vec_id"), col("cell_id"), col("cos"))
        .orderBy(col("vec_id"))),
    // 110b: embedding-space outlier pruning — flag vectors more than
    // OUTLIER_Z cluster-stddevs below their own cell's mean assignment
    // cosine (OCR garbage / wrong-modality / encoder-failure tail).
    // Same embed_kmeans trainer geometry (k=8, iters=2) so the oracle
    // splices the shared kmeans CTE; mean/std run on the 1e-6-grid
    // quantized cosine as exact integer sums (order-free), and both
    // engines evaluate the identical threshold expression. One k-row
    // integer aggregate broadcast back — no second corpus shuffle.
    "embed_outliers" -> ((s, d) =>
      Knn.outliers(embs(s, d), k = 8, iters = 2, zThresh = OUTLIER_Z)
        .orderBy(col("vec_id"))),
    // 59: semantic dedup — k-means cells + same-cell cosine prune
    // (drop vectors with a lower-id neighbor ≥ threshold). The cell
    // count rides the same corpus-size dial as the IVF family
    // (autoCells = max(16, ceil(sqrt(n))), oracle-mirrored): SemDeDup
    // pair work is bounded by cell occupancy, so a pinned k would be
    // quadratic at corpus scale exactly like the retired nCells=16.
    "dedup_semantic" -> ((s, d) => {
      val e = embs(s, d)
      Knn.semanticKeep(e, k = Knn.autoCells(embCount(s, d)), iters = 2,
          threshold = 0.35)
        .orderBy(col("vec_id"))
    }),
    // 134: D4 prototypicality pruning — dedup_semantic's complement:
    // SemDeDup drops near-COPIES; this drops each semantic cluster's
    // prototypical CORE (the quarter nearest its centroid), keeping
    // the corpus's spread. Same auto-cell k-means trainer, so the
    // oracle replays centroids, ranking and the div-4 cut exactly.
    "embed_diversify" -> ((s, d) =>
      Knn.diversify(embs(s, d), k = Knn.autoCells(embCount(s, d)), iters = 2)
        .orderBy(col("vec_id"))),
    // 110: top-principal-component projection — matrix-free distributed
    // power iteration (3 rounds, exact integer-grid accumulation, so
    // the oracle replays the whole training loop like embed_kmeans);
    // per-iteration cost is one narrow dot-product pass + one 64-row
    // partial aggregation — the d² covariance never materializes
    "embed_pca" -> ((s, d) =>
      Pca.project(embs(s, d), iters = 3).orderBy(col("vec_id"))),
    // 52: int8 embedding quantization — per-vector scale + component
    // stats (sums/extremes prove every quantized value without an
    // array-typed output column)
    "embed_quantize" -> ((s, d) =>
      Knn.quantizeInt8(embs(s, d))
        .select(col("vec_id"), col("scale"),
          size(col("q")).cast("long").as("n_dims"),
          aggregate(col("q"), lit(0L), (a, x) => a + x).as("sum_q"),
          aggregate(col("q"), lit(0L), (a, x) => a + x * x).as("sum_q2"),
          array_min(col("q")).as("min_q"),
          array_max(col("q")).as("max_q"))
        .orderBy(col("vec_id"))),
    // 31: language ID. Stopword-hit counts staged as attribute refs
    // (argmax over columns, not over duplicated expression trees).
    "text_langid" -> ((s, d) => {
      val hits = Text.stopwords.map { case (lang, ws) =>
        Text.stopwordHits(col("text"), ws).as(s"h_$lang") }
      val staged = docs(s, d).select(col("doc_id") +: col("lang") +: hits: _*)
      val (bestLang, bestScore) = Text.stopwords
        .map { case (lang, _) => (lit(lang), col(s"h_$lang")) }
        .reduceLeft[(org.apache.spark.sql.Column, org.apache.spark.sql.Column)] {
          case ((bl, bs), (l, sc)) => (when(sc > bs, l).otherwise(bl), greatest(bs, sc))
        }
      staged.select(col("doc_id"), col("lang").as("lang_label"),
        when(bestScore > 0, bestLang).otherwise(lit("und")).as("lang_detected"))
        .orderBy(col("doc_id"))
    }),
    // 137: char-trigram naive-Bayes language ID — the fastText-shaped
    // upgrade over text_langid's stopword heuristic (LangId's scaladoc
    // has the model + scale shape; LangIdSpec shows it classifying
    // short stopword-free docs the heuristic calls "und"). Trained on
    // even doc_ids, so odd-doc predictions are out-of-sample; on THIS
    // corpus the lang label is independent of the synthetic text, so
    // the oracle validates the exact integer-grid NB arithmetic, not
    // detection quality — the spec's planted multilingual fixture
    // validates that.
    "text_langid2" -> ((s, d) =>
      LangId.langIdTrigram(docs(s, d)).orderBy(col("doc_id"))),
    // 136: Unicode/encoding normalization — the curation stage that
    // runs BEFORE fingerprinting/dedup keying so NFD-vs-NFC forms,
    // zero-width characters, line endings, and mojibake unify onto one
    // dedup key (Text.fixText's scaladoc documents the composition
    // point ahead of text_fingerprint / dedup_exact /
    // dedup_paragraph). The synthetic corpus is ASCII (identity path),
    // so the pipeline is exercised by planted rows UNIONed in BOTH
    // engines from the same interpolated constants: NFD marks,
    // zero-width family, mojibake, controls + CRLF, and the
    // scrub-then-compose ordering case. Pure narrow map (one custom
    // codegen'd NFC scalar + built-ins) — zero shuffles at any corpus
    // size; the oracle hash-checks the normalized text directly
    // against DuckDB's utf8proc nfc_normalize.
    "text_normalize" -> ((s, d) => {
      val planted = s.createDataFrame(
        java.util.Arrays.asList(normPlanted.map { case (id, t) =>
          org.apache.spark.sql.Row(id, t) }: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType, nullable = false))))
      docs(s, d).select(col("doc_id"), col("text")).unionByName(planted)
        .select(col("doc_id"), col("text"),
          Text.fixText(col("text")).as("text_norm"),
          Text.repairMojibake(col("text")).as("moj"))
        .select(col("doc_id"), col("text_norm"),
          (col("text_norm") =!= col("text")).as("changed"),
          (col("moj") =!= col("text")).as("mojibake_fixed"))
        .orderBy(col("doc_id"))
    }),
    // 32: quality scoring
    "text_quality" -> ((s, d) => docs(s, d).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      Text.tokenCount(col("text")).cast("long").as("n_tokens"),
      round(Text.meanTokenLen(col("text")), 6).as("mean_token_len"),
      round(Text.punctRatio(col("text")), 6).as("punct_ratio"),
      round(Text.stopwordRatio(col("text")), 6).as("stopword_ratio"),
      Text.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))),
    // 139b: HTML link extraction — the crawl-pipeline step BEFORE
    // html_extract strips markup: (url, anchor, host) edges per page,
    // the raw material of link graphs, anchor-text signals, and
    // host-level dedup/spam scoring. Two regexp_extract_all passes
    // (group 1 = href, group 2 = anchor) zipped positionally, host
    // from one more extract; narrow map + posexplode, zero joins.
    // The corpus is markup-free so the planted pages carry the
    // behavior (incl. a relative URL -> empty host and a zero-link
    // page that must yield no rows).
    "html_links" -> ((s, d) => {
      docs(s, d).select(col("doc_id"), col("text"))
        .unionByName(plantedDocs(s, linksPlanted))
        .select(col("doc_id"),
          regexp_extract_all(col("text"), lit(LINK_RE), lit(1)).as("urls"),
          regexp_extract_all(col("text"), lit(LINK_RE), lit(2)).as("anchors"))
        .select(col("doc_id"),
          posexplode(arrays_zip(col("urls"), col("anchors"))))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("link_pos"),
          col("col.urls").as("url"), col("col.anchors").as("anchor"))
        .withColumn("host", regexp_extract(col("url"), HOST_RE, 1))
        .orderBy(col("doc_id"), col("link_pos"))
    }),
    // 149b: code-vs-prose detection — the domain-routing signal a
    // pretrain mixer needs (code gets its own budget/tokenizer
    // treatment): structural-symbol mass + word-bounded keyword hits
    // over the RAW text (code is case/layout-sensitive), gated in
    // pure integer arithmetic. The corpus is prose, so the planted
    // fixtures (python / C / JSON / two prose traps) carry the
    // behavior, UNIONed in both engines from the same constants.
    // Narrow two-regexp map — zero shuffle at any corpus size.
    "text_code" -> ((s, d) => {
      docs(s, d).select(col("doc_id"), col("text"))
        .unionByName(plantedDocs(s, codePlanted))
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          Text.codeSymbolCount(col("text")).as("n_symbols"),
          Text.codeKeywordHits(col("text")).as("kw_hits"))
        .withColumn("is_code",
          Text.isCode(col("n_chars"), col("n_symbols"), col("kw_hits")))
        .orderBy(col("doc_id"))
    }),
    // 33: token counting, three ways
    "text_tokens" -> ((s, d) => docs(s, d).select(
      col("doc_id"),
      Text.tokenCount(col("text")).cast("long").as("n_ws_tokens"),
      Text.bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"),
      Text.estTokensByChars(col("text")).as("n_est_tokens"))
      .orderBy(col("doc_id"))),
    // 55: repetition signals (Gopher-class quality filters) — duplicate
    // token / most-frequent-token / duplicate-bigram fractions, all
    // narrow per-document array math (no shuffle at any corpus size)
    // 135: token-distribution entropy — the information-density
    // quality signal (low entropy = keyword stuffing / boilerplate /
    // repetition; complements text_repetition's ratio family): H =
    // Σ (c/n)·ln(n/c) over distinct tokens. Each term floors onto the
    // 1e-6 grid and the per-doc sum runs in BIGINT (ORDER-FREE — the
    // drift-PSI / lmscore discipline, so double-assoc order can't
    // diverge the engines); single-token docs get exactly 0, empty
    // docs 0 with zero counts. Two partial-agg shuffles, corpus-linear.
    "text_entropy" -> ((s, d) => {
      val doc = docs(s, d)
      val cnt = doc.select(col("doc_id"),
          explode(Text.tokensOrEmpty(col("text"))).as("tk"))
        .where(col("tk") =!= "")
        .groupBy(col("doc_id"), col("tk")).agg(count(lit(1)).as("c"))
      val per = cnt.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"))
      val terms = cnt.join(per, Seq("doc_id"))
        .select(col("doc_id"), col("n"), col("n_distinct"),
          floor((col("c").cast("double") / col("n").cast("double")) *
            log(col("n").cast("double") / col("c").cast("double")) *
            lit(1000000.0) + lit(0.5)).cast("long").as("t"))
        .groupBy(col("doc_id"), col("n"), col("n_distinct"))
        .agg(sum(col("t")).as("ts"))
      doc.select(col("doc_id")).join(terms, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n"), lit(0L)).as("n_tokens"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          round(coalesce(col("ts"), lit(0L)).cast("double") / lit(1000000.0), 6)
            .as("entropy"))
        .orderBy(col("doc_id"))
    }),
    "text_repetition" -> ((s, d) => {
      val staged = docs(s, d)
        .select(col("doc_id"), Text.tokensOrEmpty(col("text")).as("tk"))
        .withColumn("bg", Text.bigramsOf(col("tk")))
      staged.select(
        col("doc_id"),
        size(col("tk")).cast("long").as("n_tokens"),
        size(array_distinct(col("tk"))).cast("long").as("n_distinct"),
        round(Text.dupRatio(col("tk")), 6).as("dup_token_ratio"),
        round(when(size(col("tk")) === 0, 0.0).otherwise(
          Text.topTokenCount(col("tk")).cast("double") / size(col("tk")).cast("double")), 6)
          .as("top_token_ratio"),
        round(Text.dupRatio(col("bg")), 6).as("dup_bigram_ratio"))
        .orderBy(col("doc_id"))
    }),
    // 56: corpus vocabulary build — the tokenizer-training primitive:
    // one partial-aggregated shuffle on token, deterministic top-100
    // by (count desc, token). TakeOrdered, not a global sort.
    "text_vocab" -> ((s, d) =>
      docs(s, d).select(explode(Text.tokens(col("text"))).as("token"))
        .where(col("token") =!= "")
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(100)),
    // 57: tf-idf top terms per document — tf from one (doc,token)
    // shuffle (doc length and document frequency both derive from it,
    // reusing the aggregate), ln-idf, top-3 per doc by ranked window
    "text_tfidf" -> ((s, d) => {
      val doc = docs(s, d)
      val toks = doc.select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
        .where(col("token") =!= "")
      // materialize the (doc, token, tf) aggregate ONCE: it feeds three
      // consumers (the score join, doc length, document frequency) and
      // exchange reuse does NOT fire across these branches — the
      // un-checkpointed form re-ran the tokenize+explode+aggregate
      // subtree per consumer (8 parquet scans in the executed plan;
      // same recompute class as graph_triangles). tf is Σtokens-sized:
      // at 100 TB set spark.graft.materialize=reliable (Materialize).
      val tf = graft.Materialize.once(
        toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf")))
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val ndocs = doc.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(dl, "doc_id").join(dfreq, "token")
        .crossJoin(broadcast(ndocs))
        .select(col("doc_id"), col("token"),
          round((col("tf").cast("double") *
              log(col("n_docs").cast("double") / col("df").cast("double"))) /
            col("dl").cast("double"), 6).as("tfidf"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("token"))
      scored.withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("token"), col("tfidf"))
        .orderBy(col("doc_id"), col("rk"))
    }),
    // 85: Okapi BM25 per-(doc, term) index weights, top-3 per doc —
    // the ranked-retrieval complement of text_tfidf (what a search /
    // retrieval-augmentation index stores). Same one-aggregate shape:
    // tf feeds dl, df AND the score join, materialized once; idf is
    // the Lucene-style ln((N - df + 0.5)/(df + 0.5) + 1) (always
    // positive); every double expression is mirrored operation-for-
    // operation in the oracle, so round(.,6) hash-checks.
    "text_bm25" -> ((s, d) => {
      val doc = docs(s, d)
      val toks = doc.select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
        .where(col("token") =!= "")
      val tf = graft.Materialize.once(
        toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf")))
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      // one-row (n_docs, avgdl): avgdl computed ONCE as a value so the
      // oracle's CTE reproduces the identical double
      val stats = doc.agg(count(lit(1)).as("n_docs"))
        .crossJoin(dl.agg(sum(col("dl")).as("sum_dl")))
        .select(col("n_docs"),
          (col("sum_dl").cast("double") / col("n_docs").cast("double")).as("avgdl"))
      val tfD = col("tf").cast("double")
      val dfD = col("df").cast("double")
      val idf = log((col("n_docs").cast("double") - dfD + 0.5) / (dfD + 0.5) + 1.0)
      val denom = tfD + lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * col("dl").cast("double") / col("avgdl"))
      val scored = tf.join(dl, "doc_id").join(dfreq, "token")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), col("token"),
          round(idf * (tfD * 2.2) / denom, 6).as("bm25"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("bm25").desc, col("token"))
      scored.withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("token"), col("bm25"))
        .orderBy(col("doc_id"), col("rk"))
    }),
    // 86: sparse retrieval top-k — the SERVING side of the text_bm25
    // index (what a retrieval-augmentation stack executes per query):
    // 10 deterministic query vectors (each query doc's top-3 BM25
    // terms) retrieve the 3 highest-scoring documents by sparse dot
    // product over the inverted index. Weights land on an exact 1e-6
    // integer grid, so dot products accumulate as order-free BIGINT
    // sums and the oracle replays them bit-exactly (the k-means /
    // pagerank trick applied to retrieval scores). Scale shape: the
    // query side is tiny and broadcast — the index never reshuffles
    // for the probe (the decontaminate pattern); per (query, doc)
    // partial sums are one agg shuffle bounded by Σ_t df(t) over query
    // terms. The final top-3 window runs over |queries| groups; a
    // 10⁶-query batch would swap it for per-query TakeOrdered, but the
    // window is exactly right at interactive batch sizes.
    "text_retrieval" -> ((s, d) => {
      // FULL integer-grid index (no top-3 truncation) built in-session
      val weights = graft.Materialize.once(bm25WeightsOf(docs(s, d)))
      sparseTopK(weights)
    }),
    // 95b: the SAME serving probe, but over the index PUBLISHED to a
    // versioned graftlake table and read back through the DSv2 source
    // — "build once, probe per ingest" proven oracle-identical: the
    // lake round-trip is invisible to the result, so this key shares
    // text_retrieval's oracle SQL verbatim. Even the query vectors
    // derive from the persisted index (a serving tier reads ONLY the
    // index). Scale note: the persisted index is the 100 TB shape —
    // the corpus-sized tf aggregate runs once at publish time, and
    // every probe after it scans the (pruned, columnar) index alone.
    "retrieval_indexed" -> ((s, d) => {
      val lake = java.nio.file.Files
        .createTempDirectory("graft-bm25-lake").toString
      graft.sources.StormSinks.writeVersionedTable(bm25WeightsOf(docs(s, d)), lake)
      sparseTopK(s.read.format("graftlake").load(lake))
    }),
    // 95g: the BM25 index's continuous-ingest face — publish on 90%
    // of the corpus, append the held-out 10% under the FROZEN
    // published statistics (new docs' known-vocabulary tokens score
    // under publish-time df/n_docs/avgdl; OOV tokens contribute
    // nothing — the Lucene-segment / FAISS-add frozen-snapshot
    // contract), then serve over the unioned segments. The oracle
    // replays publish + frozen-stats append + probe in ONE hash, so
    // the append arithmetic is correctness-gated.
    "retrieval_indexed_append" -> ((s, d) => {
      val doc = docs(s, d)
      val lake = java.nio.file.Files
        .createTempDirectory("graft-bm25-append").toString
      graft.operators.Retrieval.publishBm25Lake(
        doc.where(col("doc_id") % 10 =!= 9), lake)
      graft.operators.Retrieval.appendToBm25Lake(s, lake,
        doc.where(col("doc_id") % 10 === 9), maxSegments = 0)
      sparseTopK(graft.operators.Retrieval.readBm25Weights(s, lake))
    }),
    // 121: RAG context packing — the step between retrieval and the
    // prompt: per query take the sparse ranking DEEP (top-10), then
    // keep the greedy score-ordered PREFIX whose cumulative token
    // count fits the context budget (120 tokens here). One window
    // cumsum over an already-tiny per-query list — the budget rule
    // adds NO shuffle beyond the retrieval it wraps, at any corpus
    // size. Prefix (stop-at-overflow) semantics, not skip-and-
    // continue: skipping creates an order-dependent knapsack the
    // serving tier can't replay cheaply; the prefix rule is the
    // standard deterministic packer.
    "retrieval_pack" -> ((s, d) => {
      val doc = docs(s, d)
      val weights = graft.Materialize.once(bm25WeightsOf(doc))
      val ntok = doc.select(col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      val wq = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("rk"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      sparseTopK(weights, k = 10).join(ntok, "doc_id")
        .withColumn("cum_tokens", sum(col("n_tokens")).over(wq))
        .where(col("cum_tokens") <= 120)
        .select(col("query_id"), col("rk"), col("doc_id"),
          col("n_tokens"), col("cum_tokens"))
        .orderBy(col("query_id"), col("rk"))
    }),
    // 87: hybrid dense+sparse retrieval re-rank — the production RAG
    // serving shape (Elasticsearch/Vespa hybrid search): a dense
    // cosine ranking over embeddings and a sparse BM25 ranking over
    // the inverted index, fused by Reciprocal Rank Fusion
    // (score = Σ 1e9 div (60 + rank), exact BIGINT arithmetic — RRF
    // needs only the two rank columns, so the fusion is trivially
    // engine-replayable where a weighted score-sum would fight float
    // normalization). Embeddings.vec_id indexes documents.doc_id (the
    // corpus convention), so the two rankings join on ids. Scale: the
    // dense side here is the brute-force baseline (swap in ivfTopK at
    // corpus scale — same output contract); the sparse side never
    // reshuffles the index (broadcast probe); the fusion joins two
    // top-20-per-query lists — thousands of rows at ANY corpus size.
    "hybrid_rerank" -> ((s, d) =>
      hybridRrfOf(s, d).orderBy(col("query_id"), col("rk"))),
    // 142b: ranking-quality audit of the HYBRID serving path —
    // recall@5 / MRR / nDCG@5 of the fused RRF ranking against
    // pseudo-qrels = the dense EXACT top-5 (documents carry no label
    // qrels, and "how much of the exact ranking does the fusion
    // recover, and how early" is the number a hybrid deployment
    // tunes its RRF constant with). Same literal gain table and
    // exact-integer metric arithmetic as retrieval_eval.
    "retrieval_eval_hybrid" -> ((s, d) => {
      val e = embs(s, d)
      graft.operators.Knn.rankingEval(e, e.where(col("vec_id") < 10), k = 5,
        hybridRrfOf(s, d).select(col("query_id"), col("rk"),
          col("doc_id").as("vec_id")))
    }),
    // 143: quality-phased curriculum manifest — deterministic
    // easy→hard training order (fixed quality bands, salted-md5
    // shuffle within each band, per-(phase, shard) positions; the
    // training loop reads phase-major, round-robin across shards).
    // One narrow quality map + one (phase, shard) hash shuffle +
    // shard-local sorts at any corpus size.
    // (presentation orderBy lives HERE, not in the operator — the
    // manifest itself never sorts globally; see Pretrain.curriculum)
    "corpus_curriculum" -> ((s, d) =>
      Pretrain.curriculum(docs(s, d), nShards = 8)
        .orderBy(col("phase"), col("shard_id"), col("pos"))),
    // 142: retrieval quality evaluation — per-query recall@10 / MRR /
    // nDCG@10 of the dense ranking against label-derived binary qrels
    // (the regression metrics a retrieval stack re-runs after every
    // index or embedding change). The nDCG log-discounts enter as the
    // LITERAL 1e-6-grid gain table interpolated into the oracle, so
    // DCG/IDCG are order-free BIGINT sums and every ratio is one
    // rounded division of exact integers. Post-top-k work is
    // (queries × k)-sized at any corpus scale.
    "retrieval_eval" -> ((s, d) => {
      val e = embs(s, d)
      Knn.retrievalEval(e, e.where(col("vec_id") < 10), k = 10)
    }),
    // 146: contrastive training triplets — per anchor its nearest
    // same-label positive and 3 hardest different-label negatives
    // with the pos−neg margin, the export an embedding fine-tune
    // consumes. One corpus scan (single window pass over both sides,
    // anchor-bounded frame materialized once); broadcast-probe shape.
    "contrastive_triplets" -> ((s, d) => {
      val e = embs(s, d)
      Knn.contrastiveTriplets(e, e.where(col("vec_id") < 10), nNeg = 3)
    }),
    // 88: deterministic training-order shard manifest — the export
    // step every training run needs: a reproducible global shuffle
    // (training-order randomization) plus shard assignment, keyed on
    // the same salted-md5 lattice the samplers use (engine-replayable;
    // different salt → independent order). Output is the manifest
    // (shard_id, pos, doc_id). Scale: shard assignment is a narrow
    // map; the per-shard position is one hash shuffle on shard_id +
    // a per-shard sort — exactly the work the sharded write itself
    // pays, and WindowExec spills rather than buffering a shard.
    "corpus_shard" -> ((s, d) => {
      val nShards = 8
      val key = md5(concat_ws(":", lit("shard"), col("doc_id").cast("string")))
      val keyed = docs(s, d).select(col("doc_id"), key.as("k"),
        pmod(conv(substring(key, 1, 8), 16, 10).cast("long"), lit(nShards)).as("shard_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard_id")).orderBy(col("k"), col("doc_id"))
      keyed.withColumn("pos", row_number().over(w).cast("long"))
        .select(col("shard_id"), col("pos"), col("doc_id"))
        .orderBy(col("shard_id"), col("pos"))
    }),
    // 89: BPE merge-pair counting — the tokenizer-training primitive
    // (one BPE iteration = "count adjacent symbol pairs across the
    // vocabulary weighted by corpus frequency, merge the top pair").
    // Computing it over the distinct-token vocabulary (not token
    // instances) is the standard trick: pair work scales with
    // |vocab| · avg_len, not corpus tokens — the corpus is touched
    // once for the frequency aggregate and never again.
    "text_bpe" -> ((s, d) => {
      val toks = docs(s, d)
        .select(explode(Text.tokens(col("text"))).as("token"))
        .where(col("token") =!= "")
      val freq = toks.groupBy(col("token")).agg(count(lit(1)).as("f"))
      val pairs = freq.where(length(col("token")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(1, length(token)-1), i -> substring(token, i, 2))")).as("pair"))
      pairs.groupBy(col("pair")).agg(sum(col("f")).as("w"))
        .orderBy(col("w").desc, col("pair")).limit(20)
    }),
    // 89b: the ITERATIVE BPE merge trainer — 8 deterministic merge
    // rounds over the vocabulary (corpus touched once for token
    // frequencies; each round is vocabulary-sized pair-count → best
    // merge (ties to lowest (l,r)) → rewrite). The oracle replays all
    // 8 rounds through a chained-CTE cascade, so the hash proves the
    // whole merge chain — the separator-string replace trick makes
    // both engines' greedy left-to-right merge bit-identical.
    "text_bpe_train" -> ((s, d) =>
      bpeTrainOf(docs(s, d), rounds = 8).orderBy(col("step"))),
    // 89c: trained-tokenizer APPLICATION — the serving half of the
    // trainer: re-encode every document with the 8-round merge
    // table's final segmentation. The segmentation is computed once
    // on the VOCABULARY (the trainer's own final state — corpus never
    // re-touched); each token instance then joins its segment (the
    // vocab table auto-broadcasts at this scale; at a 10M-entry
    // vocab the join falls back to a keyed shuffle of the token
    // stream — the standard re-encode shape). Per-doc output: token
    // and subtoken counts plus a hash of the full in-order subtoken
    // stream, so the oracle proves every document's exact encoding.
    "text_bpe_apply" -> ((s, d) => {
      val doc = docs(s, d)
      val seg = graft.Materialize.once(bpeSegmentsOf(doc, rounds = 8)
        .select(col("token"), size(col("sy")).as("n_sub"),
          array_join(col("sy"), " ").as("seg")))
      val tkc = doc.select(col("doc_id"), Text.tokensOrEmpty(col("text")).as("tk"))
      val tok = tkc.select(col("doc_id"), posexplode(col("tk")))
        .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("token"))
      val agg = tok.join(seg, "token")
        .groupBy(col("doc_id"))
        .agg(sum(col("n_sub")).cast("long").as("n_subtokens"),
          array_join(transform(
            sort_array(collect_list(struct(col("pos"), col("seg")))),
            x => x.getField("seg")), " ").as("stream"))
      tkc.join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"),
          coalesce(col("n_subtokens"), lit(0L)).as("n_subtokens"),
          sha2(coalesce(col("stream"), lit("")), 256).as("seg_sha"))
        .orderBy(col("doc_id"))
    }),
    // 92: span-corruption masking (T5/UL2 denoising-objective prep):
    // deterministically select non-overlapping 3-token spans and
    // collapse each to a sentinel. Spans live inside fixed 8-token
    // blocks — block b of a doc masks iff md5('mask:doc:b') lands
    // under the rate, at offset md5('off:doc:b') % 6 — so masking is
    // embarrassingly parallel (no sequential "skip if overlapping"
    // state), reproducible, and block-local: the same md5-lattice
    // trick the samplers use, applied to positions. Narrow map, zero
    // shuffle; the oracle rebuilds every masked token list and
    // hash-checks the full masked text. ~11% of tokens masked
    // (30% of full blocks × 3/8).
    "doc_mask" -> ((s, d) => {
      val off = "CAST(CAST(conv(substring(md5(concat('off:', CAST(doc_id AS STRING), ':', CAST(b AS STRING))), 1, 8), 16, 10) AS BIGINT) % 6 AS INT)"
      val gate = "CAST(conv(substring(md5(concat('mask:', CAST(doc_id AS STRING), ':', CAST(b AS STRING))), 1, 8), 16, 10) AS BIGINT) % 100 < 30"
      // mirror Text.tokenCount's empty guard: split('') yields [''],
      // but the oracle maps NORM='' (empty or space-only text) to []
      val tok = docs(s, d)
        .select(col("doc_id"), Text.tokensOrEmpty(col("text")).as("tk"))
        .select(col("doc_id"), col("tk"), size(col("tk")).as("n"))
      tok.select(col("doc_id"), col("n"), expr(
        s"""flatten(transform(sequence(0, CAST(greatest(ceil(n / 8.0) - 1, 0) AS INT)),
           |  b -> CASE WHEN n - 8*b >= 8 AND $gate
           |    THEN concat(
           |      slice(tk, 8*b + 1, $off),
           |      array('<extra_id>'),
           |      slice(tk, 8*b + $off + 4, 5 - $off))
           |    ELSE slice(tk, 8*b + 1, least(8, n - 8*b)) END))""".stripMargin).as("mtk"))
        .select(col("doc_id"),
          col("n").cast("long").as("n_tokens"),
          (lit(3L) * ((col("n") - size(col("mtk"))) / 2).cast("long")).as("n_masked"),
          sha2(array_join(col("mtk"), " "), 256).as("masked_sha"))
        .orderBy(col("doc_id"))
    }),
    // 75: cross-document repeated-substring mass (ExactSubstr-style
    // dedup signal): fraction of each doc's 8-token windows that also
    // appear in another document — the positional-duplication measure
    // behind substring-level training-data dedup. Instance-level
    // ngrams; shingle df is a vocabulary-sized aggregate.
    "text_dupsubstr" -> ((s, d) => {
      val tokd = docs(s, d).select(col("doc_id"), Text.tokens(col("text")).as("tk"))
      val inst = tokd.select(col("doc_id"),
        explode(Text.ngramsOf(col("tk"), 8)).as("s"))
      val df8 = inst.groupBy(col("s")).agg(countDistinct(col("doc_id")).as("nd"))
      val dup = inst.join(df8.where(col("nd") >= 2), "s")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
      tokd.select(col("doc_id"),
          when(size(col("tk")) >= 8, size(col("tk")) - 7).otherwise(0)
            .cast("long").as("n_windows"))
        .join(dup, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_windows"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup_windows"),
          round(when(col("n_windows") === 0, 0.0)
            .otherwise(coalesce(col("n_dup"), lit(0L)).cast("double") /
              col("n_windows").cast("double")), 6).as("dup_ratio"))
        .orderBy(col("doc_id"))
    }),
    // 94: exact-substring span REMOVAL — the editing complement of
    // text_dupsubstr (which only measures): every token covered by an
    // 8-token window that also appears in another document is cut, in
    // every document holding it (ExactSubstr-style dedup actually
    // edits the text; the cut-all-occurrences rule is the
    // deterministic, coordination-free variant — keep-one requires a
    // global canonical-occurrence election, which at 100 TB is a
    // separate ownership join, not a per-doc map). Same instance-level
    // ngram machinery and vocabulary-sized df aggregate as
    // text_dupsubstr, plus one per-doc aggregate of duplicated window
    // starts; the edit itself is a narrow HOF map (no shuffle). The
    // oracle rebuilds every edited document and hash-checks it.
    "text_dupcut" -> ((s, d) => {
      val tokd = docs(s, d)
        .select(col("doc_id"), Text.tokensOrEmpty(col("text")).as("tk"))
      // 1-based window starts: window p covers tokens p..p+7
      val inst = tokd.select(col("doc_id"),
        posexplode(Text.ngramsOf(col("tk"), 8)))
        .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("w"))
      val df8 = inst.groupBy(col("w")).agg(countDistinct(col("doc_id")).as("nd"))
      val dup = inst.join(df8.where(col("nd") >= 2), "w")
        .groupBy(col("doc_id")).agg(sort_array(collect_set(col("p"))).as("dps"))
      val joined = tokd.join(dup, Seq("doc_id"), "left")
        .select(col("doc_id"), col("tk"),
          coalesce(col("dps"), array().cast("array<int>")).as("dps"))
      // kept tokens staged as an attribute ref (size + sha both read it)
      val staged = joined.select(col("doc_id"), col("tk"),
        filter(col("tk"), (_, i0) =>
          !exists(col("dps"), p => p <= i0 + 1 && i0 + 1 <= p + 7)).as("kept"))
      staged.select(col("doc_id"),
        size(col("tk")).cast("long").as("n_tokens"),
        (size(col("tk")) - size(col("kept"))).cast("long").as("n_cut"),
        sha2(array_join(col("kept"), " "), 256).as("kept_sha"))
        .orderBy(col("doc_id"))
    }),
    // 94b: KEEP-ONE exact-substring removal — the global
    // canonical-occurrence election #94 documents as the missing
    // variant: each cross-document-duplicated 8-token window's
    // content survives in exactly ONE deterministically elected
    // occurrence (the global min (doc_id, p) — an argmin the window
    // df aggregate already pays for), and is cut everywhere else.
    // Election beats cut on overlap: a token covered by a canonical
    // occurrence is KEPT even if another duplicated window also
    // covers it — that is what makes the elected copy survive intact
    // (the "keep-one" contract) instead of being shredded by
    // overlapping non-canonical windows. Same instance-ngram +
    // vocabulary-df machinery; the ownership election is one extra
    // min(struct) in the same aggregate, per-doc marks are two
    // position lists, the edit stays a narrow HOF map. The oracle
    // re-elects every canonical occurrence and rebuilds every edited
    // document.
    "text_dupcut_keepone" -> ((s, d) =>
      dupcutKeepOneOf(docs(s, d)).orderBy(col("doc_id"))),
    // 111: Gopher-rules composite quality filter — the per-rule audit
    // view of the Gopher paper's heuristics (length band, mean token
    // length band, alphabetic-token fraction, minimum stopword mass,
    // top-token and duplicate-bigram caps), each surfaced as its own
    // boolean so a dataset release can report WHICH rule rejected each
    // doc, not just a pass bit. Every rule compares exact integers
    // (tot_len >= 3n instead of tot_len/n >= 3.0, 5·top <= n instead
    // of top/n <= 0.2), so no double ever crosses an engine boundary.
    // Narrow per-doc array math — zero shuffle at any corpus size.
    "corpus_gopher" -> ((s, d) => {
      val staged = docs(s, d)
        .select(col("doc_id"), Text.tokensOrEmpty(col("text")).as("tk"))
        .withColumn("bg", Text.bigramsOf(col("tk")))
      val enArr = array(Text.stopwords.head._2.map(lit): _*)
      val m = staged.select(col("doc_id"),
        size(col("tk")).cast("long").as("n"),
        aggregate(col("tk"), lit(0L), (a, t) => a + length(t)).as("tot_len"),
        size(filter(col("tk"), t => t.rlike("[a-z]"))).cast("long").as("n_alpha"),
        size(filter(col("tk"), t => array_contains(enArr, t))).cast("long").as("stop_hits"),
        Text.topTokenCount(col("tk")).cast("long").as("top_n"),
        size(col("bg")).cast("long").as("n_bg"),
        size(array_distinct(col("bg"))).cast("long").as("n_bg_d"))
      m.select(col("doc_id"), col("n").as("n_tokens"),
          (col("n") >= 30 && col("n") <= 100000).as("r_len"),
          (col("tot_len") >= lit(3L) * col("n") &&
            col("tot_len") <= lit(10L) * col("n") && col("n") > 0).as("r_meanlen"),
          (lit(5L) * col("n_alpha") >= lit(4L) * col("n") && col("n") > 0).as("r_alpha"),
          (col("stop_hits") >= 2).as("r_stop"),
          (lit(5L) * col("top_n") <= col("n")).as("r_toptok"),
          ((col("n_bg") - col("n_bg_d")) * 5 <= col("n_bg")).as("r_dupbg"))
        .withColumn("pass", col("r_len") && col("r_meanlen") && col("r_alpha") &&
          col("r_stop") && col("r_toptok") && col("r_dupbg"))
        .orderBy(col("doc_id"))
    }),
    // 128: trained linear quality classifier — the Gopher rule set
    // distilled into a hard-sigmoid logistic probe over 1e-6-grid
    // integer text features; 8 deterministic full-batch gradient
    // steps, every score oracle-replayed including the training loop
    // (Classify's scaladoc has the determinism discipline).
    "corpus_classify" -> ((s, d) =>
      Classify.scores(docs(s, d)).orderBy(col("doc_id"))),
    // 128b: classifier calibration report — the reliability curve for
    // #128's trained quality gate: bucket the corpus by score decile
    // and report per bucket the observed positive-label rate next to
    // the mean score (well-calibrated ⇔ the two track). The report a
    // threshold/τ decision is made with; score mass re-aggregated on
    // the 1e-6 grid as exact longs (order-free) so both engines agree
    // to the last digit. One 10-row aggregate over the scored frame.
    "classify_calibration" -> ((s, d) => {
      val sc = Classify.scores(docs(s, d))
        .select(col("doc_id"), col("score"), col("label"))
        .withColumn("bucket",
          least(floor(col("score") * 10.0), lit(9.0)).cast("long"))
        .withColumn("qs",
          floor(col("score") * 1000000.0 + 0.5).cast("long"))
      sc.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"),
          sum(col("qs")).as("qsum"))
        .select(col("bucket"), col("n_docs"), col("n_pos"),
          round(col("n_pos").cast("double") /
            col("n_docs").cast("double"), 6).as("pos_rate"),
          round(col("qsum").cast("double") /
            (col("n_docs").cast("double") * 1000000.0), 6).as("mean_score"))
        .orderBy(col("bucket"))
    }),
    // 62: bigram-LM fluency scoring (KenLM-class quality filter): train
    // add-one-smoothed bigram stats on the corpus itself, score each
    // doc by mean log P(w2|w1). Counts are vocabulary-sized aggregates;
    // the per-doc mean goes through exact decimal summation (order-
    // independent), so the oracle replays it despite double logs.
    "text_lmscore" -> ((s, d) => lmScores(docs(s, d)).orderBy(col("doc_id"))),
    // 105: CCNet-style perplexity bucketing — the selection step the
    // CCNet pipeline runs on top of a KenLM-class score: the corpus is
    // split into head/middle/tail thirds by LM fluency and only
    // head+middle survive to training. Bucketing is by SCORE, not by
    // per-row rank: the per-doc score quantizes to the 1e-6 long grid,
    // a (score -> count) histogram accumulates map-side (output
    // bounded by the score RANGE, not the corpus size), one small
    // window over the histogram assigns bucket = (3 · #docs-strictly-
    // better) div n, and docs join back on the score key — so there is
    // no corpus-wide single-partition rank window anywhere, and ties
    // on the grid share a bucket deterministically on every engine.
    "text_ccnet" -> ((s, d) => {
      // lmScores feeds THREE consumers (histogram, count, join-back):
      // materialize the doc-count-sized score table once or the whole
      // scoring join re-executes per branch (the multi-consumer rule)
      val sc = graft.Materialize.once(lmScores(docs(s, d)))
      val si = sc.select(col("doc_id"), col("avg_logprob"),
        round(col("avg_logprob") * 1e6).cast("long").as("s_i"))
      val hist = si.groupBy(col("s_i")).agg(count(lit(1)).as("c"))
      val wcum = org.apache.spark.sql.expressions.Window
        .orderBy(col("s_i").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val n = broadcast(sc.agg(count(lit(1)).as("n")))
      val bucketed = hist
        .withColumn("cum", coalesce(sum(col("c")).over(wcum), lit(0L)))
        .crossJoin(n)
        .select(col("s_i"), expr("(cum * 3) div n").cast("int").as("bk"))
      si.join(bucketed, "s_i")
        .select(col("doc_id"), col("avg_logprob"),
          when(col("bk") === 0, "head").when(col("bk") === 1, "middle")
            .otherwise("tail").as("ppl_bucket"),
          (col("bk") < 2).as("keep"))
        .orderBy(col("doc_id"))
    }),
    // 106: SoftDeDup-style duplication-aware sampling — instead of
    // hard-dropping near-dup copies (corpus_clean's keep-canonical),
    // every member of a near-dup cluster keeps with probability
    // 1/|cluster| on the md5 lattice, so each cluster contributes ~1
    // expected doc while singleton docs ride through whole — the soft
    // down-weighting the SoftDeDup line of work argues preserves tail
    // knowledge that hard dedup deletes. Deterministic (same lattice
    // as #41: reproducible on any cluster layout, independent of the
    // sampling salts used elsewhere). Cost beyond the cluster step
    // itself: one size aggregate + one size join — both cluster-keyed.
    "sample_softdedup" -> ((s, d) => {
      val doc = docs(s, d)
      val labels = Dedup.clusters(Dedup.jaccardPairs(doc, k = 3, threshold = 0.5))
      // (doc_id, cluster_id) feeds both the size aggregate and the
      // keep join — materialize once so the corpus-wide left join
      // doesn't run twice (ids-only, ~16 bytes/doc)
      val withC = graft.Materialize.once(doc.select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id")))
      val sizes = withC.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
      withC.join(sizes, "cluster_id")
        .where(Sampling.hashBucket(col("doc_id"), "soft") <
          floor(lit(Sampling.Buckets.toDouble) / col("cluster_size")).cast("long"))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
        .orderBy(col("doc_id"))
    }),
    // 40: PII redaction pass — per-doc match counts + fingerprint of
    // the scrubbed text (proves the replacement itself, not just the
    // counts, agrees across engines)
    "text_redact" -> ((s, d) => docs(s, d).select(
      col("doc_id"),
      Text.countMatches(col("text"), Text.emailRe).cast("long").as("n_emails"),
      Text.countMatches(col("text"), Text.ipv4Re).cast("long").as("n_ipv4"),
      Text.countMatches(col("text"), Text.longDigitsRe).cast("long").as("n_digit_runs"),
      sha2(Text.redactPii(col("text")), 256).as("fp_redacted"))
      .orderBy(col("doc_id"))),
    // 34: document fingerprints (sha-256 full + 64-bit prefix;
    // xxhash64 fingerprint64 is spec-pinned, not oracle-able)
    "text_fingerprint" -> ((s, d) => docs(s, d).select(
      col("doc_id"),
      Text.fingerprint(col("text")).as("fp_sha256"),
      substring(Text.fingerprint(col("text")), 1, 16).as("fp_prefix"))
      .orderBy(col("doc_id"))),
    // 35: multimodal plumbing (rows-only; stub codec is Spark-side only)
    "mm_features" -> ((s, d) =>
      Multimodal.featureSummary(Multimodal.mediaFromDocuments(docs(s, d)))
        .orderBy(col("media_id"))),
    // 65: multimodal resize + frame-sample (decode -> 8x8 NN thumbnail
    // + stride-h/4 row sample; integer index mapping and sums, so the
    // oracle replays both transforms over the predicted pixels)
    "mm_resize" -> ((s, d) =>
      Multimodal.thumbSummary(Multimodal.mediaFromDocuments(docs(s, d)))
        .orderBy(col("media_id"))),
    // 127: perceptual image near-dup (average-hash) — decode the PNG,
    // 8x8 thumbnail, strictly-above-mean bit per pixel, SimHash-style
    // 16-bit chunk banding for candidates, exact hamming <= 3 verify.
    // The documents table's planted near-dup texts become planted
    // near-dup IMAGES through the deterministic media synthesis, so
    // the key returns real pairs; the oracle replays the hash from the
    // PREDICTED decoded pixels (the mm_resize thumbnail mapping), so a
    // broken decode/resize/hash step breaks the match.
    "mm_dedup" -> ((s, d) =>
      Multimodal.phashPairs(Multimodal.mediaFromDocuments(docs(s, d)))
        .orderBy(col("media_a"), col("media_b"))),
    // 127b: recall audit for the perceptual aHash index — truth is
    // the brute-force hamming join over the decoded images' aHashes
    // WITH the operator's own degenerate-pair brightness verify (the
    // verify is pair semantics, not candidate generation, so it
    // belongs to the truth set too); any missed pair is therefore an
    // occupancy-cap drop, exactly the term the audit measures. The
    // flat-image crowd (degenerate chunk values) makes this the cap's
    // hottest customer among the banded indexes.
    "mm_recall" -> ((s, d) => {
      val media = Multimodal.mediaFromDocuments(docs(s, d))
      val hashed = graft.Materialize.once(Multimodal.avgHash(media))
      def degen(h: org.apache.spark.sql.Column) =
        least(bit_count(h), lit(64) - bit_count(h)) <=
          Multimodal.phashDegenerateBits
      val exact = graft.Materialize.once(
        hashed.select(col("media_id").as("doc_a"), col("phash").as("h_a"),
            col("ptot").as("t_a"))
          .crossJoin(hashed.select(col("media_id").as("doc_b"),
            col("phash").as("h_b"), col("ptot").as("t_b")))
          .where(col("doc_a") < col("doc_b") &&
            bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= 3)
          .where(!(degen(col("h_a")) && degen(col("h_b"))) ||
            abs(col("t_a") - col("t_b")) <= Multimodal.phashBrightnessTol)
          .select(col("doc_a"), col("doc_b")))
      val found = graft.Materialize.once(Multimodal.phashPairs(media)
        .select(col("media_a").as("doc_a"), col("media_b").as("doc_b")))
      recallReport(exact, found)
    }),
    // 114: video modality — multi-frame GVID container (real PNG
    // frames, 64 text bytes each) walked with keyframe-stride
    // sampling: only every stride-th frame is inflated, the rest are
    // seeked past via the length prefixes (decode cost ∝ sampled
    // frames — the point of keyframe sampling at scale). Outputs are
    // exact integers (sampled pixel mass + Σ|Δ| motion proxy), so the
    // oracle predicts them from the source bytes; container byte
    // counts stay out (deflate-dependent), like mm_features.
    "mm_video" -> ((s, d) =>
      Multimodal.videoSummary(Multimodal.videoFromDocuments(docs(s, d))).toDF()
        .orderBy(col("media_id"))),
    // 41: deterministic stratified sampling — per-language Bernoulli
    // rates off a salted md5 bucket (reproducible on any cluster
    // layout; oracle replays the hash arithmetic exactly)
    "sample_stratified" -> ((s, d) =>
      Sampling.stratifiedSample(docs(s, d), col("doc_id"), col("lang"),
          rates = Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.3),
          defaultRate = 0.1)
        .select(col("doc_id"), col("lang"), col("source"), col("bucket"))
        .orderBy(col("doc_id"))),
    // 51: offset-quota packing of the #42 chunk stream — 256-token
    // packs, 16 shards; per-pack chunk/token rollup
    "chunk_pack" -> ((s, d) =>
      packTable(s, d).orderBy(col("shard"), col("pack_id"))),
    // 145: packing-efficiency report — the dataset-card number a
    // trainer checks before burning compute: per shard, how full the
    // fixed-budget packs actually are (fill ppm), how many packs
    // overran the budget by their one allowed chunk, and the worst
    // pack. Pure integer rollup of the #51 pack assignment — two
    // keyed aggregations, |shards| rows out, exact BIGINT throughout.
    "pack_stats" -> ((s, d) => {
      packTable(s, d)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_packs"),
          sum(col("n_chunks")).cast("long").as("n_chunks"),
          sum(col("pack_tokens")).cast("long").as("total_tokens"),
          max(col("pack_tokens")).as("max_pack_tokens"),
          sum(when(col("pack_tokens") > 256, 1L).otherwise(0L))
            .as("n_overrun"))
        .withColumn("fill_ppm",
          expr("(total_tokens * 1000000) div (n_packs * 256)"))
        .orderBy(col("shard"))
    }),
    // 50: benchmark decontamination — corpus docs sharing any 8-token
    // shingle with the held-out eval slice (doc_id % 20 == 7), with
    // the shared-shingle count
    "decontaminate" -> ((s, d) => {
      val doc = docs(s, d)
      Decontaminate.flag(
          doc.where(col("doc_id") % 20 =!= 7),
          doc.where(col("doc_id") % 20 === 7), k = 8)
        .orderBy(col("doc_id"))
    }),
    // 67b: per-group cap — at most 50 docs per language by hash rank
    // (exact output size per group, reproducible pick)
    // skew-safe form: groups beyond 10·k rows are pre-thinned on the
    // same md5 ordering before the ranked window (row-identical to the
    // plain cap — the oracle replays the unfiltered rank)
    "sample_percap" -> ((s, d) =>
      Sampling.capPerGroupSkewSafe(docs(s, d).select(col("doc_id"), col("lang")),
          col("doc_id"), col("lang"), k = 50)
        .select(col("doc_id"), col("lang"), col("rk"))
        .orderBy(col("doc_id"))),
    // 80: weighted sampling without replacement — 200 docs picked
    // proportionally to n_chars (the quality/length-weighted curation
    // draw); deterministic A-ES −ln(u)/w keys replayed by the oracle
    "sample_weighted" -> ((s, d) =>
      Sampling.weightedSample(docs(s, d).select(col("doc_id"), col("lang"),
          col("n_chars")), col("doc_id"), col("n_chars"), k = 200)
        .orderBy(col("wkey").asc, col("doc_id"))),
    // 48: mixture re-weighting — downsample each language to an equal
    // 20% share of total char mass (en is ~43% of the corpus and gets
    // hash-downsampled; under-budget languages pass through whole)
    "sample_mixture" -> ((s, d) =>
      Sampling.mixtureSample(docs(s, d), col("doc_id"), col("lang"),
          col("n_chars"), shares = Map.empty, defaultShare = 0.2)
        .select(col("doc_id"), col("lang"), col("source"), col("bucket"))
        .orderBy(col("doc_id"))),
    // 144: DoReMi-style domain reweighting — per-source excess loss
    // (corpus-mean bigram-LM fluency minus the domain's) drives 3
    // linearized multiplicative-weight rounds on the exact integer
    // grid; learned weights become per-domain lattice keep rates at a
    // 50%-doc budget. Docs too short to carry a bigram have no LM
    // score and sit outside the mixture (both engines drop them in
    // the same inner join). |domains|-row update frame + broadcast
    // thresholds + zero-shuffle hash filter at any corpus size.
    "sample_doremi" -> ((s, d) => {
      val doc = docs(s, d)
      val scored = lmScores(doc).select(col("doc_id"),
        round(col("avg_logprob") * 1e6).cast("long").as("s_mi"))
      // doremiSample consumes its input twice (the domain aggregate
      // and the final lattice-filter join); without this the whole
      // lmscore scoring join would execute twice (the text_ccnet
      // materialization rule)
      val src = graft.Materialize.once(
        doc.select(col("doc_id"), col("source")).join(scored, "doc_id"))
      Sampling.doremiSample(src, col("doc_id"), col("source"), col("s_mi"))
        .select(col("doc_id"), col("source"), col("excess_mi"), col("w_mi"),
          col("thr"), col("bucket"))
        .orderBy(col("doc_id"))
    }),
    // 101: temperature-flattened mixture (mT5/UniMax family) — τ=2
    // square-root flattening of the language distribution at a 50%
    // char budget: head languages downsample toward the flattened
    // share, tail languages ride through whole. See
    // Sampling.temperatureSample for the cross-engine determinism
    // argument (sqrt + 1e-6 grid + order-free BIGINT normalizer).
    "sample_temperature" -> ((s, d) =>
      Sampling.temperatureSample(docs(s, d), col("doc_id"), col("lang"),
          col("n_chars"), tau = 2.0, budgetFrac = 0.5)
        .select(col("doc_id"), col("lang"), col("source"), col("bucket"))
        .orderBy(col("doc_id"))),
    // 116: UniMax epoch-capped budget allocation — the successor to
    // #101's temperature flattening: a 50% char budget distributed as
    // uniformly as possible with no language repeating more than 2
    // epochs; the water-filling breakpoint decided by one
    // cross-multiplied BIGINT window rule (no division near the
    // decision), uncapped languages split the remainder equally.
    // Exact integers end-to-end; the oracle replays the allocation.
    "sample_unimax" -> ((s, d) =>
      Sampling.unimaxAllocation(docs(s, d), col("lang"), col("n_chars"),
          maxEpochs = 2, budgetFrac = 0.5)
        .select(col("group").as("lang"), col("mass"), col("rank"),
          col("capped"), col("budget"), col("epochs_bp"))),
    // 96: winnowing fingerprint selection (Schleimer/Wilkerson/Aiken
    // 2003, the MOSS algorithm): 4-token grams hashed to a 40-bit
    // sha-256 prefix; a w=4 sliding window selects each window's
    // minimum hash, rightmost position on ties — guaranteed-gap local
    // fingerprints at ~2/(w+1) density, the robust alternative to
    // fixed-stride sampling for overlap/plagiarism detection (any
    // shared substring of >= w+k-1 tokens shares a fingerprint). The
    // argmin-with-rightmost-tiebreak packs into ONE window min:
    // key = h·2^20 + (2^20−1−pos), so min(key) over the frame IS
    // (min h, max pos); decode afterwards. Trailing windows are
    // frame-clipped (suffix windows still select) — a documented
    // deviation from the paper's full-windows-only loop, deterministic
    // on both engines. Scale shape: one shuffle (the per-doc window
    // sort, WindowExec spills); positions bounded < 2^20 tokens/doc.
    "text_winnow" -> ((s, d) =>
      winnowFingerprints(docs(s, d)).orderBy(col("doc_id"), col("pos"))),
    // 99b: MOSS's detection step over the winnowed index — document
    // pairs sharing >= 3 selected fingerprints, scored by
    // shared/min(|fp_a|,|fp_b|). THE scale payoff of winnowing: the
    // inverted index holds ~2/(w+1) of the grams, and fingerprints in
    // more than dfCap=50 docs are dropped before the self-join
    // (boilerplate guard — MOSS's "ignore overly-common fingerprints"
    // rule), so hot n-grams never generate candidate pairs. One
    // fp-keyed self-join, pair work bounded by Σ df² over df <= 50.
    "winnow_pairs" -> ((s, d) => {
      val fps = graft.Materialize.once(
        winnowFingerprints(docs(s, d)).select(col("doc_id"), col("fp")).distinct())
      // materialized ONCE: the df-capped index feeds the per-doc totals
      // AND both self-join sides — un-truncated, the histogram join
      // re-ran per reference (r18-opt)
      val kept = graft.Materialize.once(fps.join(
        fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
          .where(col("df") <= 50).select(col("fp")), "fp"))
      val nf = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
      val shared = kept.select(col("fp"), col("doc_id").as("doc_a"))
        .join(kept.select(col("fp"), col("doc_id").as("doc_b")), "fp")
        .where(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared"))
        .where(col("shared") >= 3)
      shared
        .join(nf.select(col("doc_id").as("doc_a"), col("n_fp").as("n_a")), "doc_a")
        .join(nf.select(col("doc_id").as("doc_b"), col("n_fp").as("n_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("shared"), col("n_a"), col("n_b"),
          round(col("shared").cast("double") /
            least(col("n_a"), col("n_b")).cast("double"), 6).as("score"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),
    // 97: DSIR-style importance resampling (Xie et al., Data Selection
    // via Importance Resampling): hashed unigram features — 64 md5
    // buckets, stock-function hashing so any engine reproduces
    // membership — with target = the de/fr slice; per-bucket importance
    // weight ln((tgt+1)/(raw+1)) on the exact 1e-6 integer grid; per-doc
    // score = Σ bucket-count × w_i in order-free BIGINT; top-50 by
    // (score, doc_id) via TakeOrdered, no global sort. Scale shape: the
    // weight table is 64 rows (broadcast); the corpus is scanned twice
    // (count pass + scoring pass) — exactly DSIR's two passes — each a
    // narrow explode + partial-agg shuffle. Docs with zero non-empty
    // tokens have no feature mass and drop out by construction.
    "sample_importance" -> ((s, d) => {
      val toks = docs(s, d).select(col("doc_id"), col("lang"),
          explode(Text.tokens(col("text"))).as("tok"))
        .where(col("tok") =!= "")
      val bucket =
        conv(substring(md5(concat(lit("dsir:"), col("tok"))), 1, 8), 16, 10)
          .cast("long") % 64
      val bk = toks.select(col("doc_id"), col("lang"), bucket.as("b"))
      val wts = bk.groupBy(col("b"))
        .agg(count(lit(1)).as("raw"),
          sum(when(col("lang").isin("de", "fr"), 1L).otherwise(0L)).as("tgt"))
        .select(col("b"),
          round(round(log((col("tgt").cast("double") + 1.0) /
            (col("raw").cast("double") + 1.0)), 6) * 1e6)
            .cast("long").as("w_i"))
      bk.join(broadcast(wts), "b")
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_toks"), sum(col("w_i")).as("score_i"))
        .orderBy(col("score_i").desc, col("doc_id")).limit(50)
    }),
    // 98: per-source dataset-card report — the reporting query every
    // corpus release ships: doc/token masses, language spread, exact
    // mean/median length, and the count of docs whose normalized text
    // duplicates ANY other doc corpus-wide. One fingerprint-partition
    // window (shuffle on the normalized text — at 100 TB swap the
    // partition key for sha2(normalize) to bound key width; same
    // grouping) + one per-source partial-agg shuffle of |sources| rows.
    // 113: bounded-memory heavy hitters — the native Misra–Gries
    // TypedImperativeAggregate (expressions.SpaceSavingAgg, k=8 slots)
    // over the token stream, hash-checked via its GUARANTEES against
    // the exact counts (the q_approx pattern: the kept set is
    // layout-dependent, the guarantees are not): every top-10 token
    // gets bound_ok (estimate is a lower bound within n/(k+1)) and
    // presence_ok (any token over the n/(k+1) threshold is in the
    // summary). At 100 TB the summary is k slots per partition merged
    // map-side — the exact groupBy beside it is the test-scale
    // verifier, not the production path.
    // 113c: count-min-sketch frequency estimates — the MERGEABLE
    // fixed-size complement of #113's Misra–Gries summary (MG keeps
    // WHICH tokens are heavy; CM answers "how often is token t" for
    // any t from constant state). The sketch is the native CmsAgg
    // (4 seeds × 4096 sha-derived buckets = 128 KiB, map-side-added
    // partials, broadcast to the probe); probes are the exact top-10
    // tokens, emitting exact vs estimate vs overestimate — every
    // counter (collisions included) is sha-replayed by the oracle,
    // so the hash proves the sketch arithmetic itself, not just a
    // guarantee boolean. The exact groupBy beside it is the
    // test-scale verifier; at 100 TB the sketch is the production
    // path (the exact table is itself a vocabulary-sized shuffle).
    "text_cms" -> ((s, d) => {
      val toks = graft.Materialize.once(
        docs(s, d).select(explode(Text.tokens(col("text"))).as("token"))
          .where(col("token") =!= ""))
      val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("exact"))
      val top = exact.orderBy(col("exact").desc, col("token")).limit(10)
      val sketch = toks
        .select(explode(cmsIndices(col("token"))).as("idx"))
        .agg(graft.expressions.native.cmsAgg(col("idx"),
          CMS_DEPTH * CMS_WIDTH).as("sk"))
      top.crossJoin(broadcast(sketch))
        .select(col("token"), col("exact"),
          graft.expressions.native.cmsEstimate(col("sk"),
            cmsIndices(col("token"))).as("estimate"))
        .withColumn("over", col("estimate") - col("exact"))
        .orderBy(col("token"))
    }),
    "text_heavyhitters" -> ((s, d) => {
      val toks = docs(s, d).select(explode(Text.tokens(col("text"))).as("token"))
        .where(col("token") =!= "")
      val K = 8
      val summary = broadcast(toks.agg(
        graft.expressions.native.heavyHitters(col("token"), K).as("mg"),
        count(lit(1)).as("n")))
      val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      val wq = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("token"))
      val top = exact.withColumn("rk", row_number().over(wq)).where(col("rk") <= 10)
      val est = element_at(col("mg"), col("token"))
      top.crossJoin(summary)
        .select(col("rk").cast("long").as("rk"), col("token"), col("cnt"),
          (est.isNull ||
            (est <= col("cnt") &&
              est * (K + 1) >= col("cnt") * (K + 1) - col("n"))).as("bound_ok"),
          (!(col("cnt") * (K + 1) > col("n")) || est.isNotNull).as("presence_ok"))
        .orderBy(col("rk"))
    }),
    // 112: per-source n-gram diversity report (distinct-n / type-token
    // ratios for n = 1..3 — the lexical-diversity metric dataset cards
    // report and generation-quality evaluations use as self-BLEU's
    // cheap cousin). Per n: one (source, gram) partial aggregate, then
    // per-source distinct = row count and instances = Σcnt from that
    // SAME aggregate — no second corpus pass, no countDistinct shuffle
    // of raw instances. ~|sources|·3 output rows.
    "corpus_diversity" -> ((s, d) => {
      // tokenized docs feed three union branches: materialize once or
      // the corpus scan + normalize + tokenize executes per branch
      val tokd = graft.Materialize.once(docs(s, d).select(col("source"),
        Text.tokensOrEmpty(col("text")).as("tk")))
      val perN = (1 to 3).map { n =>
        tokd.select(col("source"), explode(Text.ngramsOf(col("tk"), n)).as("g"))
          .groupBy(col("source"), col("g")).agg(count(lit(1)).as("cnt"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_distinct"), sum(col("cnt")).as("n_instances"))
          .select(col("source"), lit(n).as("n"), col("n_instances"), col("n_distinct"),
            round(col("n_distinct").cast("double") / col("n_instances").cast("double"), 6)
              .as("ttr"))
      }
      perN.reduce(_.unionAll(_)).orderBy(col("source"), col("n"))
    }),
    "corpus_stats" -> ((s, d) => {
      val wfp = org.apache.spark.sql.expressions.Window
        .partitionBy(Text.normalize(col("text")))
      docs(s, d).select(col("source"), col("lang"), col("n_chars"),
          Text.tokenCount(col("text")).as("n_toks"),
          count(lit(1)).over(wfp).as("n_same"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).cast("long").as("n_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          round(avg(col("n_chars").cast("double")), 6).as("mean_chars"),
          round(expr("percentile(n_chars, 0.5)"), 6).as("p50_chars"),
          sum(when(col("n_same") > 1, 1L).otherwise(0L)).as("dup_docs"))
        .orderBy(col("source"))
    }),
    // 42: context-window chunking — 64-token windows, 16-token overlap
    // (narrow map + explode; no shuffle)
    "doc_chunk" -> ((s, d) =>
      Text.chunk(docs(s, d).select(col("doc_id"), col("text")), col("text"),
          chunkSize = 64, overlap = 16)
        .select(col("doc_id"), col("chunk_start").cast("long").as("chunk_start"),
          col("chunk_text"), col("n_tokens").cast("long").as("n_tokens"))
        .orderBy(col("doc_id"), col("chunk_start"))))

  /** DuckDB oracles. Shared normalization: lower+trim+collapse-ws. */
  private val NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  /** sft_examples parameters, interpolated into BOTH the Spark call
    * and the oracle SQL so the two sides cannot drift. nPrompt =
    * SFT_PROMPT + 2 role markers. */
  private val SFT_PROMPT = 8
  private val SFT_MAXLEN = 96

  /** doc_fim parameters, interpolated into BOTH engines: the FIM rate
    * (percent of documents re-rendered PSM) — 50 is the published
    * FIM-rate sweet spot (Bavarian et al. 2022 §5). */
  private val FIM_RATE = 50

  /** dpo_pairs parameters, interpolated into BOTH engines: sha-bucket
    * count (group-size bound — the per-prompt stand-in), pairs per
    * group, and the minimum score margin a pair must clear. */
  private val DPO_BUCKETS = 4
  private val DPO_TOPK = 2
  private val DPO_MARGIN = 0.05

  /** embed_outliers z-score threshold (flag below mean − z·std). */
  private val OUTLIER_Z = 2.0

  /** corpus_stitch context token budget, interpolated into BOTH
    * engines. */
  private val CTX_STITCH = 256

  /** text_watermark parameters — aliases of [[graft.operators
    * .Watermark]]'s constants (one definition, interpolated into the
    * oracle SQL so the engines cannot drift). */
  private val WM_GAMMA_PCT = graft.operators.Watermark.GammaPct
  private val WM_Z = graft.operators.Watermark.ZThresh
  private val WM_MIN = graft.operators.Watermark.MinScored

  /** text_cms sketch geometry: 4 seeds × 16^3 sha-derived buckets
    * (128 KiB of counters). Interpolated into the oracle, which
    * replays buckets as hex-prefix STRINGS (injective to the engine's
    * flat indices — identical counters, collisions included). */
  private val CMS_DEPTH = 4
  private val CMS_HEX = 3
  private val CMS_WIDTH = 1 << (CMS_HEX * 4)

  /** The flat (seed, bucket) counter indices of one token:
    * idx_i = i·WIDTH + int(first CMS_HEX hex chars of
    * sha256(i || "|" || token)). */
  private def cmsIndices(token: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    array((0 until CMS_DEPTH).map { i =>
      (lit(i.toLong * CMS_WIDTH) +
        conv(substring(sha2(concat(lit(s"$i|"), token), 256), 1, CMS_HEX),
          16, 10).cast("long"))
    }: _*)

  /** Shared dedup_bloom / dedup_bloom_indexed oracle: Bloom membership
    * replayed over hex-prefix position STRINGS (injective to the
    * engine's parsed bit indices — identical membership outcomes,
    * false positives included). Fixture = dedup_incremental's
    * (corpus ≤ 450; batch = fresh > 450 ∪ 50 exact re-ingests). */
  private lazy val BLOOM_SQL: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id <= 450
       |), batch AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id > 450
       |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id <= 50
       |), cbits AS (
       |  SELECT DISTINCT substr(sha256(CAST(i AS VARCHAR) || '|' || sha256($NORM)),
       |    1, ${Dedup.bloomHexChars}) AS b
       |  FROM corpus CROSS JOIN range(0, ${Dedup.bloomHashes}) r(i)
       |), bbits AS (
       |  SELECT doc_id, substr(sha256(CAST(i AS VARCHAR) || '|' || sha256($NORM)),
       |    1, ${Dedup.bloomHexChars}) AS b
       |  FROM batch CROSS JOIN range(0, ${Dedup.bloomHashes}) r(i)
       |)
       |SELECT doc_id, bool_and(b IN (SELECT b FROM cbits)) AS maybe_dup
       |FROM bbits GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** text_normalize planted fixtures (negative doc_ids), shared by the
    * Spark union and the oracle VALUES so the two sides cannot drift:
    * NFD combining marks, the zero-width family, mojibake (incl. a
    * deliberately-unrepaired Ã¯ — the table is the common-corruption
    * list, not a decoder), C0 controls + CRLF/CR, and the
    * scrub-then-compose ordering case (e + ZWNJ + combining acute
    * composes to é only if the scrub runs before NFC). Row -5 pins
    * the à-mojibake boundary: "Ã"+NBSP repairs to à while
    * "Ã "+ASCII-space (legitimate word-final Ã) is left intact. */
  // Row -6 is the Unicode-VERSION tripwire (Kernels.nfc's coupling
  // note): Hangul jamo composition (L+V+T and LV+T -> 각), Cyrillic
  // и+breve -> й and Greek ι+diaeresis+acute -> ΐ (the composition
  // paths beyond Latin), canonical REORDERING under composition
  // (c + acute(ccc 230) + cedilla(ccc 202) must reorder before ç can
  // compose), a composition EXCLUSION (क + nukta must STAY decomposed
  // — U+0958 is excluded), and U+1DFA (combining dot below left,
  // ccc 218, added in Unicode 12.0): an engine whose Unicode data
  // predates it treats the ccc as 0 and skips the reorder after
  // acute — a JDK/utf8proc data-table divergence on any of these
  // classes trips the oracle hash instead of passing silently.
  private val normPlanted: Seq[(Long, String)] = Seq(
    -6L -> ("jamo \u1100\u1161\u11A8 lvt \uAC00\u11A8 cyr \u0438\u0306 " +
      "greek \u03B9\u0308\u0301 reorder c\u0301\u0327 excl \u0915\u093C " +
      "ccc218 e\u0301\u1DFA"),
    -5L -> "IRMÃ DELE voilÃ\u00A0tout",
    -4L -> "ctrlchars\r\nnext\rline e‌́",
    -3L -> "itâ€™s â€œquotedâ€¦ Ã©lan â€” Ã¼ber naÃ¯ve",
    -2L -> "zero​width‌and‍joiners⁠here﻿",
    -1L -> "Café au thé")

  /** The corpus_pretrain WITH-cascade through the `man` manifest CTE —
    * shared by the corpus_pretrain and pretrain_examples oracles (one
    * definition of the nine-stage pipeline, two final selects). */
  private lazy val PRETRAIN_RAW: String = {
      val vals = pretrainPlanted.map { case (id, t, lg) =>
        s"(CAST($id AS BIGINT), ${sqlStr(t)}, ${sqlStr(lg)})" }.mkString(",\n    ")
      val bw = graft.operators.Lines.badwords
        .map(w => s"'${w.replace("'", "''")}'").mkString("[", ", ", "]")
      val fixed =
        s"""nfc_normalize(regexp_replace(
           |      replace(replace($MOJ_CHAIN, chr(13) || chr(10), chr(10)), chr(13), chr(10)),
           |      '${graft.functions.Text.scrubRe}', '', 'g'))""".stripMargin
      val raw = s"""WITH RECURSIVE psrc AS (
         |  SELECT doc_id, text, lang FROM documents
         |  UNION ALL
         |  SELECT * FROM (VALUES $vals) AS v(doc_id, text, lang)
         |), pfx AS (
         |  SELECT doc_id, $fixed AS text, lang FROM psrc
         |), pbw AS (
         |  SELECT doc_id, text FROM pfx
         |  WHERE len(list_filter(
         |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END,
         |    x -> list_contains($bw, x))) = 0
         |), d0 AS (
         |  SELECT doc_id, text FROM pbw
         |  WHERE NOT contains(lower(text), 'lorem ipsum')
         |    AND NOT contains(text, '{')
         |), ls AS (
         |  SELECT doc_id, string_split(text, chr(10)) AS ll FROM d0
         |), lln AS (
         |  SELECT doc_id, CAST(i AS INT) AS line_idx,
         |    ll[CAST(i AS INT) + 1] AS line
         |  FROM ls, unnest(range(0, len(ll))) AS u(i)
         |), flt AS (
         |  SELECT doc_id, line_idx, line,
         |    regexp_replace(lower(trim(line)), '\\s+', ' ', 'g') AS lnorm
         |  FROM lln
         |  WHERE (CASE WHEN trim(line) = '' THEN 0
         |         ELSE len(string_split_regex(trim(line), ' +')) END) >= 3
         |    AND NOT contains(lower(line), 'javascript')
         |), lrk AS (
         |  SELECT *, row_number() OVER (PARTITION BY lnorm
         |    ORDER BY doc_id, line_idx) AS rn
         |  FROM flt
         |), lout AS (
         |  SELECT doc_id,
         |    string_agg(line, chr(10) ORDER BY line_idx) AS text
         |  FROM lrk WHERE rn = 1 GROUP BY doc_id
         |), sp AS (
         |  SELECT doc_id, string_split_regex(text, '\\n{2,}') AS ps FROM lout
         |), ppr AS (
         |  SELECT doc_id, CAST(i AS INT) AS par_idx,
         |    ps[CAST(i AS INT) + 1] AS par
         |  FROM sp, unnest(range(0, len(ps))) AS u2(i)
         |), pn AS (
         |  SELECT doc_id, par_idx, par,
         |    regexp_replace(lower(trim(par)), '\\s+', ' ', 'g') AS pnorm
         |  FROM ppr
         |  WHERE regexp_replace(lower(trim(par)), '\\s+', ' ', 'g') <> ''
         |), prk AS (
         |  SELECT *, row_number() OVER (PARTITION BY pnorm
         |    ORDER BY doc_id, par_idx) AS rn
         |  FROM pn
         |), pout AS (
         |  SELECT doc_id,
         |    string_agg(par, chr(10) || chr(10) ORDER BY par_idx) AS text
         |  FROM prk WHERE rn = 1 GROUP BY doc_id
         |), ${SH3.replace("FROM documents", "FROM pout")}, jp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*) AS inter, a.n_sh AS n_a, b.n_sh AS n_b
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 4, 5
         |  HAVING round(CAST(count(*) AS DOUBLE) / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE), 6) >= 0.5
         |), edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jp
         |  UNION ALL SELECT doc_b, doc_a FROM jp
         |), reach AS (
         |  SELECT src AS id, src AS lab FROM edges
         |  UNION
         |  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst
         |), clu AS (
         |  SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id
         |), canon AS (
         |  SELECT p.doc_id, p.text FROM pout p
         |  LEFT JOIN clu ON p.doc_id = clu.doc_id
         |  WHERE clu.cluster_id IS NULL OR clu.cluster_id = p.doc_id
         |),
         |${classifySql(8, "8.0").replace("FROM documents", "FROM canon")},
         |scored AS (
         |  SELECT f.doc_id,
         |    floor(least(greatest(0.25 * (w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 + w.w4 * f.x4) + 0.5,
         |      CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS score
         |  FROM f CROSS JOIN w8s w
         |), grk AS (
         |  SELECT doc_id, score,
         |    row_number() OVER (ORDER BY score DESC,
         |      CAST(('0x' || substr(md5('pretrain:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
         |        % 1000000 AS BIGINT), doc_id) AS rn,
         |    (SELECT count(*) FROM scored) AS n
         |  FROM scored
         |), gt AS (
         |  SELECT g.doc_id, g.score, c.text
         |  FROM grk g JOIN canon c ON g.doc_id = c.doc_id
         |  WHERE g.rn <= (3 * g.n) // 10
         |), gsh AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
         |    ELSE list_transform(range(1, len(w) - 6),
         |      i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
         |           w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]) END)) AS s
         |  FROM (SELECT doc_id, str_split($NORM, ' ') AS w FROM gt)
         |), bsh AS (
         |  SELECT DISTINCT s FROM (
         |    SELECT unnest(list_distinct(
         |      CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
         |      ELSE list_transform(range(1, len(w) - 6),
         |        i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
         |             w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]) END)) AS s
         |    FROM (SELECT str_split($NORM, ' ') AS w FROM documents
         |          WHERE doc_id % 20 = 7)
         |  )
         |), pk2 AS (
         |  SELECT gt.doc_id, gt.score, gt.text, psrc.lang,
         |    CAST(length(gt.text) AS BIGINT) AS n_chars
         |  FROM gt JOIN psrc ON gt.doc_id = psrc.doc_id
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM gsh JOIN bsh ON gsh.s = bsh.s
         |    WHERE gsh.doc_id = gt.doc_id)
         |), tg AS (
         |  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS mass FROM pk2 GROUP BY lang
         |), tw AS (
         |  SELECT lang, mass,
         |    CAST(round(sqrt(CAST(mass AS DOUBLE)) * 1000000) AS BIGINT) AS w_i
         |  FROM tg
         |), tt AS (
         |  SELECT CAST(sum(mass) AS BIGINT) AS total,
         |    CAST(sum(w_i) AS BIGINT) AS sumw_i FROM tw
         |), tr AS (
         |  SELECT lang, CASE WHEN mass = 0 THEN 1000000
         |    ELSE CAST(floor(least(1.0,
         |      0.5 * (CAST(w_i AS DOUBLE) / CAST(sumw_i AS DOUBLE))
         |          * (CAST(total AS DOUBLE) / CAST(mass AS DOUBLE))) * 1000000) AS BIGINT)
         |    END AS thr
         |  FROM tw, tt
         |), samp AS (
         |  SELECT pk2.doc_id, pk2.lang, pk2.score, pk2.text
         |  FROM pk2 JOIN tr ON pk2.lang = tr.lang
         |  WHERE CAST(('0x' || substr(md5('temp:' || CAST(pk2.doc_id AS VARCHAR)), 1, 8))::UBIGINT
         |      % 1000000 AS BIGINT) < tr.thr
         |), man AS (
         |  SELECT doc_id, lang, score, text,
         |    CAST(row_number() OVER (
         |      PARTITION BY CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 4 AS BIGINT)
         |      ORDER BY md5('shard:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pos,
         |    CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
         |      % 4 AS BIGINT) AS shard_id
         |  FROM samp
         |)""".stripMargin
      raw
  }

  /** DuckDB 1.0 inlines CTEs by default: the deep cascade re-reads the
    * parquet source once per reference (the recursive CC + 8-step
    * training replay multiply into thousands of scans -> it exhausts
    * the fd limit before it exhausts the planner). MATERIALIZE the
    * load-bearing stage boundaries so each stage evaluates once, like
    * the Spark side's Materialize.once. */
  private def pretrainMat(q: String): String =
    Seq("psrc", "pfx", "pbw", "lout", "pout", "sh", "clu",
      "canon", "f", "scored", "grk", "gt", "pk2", "man")
      .foldLeft(q) { (acc, n) =>
        acc.replaceFirst(s"\\b$n AS \\(", s"$n AS MATERIALIZED (")
      }

  /** [[pretrainMat]] plus the spliced BPE cascade's stage boundaries:
    * each bpsymN has TWO consumers (the next round's pair count and
    * rewrite), so inlining would double the evaluation per level —
    * 2^rounds scans of the token aggregate without materialization. */
  private def pretrainMatBpe(q: String): String =
    (Seq("bpfreq") ++ (0 to BPE_ROUNDS).map(i => s"bpsym$i") ++
      Seq("bsegs", "pbpe"))
      .foldLeft(pretrainMat(q)) { (acc, n) =>
        acc.replaceFirst(s"\\b$n AS \\(", s"$n AS MATERIALIZED (")
      }

  /** corpus_pretrain planted near-dup pair (negative doc_ids, both
    * engines share the constants): -12 is NFC/clean, -11 is the SAME
    * text in NFD form with a mojibake token and CRLF line endings —
    * the pair unifies onto one dedup key only AFTER the normalize
    * stage (fixText's documented composition point), which is exactly
    * what the composed pipeline exists to exercise. PretrainSpec pins
    * that WITHOUT stage 1 the pair survives dedup separately. */
  private val pretrainPlanted: Seq[(Long, String, String)] = Seq(
    (-12L, "caf\u00E9 cr\u00E8me br\u00FBl\u00E9e \u00E9lan planted paragraph one\n" +
      "planted unique line two here\nplanted unique line three here", "fr"),
    (-11L, "cafe\u0301 cre\u0300me bru\u0302le\u0301e \u00C3\u00A9lan planted paragraph one\r\n" +
      "planted unique line two here\r\nplanted unique line three here", "fr"))

  /** html_extract planted fixtures (negative doc_ids), shared by the
    * Spark union and the oracle VALUES: a full page (title/style/
    * script/comment drops, block-tag line structure, list items), the
    * inline-markup word-separation case, entity decoding incl. the
    * double-escape guard (&amp;lt; must decode ONCE to &lt;), and an
    * unclosed-tag fragment. The synthetic corpus is markup-free
    * (identity path), so these carry the whole behavior. */
  private val htmlPlanted: Seq[(Long, String)] = Seq(
    -4L -> ("<html><head><title>Page Title</title>" +
      "<style>p { color: red }</style></head><body>" +
      "<h1>Header One Here</h1><p>first paragraph of text</p>" +
      "<p>second &amp; third &lt;angle&gt; bits</p>" +
      "<script>var x = 1; if (x < 2) { x = 2; }</script>" +
      "<div>closing div content</div>" +
      "<ul><li>item one text</li><li>item two text</li></ul>" +
      "<!-- hidden comment text --></body></html>"),
    -3L -> "a<b>b</b> c&nbsp;d &amp;lt; stays escaped",
    -2L -> "line one<br>line two<br/>line three",
    -1L -> "broken <em unclosed fragment")

  /** DuckDB string literal for `s`: quotes doubled, control chars
    * (<0x20) emitted as chr(n) concatenation so the SQL stays printable
    * (raw newlines inside a literal would also collide with the
    * surrounding stripMargin). */
  /** html_links anchor-extraction contract: double-quoted href,
    * tag-free anchor text — one literal shared by Java regex and RE2
    * (lazy/greedy semantics never diverge because both char classes
    * are negated sets). Link graphs at crawl scale come from exactly
    * this narrow extraction; unquoted/exotic hrefs are the HTML
    * stripper's problem, not the graph builder's. */
  private val LINK_RE = """<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>"""
  private val HOST_RE = "^https?://([^/]+)"

  /** html_links planted fixtures (negative doc_ids): multi-link page
    * with absolute/relative targets, a repeated-host page, and a
    * link-free page (must yield no rows). */
  private val linksPlanted: Seq[(Long, String)] = Seq(
    -31L -> ("<html><body><p>intro text</p>" +
      """<a href="https://alpha.example/one" class="x">first link</a>""" +
      """<p>mid</p><a id="r" href="/relative/path">relative link</a>""" +
      """<a href="http://beta.example/two?q=1">second host</a>""" +
      "</body></html>"),
    -32L -> ("""<div><a href="https://alpha.example/a">again alpha</a>""" +
      """ and <a href="https://alpha.example/b">alpha b</a></div>"""),
    -33L -> "<html><body><p>no anchors here at all</p></body></html>")

  /** text_code planted fixtures (negative doc_ids), UNIONed in both
    * engines from these constants: python (keywords + symbols), C
    * (both signals), JSON config (symbols only), prose with light
    * punctuation (under both gates), and prose that mentions
    * keyword-lookalikes ("returns" ≠ \breturn\b; for/if = 2 hits < 3). */
  private val codePlanted: Seq[(Long, String)] = Seq(
    -21L -> ("def main(args):\n    import sys\n    for i in range(10):\n" +
      "        x = i * 2\n    if x > 5:\n        return x\n" +
      "    while x < 100:\n        x = x + 1"),
    -22L -> ("int main() { int x = 0; for (int i = 0; i < 10; i++) " +
      "{ x += i; } return x; }"),
    -23L -> """{ "config": [1, 2, 3], "flag": true, "name": "value" }""",
    -24L -> ("the quick brown fox jumps over the lazy dog and then " +
      "(briefly) pauses to consider the meaning of life; it finds " +
      "none worth keeping."),
    -25L -> "sales rose by 10 percent for the quarter if we exclude returns")

  /** text_license planted fixtures (negative doc_ids): an MIT header
    * (3 phrases), an Apache header (2), a GPL blurb (2), an SPDX tag
    * line (1), a prose trap ("the copyright office reported" — zero
    * phrase hits), and clean prose. */
  private val licensePlanted: Seq[(Long, String)] = Seq(
    -41L -> ("MIT License. Permission is hereby granted, free of " +
      "charge, to any person obtaining a copy of this software, to " +
      "deal in the Software without restriction. THE SOFTWARE IS " +
      "PROVIDED AS IS, WITHOUT WARRANTY OF ANY KIND."),
    -42L -> ("Copyright 2024 the authors. All rights reserved. " +
      "Licensed under the Apache License, Version 2.0; you may not " +
      "use this file except in compliance with the License."),
    -43L -> ("This program is free software: you can redistribute it " +
      "under the terms of the GNU General Public License. There are " +
      "no warranties of merchantability for this program."),
    -44L -> "// SPDX-License-Identifier: BSD-3-Clause",
    -45L -> ("the copyright office reported that registrations rose " +
      "again this year while fees stayed flat"),
    -46L -> "a perfectly ordinary paragraph about the weather today")

  /** text_watermark planted fixtures (negative doc_ids). -51 is a
    * 40-token chain CONSTRUCTED so every transition's md5 draw is
    * green (built offline with the same md5 arithmetic both engines
    * run): T=39, g=39 → z = (39 − 0.25·39)/√(39·0.1875) ≈ 10.82 —
    * detected. -52 is the chain's 8-token prefix: all green, z ≈ 4.58
    * > the threshold, but T=7 < WM_MIN so the length gate suppresses
    * the verdict — the branch that keeps short docs out of the
    * detector. The natural corpus sits near z ∼ N(0,1). */
  private val wmPlanted: Seq[(Long, String)] = Seq(
    -51L -> ("start tok3 tok4 tok7 tok19 tok0 tok6 tok1 tok2 tok10 " +
      "tok3 tok4 tok7 tok19 tok0 tok6 tok1 tok2 tok10 tok3 tok4 " +
      "tok7 tok19 tok0 tok6 tok1 tok2 tok10 tok3 tok4 tok7 tok19 " +
      "tok0 tok6 tok1 tok2 tok10 tok3 tok4 tok7"),
    -52L -> "start tok3 tok4 tok7 tok19 tok0 tok6 tok1")

  /** One planted-fixture frame (doc_id, text) — the union side of the
    * keys whose behavior the markup-free corpus can't exercise
    * (html_extract/html_links/text_code/text_license). */
  private def plantedDocs(s: org.apache.spark.sql.SparkSession,
      rows: Seq[(Long, String)]): org.apache.spark.sql.DataFrame =
    s.createDataFrame(
      java.util.Arrays.asList(rows.map { case (id, t) =>
        org.apache.spark.sql.Row(id, t) }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType, nullable = false))))

  private def sqlStr(s: String): String = {
    val sb = new StringBuilder("'")
    s.foreach {
      case '\'' => sb.append("''")
      case c if c < ' ' => sb.append(s"' || chr(${c.toInt}) || '")
      case c => sb.append(c)
    }
    sb.append("'").toString
  }

  /** The [[Text.mojibake]] repair chain over column `text`, as DuckDB
    * SQL — interpolated from the same table the Spark side folds. */
  private lazy val MOJ_CHAIN: String =
    Text.mojibake.foldLeft("text") { case (acc, (bad, good)) =>
      s"replace($acc, ${sqlStr(bad)}, ${sqlStr(good)})" }

  private[graft] val BPE_ROUNDS = 8
  /** The 8-round BPE merge cascade shared by text_bpe_train (reads
    * the bestN rows) and text_bpe_apply (reads the final symN vocab).
    * Token carried through every round; the sym step LEFT-joins its
    * best row so a merge-exhausted corpus passes the vocabulary
    * through unchanged — mirroring the Spark trainer exactly. */
  private lazy val BPE_CASCADE: String = bpeCascadeSql("")

  /** The cascade with every CTE name prefixed by `p` — the embeddable
    * form: pretrain_examples_bpe splices it into the PRETRAIN chain,
    * whose classifier replay already owns the unprefixed `t`. */
  private def bpeCascadeSql(p: String): String = {
    val init =
      s"""WITH ${p}t AS (
         |  SELECT unnest(str_split($NORM, ' ')) AS token FROM documents
         |), ${p}freq AS (
         |  SELECT token, count(*) AS f FROM ${p}t WHERE token <> '' GROUP BY 1
         |), ${p}sym0 AS (
         |  SELECT token, f, list_aggregate(list_transform(range(1, length(token) + 1),
         |      i -> ' ' || substring(token, CAST(i AS INT), 1) || ' '),
         |    'string_agg', '') AS w
         |  FROM ${p}freq
         |)""".stripMargin
    val roundCtes = (1 to BPE_ROUNDS).map { i =>
      s""", ${p}pairs$i AS (
         |  SELECT sy[CAST(i AS INT)] AS l, sy[CAST(i + 1 AS INT)] AS r, sum(f) AS wt
         |  FROM (
         |    SELECT f, sy, unnest(range(1, len(sy))) AS i FROM (
         |      SELECT f, list_filter(str_split(trim(w), '  '), x -> x <> '') AS sy FROM ${p}sym${i - 1}
         |    ) WHERE len(sy) >= 2
         |  ) GROUP BY 1, 2
         |), ${p}best$i AS (
         |  SELECT CAST($i AS INT) AS step, l, r, wt FROM ${p}pairs$i
         |  ORDER BY wt DESC, l, r LIMIT 1
         |), ${p}sym$i AS (
         |  SELECT s.token, s.f,
         |    CASE WHEN b.l IS NULL THEN s.w
         |         ELSE replace(s.w, ' ' || b.l || '  ' || b.r || ' ',
         |           ' ' || b.l || b.r || ' ') END AS w
         |  FROM ${p}sym${i - 1} s LEFT JOIN ${p}best$i b ON true
         |)""".stripMargin
    }.mkString
    init + roundCtes
  }

  /** Shared DuckDB CTE chain replaying [[winnowFingerprints]] up to
    * `sel` = (doc_id, key) with key = h·2²⁰ + (2²⁰−1−pos). */
  private lazy val WINNOW_CTES =
    s"""toks AS (
       |  SELECT doc_id, str_split($NORM, ' ') AS w FROM documents
       |), g AS (
       |  SELECT doc_id, i - 1 AS pos,
       |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS gram
       |  FROM toks, unnest(range(1, len(w) - 2)) AS t(i)
       |  WHERE len(w) >= 4
       |), h AS (
       |  SELECT doc_id, pos,
       |    CAST(('0x' || substr(sha256(gram), 1, 10))::UBIGINT AS BIGINT) AS h
       |  FROM g
       |), k AS (
       |  SELECT doc_id,
       |    min(h * 1048576 + (1048575 - pos)) OVER (
       |      PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS key
       |  FROM h
       |), sel AS (SELECT DISTINCT doc_id, key FROM k)""".stripMargin
  private def hitsSql(ws: Seq[String]): String = {
    val list = ws.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(str_split($NORM, ' '), t -> list_contains($list, t)))"
  }

  /** Shared DuckDB CTE: trigram shingle postings (doc_id, n_sh, s) —
    * mirrors Dedup.shingles(text, 3). */
  private val SH3 =
    s"""toks AS (
       |  SELECT doc_id, str_split($NORM, ' ') AS w FROM documents
       |), sh AS (
       |  SELECT doc_id, n_sh, s FROM (
       |    SELECT doc_id,
       |      list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
       |        ELSE list_transform(range(1, len(w) - 1),
       |          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS ss
       |    FROM toks
       |  ), LATERAL (SELECT len(ss) AS n_sh), unnest(ss) AS t(s)
       |)""".stripMargin

  /** Shared DuckDB CTEs for the IVF pipeline: embeddings as doubles,
    * the 16 deterministic centroids, and the nearest-cell assignment
    * (argmax on round(cos,6), ties to the lowest cell — mirrors
    * Knn.ivfAssign's max(struct(cos, -cell_id))). */
  /** DuckDB mirror of Knn.autoCells: max(16, ceil(sqrt(n))) — both
    * engines' sqrt/ceil are IEEE-correctly-rounded, so the derived
    * cell count agrees at every corpus size. */
  private val AUTO_CELLS_SQL: String =
    "(SELECT greatest(16, CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT)) FROM e)"

  private def ivfSql(cellExpr: String = AUTO_CELLS_SQL): String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent AS (SELECT vec_id AS cell_id, v AS c FROM e WHERE vec_id < $cellExpr),
       |scored AS (
       |  SELECT e.vec_id, e.v, cent.cell_id,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |      round(list_dot_product(e.v, cent.c) /
       |        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cent.c, cent.c))), 6) DESC,
       |      cent.cell_id) AS rn
       |  FROM e CROSS JOIN cent
       |), assigned AS (SELECT vec_id, v, cell_id FROM scored WHERE rn = 1)""".stripMargin

  /** DuckDB replay of Pq.ivfPqTopK (#119): per-block codebook
    * training unrolled (the kmeansSql pattern, keyed by block),
    * final codes, coarse probes, integer-grid ADC scoring, shortlist
    * and exact re-rank. dist² mirrors the Spark fold exactly: the
    * difference list's sequential self-dot, rounded to 6. Ends with
    * `rer` = (query_id, vec_id, cos, adc). */
  /** One definition for knn_ivfpq AND knn_ivfpq_indexed: the published
    * index must rank exactly like the in-session train-and-probe. */
  private lazy val IVFPQ_SQL: String =
    s"""WITH ${ivfPqSql(8, 16, 2, 4, 5, 4)}
       |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id, cos, adc FROM (
       |  SELECT query_id, vec_id, cos, adc,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, vec_id) AS rk
       |  FROM rer
       |) WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  private def ivfPqSql(m: Int, kCodes: Int, iters: Int, nProbe: Int,
      k: Int, rerank: Int): String = {
    def d2(a: String, b: String): String = {
      val ld = s"list_transform(range(1, len($a) + 1), " +
        s"i -> $a[CAST(i AS INT)] - $b[CAST(i AS INT)])"
      s"round(list_dot_product($ld, $ld), 6)"
    }
    def passign(name: String, cents: String): String =
      s"""$name AS (
         |  SELECT vec_id, block, sub, cell_id FROM (
         |    SELECT b.vec_id, b.block, b.sub, $cents.cell_id,
         |      row_number() OVER (PARTITION BY b.vec_id, b.block ORDER BY
         |        ${d2("b.sub", s"$cents.c")}, $cents.cell_id) AS rn
         |    FROM blk b JOIN $cents ON $cents.block = b.block
         |  ) WHERE rn = 1
         |)""".stripMargin
    val sb = new StringBuilder
    sb.append(
      s"""${ivfSql()},
         |blk AS (
         |  SELECT e.vec_id, CAST(t.b AS INT) AS block,
         |    list_slice(e.v, CAST(t.b AS INT) * (len(e.v) // $m) + 1,
         |      (CAST(t.b AS INT) + 1) * (len(e.v) // $m)) AS sub
         |  FROM e, unnest(range(0, $m)) AS t(b)
         |),
         |pc0 AS (SELECT block, vec_id AS cell_id, sub AS c FROM blk
         |        WHERE vec_id < $kCodes)""".stripMargin)
    for (r <- 1 to iters) {
      sb.append(",\n").append(passign(s"pa$r", s"pc${r - 1}"))
      sb.append(s""",
         |pq$r AS (
         |  SELECT block, cell_id, i,
         |    CAST(floor(sub[CAST(i AS INT) + 1] * 1000000.0 + 0.5) AS BIGINT) AS qc
         |  FROM pa$r, unnest(range(0, len(sub))) AS t(i)
         |), ps$r AS (
         |  SELECT block, cell_id, i, sum(qc) AS s, count(*) AS n
         |  FROM pq$r GROUP BY 1, 2, 3
         |), pc$r AS (
         |  SELECT block, cell_id,
         |    list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) ORDER BY i) AS c
         |  FROM ps$r GROUP BY 1, 2
         |)""".stripMargin)
    }
    sb.append(",\n").append(passign("paf", s"pc$iters"))
    sb.append(s""",
       |codes AS (SELECT vec_id, block, cell_id AS code FROM paf),
       |pprobes AS (
       |  SELECT query_id, cell_id FROM (
       |    SELECT qe.vec_id AS query_id, cent.cell_id,
       |      row_number() OVER (PARTITION BY qe.vec_id ORDER BY
       |        round(${cosSql("qe.v", "cent.c")}, 6) DESC, cent.cell_id) AS rn
       |    FROM e qe CROSS JOIN cent WHERE qe.vec_id < 10
       |  ) WHERE rn <= $nProbe
       |),
       |adct AS (
       |  SELECT q.vec_id AS query_id, q.block, pcF.cell_id AS code,
       |    CAST(round(round(list_dot_product(q.sub, pcF.c), 6) * 1000000) AS BIGINT) AS pdot_i
       |  FROM blk q JOIN pc$iters pcF ON pcF.block = q.block WHERE q.vec_id < 10
       |),
       |pcand AS (
       |  SELECT p.query_id, a.vec_id
       |  FROM assigned a JOIN pprobes p ON a.cell_id = p.cell_id
       |  WHERE a.vec_id <> p.query_id
       |),
       |pscored AS (
       |  SELECT c.query_id, c.vec_id, sum(adct.pdot_i) AS adc_i
       |  FROM pcand c JOIN codes k2 ON k2.vec_id = c.vec_id
       |  JOIN adct ON adct.query_id = c.query_id AND adct.block = k2.block
       |            AND adct.code = k2.code
       |  GROUP BY 1, 2
       |),
       |short AS (
       |  SELECT query_id, vec_id, adc_i FROM (
       |    SELECT query_id, vec_id, adc_i,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY adc_i DESC, vec_id) AS srk
       |    FROM pscored
       |  ) WHERE srk <= ${k * rerank}
       |),
       |rer AS (
       |  SELECT s.query_id, s.vec_id,
       |    round(${cosSql("ev.v", "qv.v")}, 6) AS cos,
       |    round(CAST(s.adc_i AS DOUBLE) / 1000000.0, 6) AS adc
       |  FROM short s JOIN e ev ON ev.vec_id = s.vec_id
       |              JOIN e qv ON qv.vec_id = s.query_id
       |)""".stripMargin)
    sb.toString
  }

  /** DuckDB replay of Knn.mmrRerank (#122): top-`pool` candidates per
    * query by rounded cosine, pairwise candidate sims on the 1e-6
    * BIGINT grid, then `k` unrolled greedy MMR selection steps
    * (mmr10 = 7·rel − 3·maxSim-to-selected, ties to the lowest id). */
  private def mmrSql(k: Int, pool: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |qc AS (
         |  SELECT query_id, vec_id, rel_i FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id,
         |      CAST(round(round(${cosSql("c.v", "q.v")}, 6) * 1000000) AS BIGINT) AS rel_i,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        round(${cosSql("c.v", "q.v")}, 6) DESC, c.vec_id) AS rn
         |    FROM e q JOIN e c ON c.vec_id <> q.vec_id
         |    WHERE q.vec_id < 10
         |  ) WHERE rn <= $pool
         |),
         |mp AS (
         |  SELECT a.query_id, a.vec_id AS ca, b.vec_id AS cb,
         |    CAST(round(round(${cosSql("ea.v", "eb.v")}, 6) * 1000000) AS BIGINT) AS sim_i
         |  FROM qc a JOIN qc b ON a.query_id = b.query_id AND a.vec_id <> b.vec_id
         |  JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
         |),
         |s1 AS (
         |  SELECT query_id, vec_id, rel_i * 7 AS mmr10_i, 1 AS rk FROM (
         |    SELECT query_id, vec_id, rel_i,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY rel_i DESC, vec_id) AS rn
         |    FROM qc
         |  ) WHERE rn = 1
         |),
         |sel1 AS (SELECT query_id, vec_id FROM s1)""".stripMargin)
    for (t <- 2 to k) {
      sb.append(s""",
         |ms$t AS (
         |  SELECT m.query_id, m.ca, max(m.sim_i) AS max_sim_i
         |  FROM mp m JOIN sel${t - 1} s
         |    ON s.query_id = m.query_id AND s.vec_id = m.cb
         |  GROUP BY 1, 2
         |),
         |s$t AS (
         |  SELECT query_id, vec_id, mmr10_i, $t AS rk FROM (
         |    SELECT c.query_id, c.vec_id,
         |      c.rel_i * 7 - 3 * coalesce(ms.max_sim_i, 0) AS mmr10_i,
         |      row_number() OVER (PARTITION BY c.query_id ORDER BY
         |        c.rel_i * 7 - 3 * coalesce(ms.max_sim_i, 0) DESC, c.vec_id) AS rn
         |    FROM qc c LEFT JOIN ms$t ms
         |      ON ms.query_id = c.query_id AND ms.ca = c.vec_id
         |    WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} s
         |      WHERE s.query_id = c.query_id AND s.vec_id = c.vec_id)
         |  ) WHERE rn = 1
         |),
         |sel$t AS (SELECT query_id, vec_id FROM sel${t - 1}
         |          UNION ALL SELECT query_id, vec_id FROM s$t)""".stripMargin)
    }
    sb.append(s""",
       |mmr_all AS (${(1 to k).map(t => s"SELECT * FROM s$t").mkString("\n  UNION ALL ")})""".stripMargin)
    sb.toString
  }

  /** Shared DuckDB CTEs for the bigram-LM fluency score (#62): add-one
    * smoothed ln P(w2|w1), decimal-stabilized per-doc mean. Ends with
    * `lmsc` = (doc_id, n_bigrams, avg_logprob). */
  private lazy val LM_CTES: String =
    s"""tk AS (
       |  SELECT doc_id,
       |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END AS w
       |  FROM documents
       |), bg0 AS (
       |  SELECT doc_id, unnest(CASE WHEN len(w) >= 2
       |    THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
       |    ELSE [] END) AS bg
       |  FROM tk
       |), b2 AS (
       |  SELECT doc_id, bg, str_split(bg, ' ')[1] AS w1 FROM bg0
       |), c2 AS (
       |  SELECT bg, count(*) AS c2 FROM b2 GROUP BY bg
       |), uni AS (
       |  SELECT unnest(str_split($NORM, ' ')) AS token FROM documents
       |), c1 AS (
       |  SELECT token, count(*) AS c1 FROM uni WHERE token <> '' GROUP BY token
       |), vv AS (
       |  SELECT count(DISTINCT token) AS v FROM uni WHERE token <> ''
       |), terms AS (
       |  SELECT b2.doc_id,
       |    CAST(ln(CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + vv.v AS DOUBLE))
       |      AS DECIMAL(28,12)) AS lp
       |  FROM b2 JOIN c2 USING (bg) JOIN c1 ON c1.token = b2.w1 CROSS JOIN vv
       |), lmsc AS (
       |  SELECT doc_id, count(*) AS n_bigrams,
       |    round(CAST(sum(lp) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS avg_logprob
       |  FROM terms GROUP BY doc_id
       |)""".stripMargin

  /** DuckDB replay of Pca.project: exact integer-grid mean, v0 = e0,
    * `iters` unrolled power-iteration rounds (per-row y = x·v, 1e-6
    * long-grid per-dimension sums, mean-center by μ·(μ·v), normalize,
    * re-round to 6), then the centered projection. */
  private def pcaSql(iters: Int, dim: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
         |muq AS (
         |  SELECT i, sum(CAST(floor(x[CAST(i AS INT) + 1] * 1000000.0 + 0.5) AS BIGINT)) AS s,
         |    count(*) AS n
         |  FROM e, unnest(range(0, $dim)) AS t(i) GROUP BY i
         |), mu AS (
         |  SELECT list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) ORDER BY i) AS mu
         |  FROM muq
         |), v0 AS (
         |  SELECT list_transform(range(0, $dim),
         |    i -> CASE WHEN i = 0 THEN 1.0 ELSE 0.0 END) AS v
         |)""".stripMargin)
    for (r <- 1 to iters) {
      sb.append(s""",
         |y$r AS (
         |  SELECT e.vec_id, e.x, list_dot_product(e.x, p.v) AS y
         |  FROM e CROSS JOIN v${r - 1} p
         |), q$r AS (
         |  SELECT i, sum(CAST(floor(x[CAST(i AS INT) + 1] * y * 1000000.0 + 0.5) AS BIGINT)) AS s,
         |    count(*) AS n
         |  FROM y$r, unnest(range(0, $dim)) AS t(i) GROUP BY i
         |), xs$r AS (
         |  SELECT list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) ORDER BY i) AS xs
         |  FROM q$r
         |), w$r AS (
         |  SELECT list_transform(range(0, $dim), i ->
         |    xs.xs[CAST(i AS INT) + 1]
         |      - mu.mu[CAST(i AS INT) + 1] * list_dot_product(mu.mu, p.v)) AS w
         |  FROM xs$r xs CROSS JOIN mu CROSS JOIN v${r - 1} p
         |), v$r AS (
         |  SELECT list_transform(w, x -> round(x / sqrt(list_dot_product(w, w)), 6)) AS v
         |  FROM w$r
         |)""".stripMargin)
    }
    sb.toString
  }

  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** DuckDB replay of Classify.scores: the corpus_gopher measurement
    * CTEs feed 1e-6-grid features + the rule label (`f`), then
    * `steps` unrolled hard-sigmoid gradient CTEs (per-row residual
    * contributions floored onto the 1e-6 long grid, BIGINT sums —
    * order-free like the Spark side — and weights re-rounded per
    * step), ending in `w{steps}s`. The caller selects the final
    * scores from `f CROSS JOIN w{steps}s`. */
  private def classifySql(steps: Int, lr: String): String = {
    val enList = graft.functions.Text.stopwords.head._2
      .map(w => s"'$w'").mkString("[", ", ", "]")
    def z(w: String) =
      s"($w.w0 + $w.w1 * f.x1 + $w.w2 * f.x2 + $w.w3 * f.x3 + $w.w4 * f.x4)"
    def p(w: String) =
      s"least(greatest(0.25 * ${z(w)} + 0.5, CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE))"
    val base =
      s"""t AS (
         |  SELECT doc_id,
         |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END AS tk
         |  FROM documents
         |), bb AS (
         |  SELECT doc_id, tk,
         |    CASE WHEN len(tk) >= 2 THEN list_transform(range(1, len(tk)),
         |      i -> tk[i] || ' ' || tk[i+1]) ELSE [] END AS bg
         |  FROM t
         |), mm AS (
         |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n,
         |    CAST(coalesce(list_sum(list_transform(tk, x -> length(x))), 0) AS BIGINT) AS tot_len,
         |    CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
         |    CAST(len(list_filter(tk, x -> list_contains($enList, x))) AS BIGINT) AS stop_hits,
         |    CAST(CASE WHEN len(tk) = 0 THEN 0
         |      ELSE list_max(list_transform(list_distinct(tk),
         |        u -> len(list_filter(tk, x -> x = u)))) END AS BIGINT) AS top_n,
         |    CAST(len(bg) AS BIGINT) AS n_bg,
         |    CAST(len(list_distinct(bg)) AS BIGINT) AS n_bg_d
         |  FROM bb
         |), f AS (
         |  SELECT doc_id,
         |    floor((least(n, 200) / 200.0) * 1000000.0 + 0.5) / 1000000.0 AS x1,
         |    floor((n_alpha / greatest(n, 1)) * 1000000.0 + 0.5) / 1000000.0 AS x2,
         |    floor((stop_hits / greatest(n, 1)) * 1000000.0 + 0.5) / 1000000.0 AS x3,
         |    floor(((n_bg - n_bg_d) / greatest(n_bg, 1)) * 1000000.0 + 0.5) / 1000000.0 AS x4,
         |    CASE WHEN (n >= 30 AND n <= 100000)
         |      AND (tot_len >= 3 * n AND tot_len <= 10 * n AND n > 0)
         |      AND (5 * n_alpha >= 4 * n AND n > 0) AND stop_hits >= 2
         |      AND 5 * top_n <= n AND (n_bg - n_bg_d) * 5 <= n_bg
         |      THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y,
         |    (n >= 30 AND n <= 100000)
         |      AND (tot_len >= 3 * n AND tot_len <= 10 * n AND n > 0)
         |      AND (5 * n_alpha >= 4 * n AND n > 0) AND stop_hits >= 2
         |      AND 5 * top_n <= n AND (n_bg - n_bg_d) * 5 <= n_bg AS label
         |  FROM mm
         |), w0s AS (
         |  SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
         |    CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3,
         |    CAST(0.0 AS DOUBLE) AS w4
         |)""".stripMargin
    val stepCtes = (1 to steps).map { k =>
      val prev = s"w${k - 1}s"
      s"""r$k AS (
         |  SELECT f.x1, f.x2, f.x3, f.x4, ${p("w")} - f.y AS r
         |  FROM f CROSS JOIN $prev w
         |), g$k AS (
         |  SELECT CAST(sum(CAST(floor(r * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS g0,
         |    CAST(sum(CAST(floor(r * x1 * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS g1,
         |    CAST(sum(CAST(floor(r * x2 * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS g2,
         |    CAST(sum(CAST(floor(r * x3 * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS g3,
         |    CAST(sum(CAST(floor(r * x4 * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS g4,
         |    count(*) AS nd
         |  FROM r$k
         |), w${k}s AS (
         |  SELECT
         |    floor((w.w0 - $lr * (CAST(g.g0 AS DOUBLE) / (g.nd * 1000000.0))) * 1000000.0 + 0.5) / 1000000.0 AS w0,
         |    floor((w.w1 - $lr * (CAST(g.g1 AS DOUBLE) / (g.nd * 1000000.0))) * 1000000.0 + 0.5) / 1000000.0 AS w1,
         |    floor((w.w2 - $lr * (CAST(g.g2 AS DOUBLE) / (g.nd * 1000000.0))) * 1000000.0 + 0.5) / 1000000.0 AS w2,
         |    floor((w.w3 - $lr * (CAST(g.g3 AS DOUBLE) / (g.nd * 1000000.0))) * 1000000.0 + 0.5) / 1000000.0 AS w3,
         |    floor((w.w4 - $lr * (CAST(g.g4 AS DOUBLE) / (g.nd * 1000000.0))) * 1000000.0 + 0.5) / 1000000.0 AS w4
         |  FROM g$k g CROSS JOIN $prev w
         |)""".stripMargin
    }
    (base +: stepCtes).mkString(",\n")
  }

  /** DuckDB replay of Knn.kmeansAssignments: c0 = first k vectors as
    * doubles; each round r assigns by rounded-cosine argmax (ties to
    * the lowest cell) then rebuilds centroids from exact 1e-6-grid
    * long sums — the same order-independent arithmetic the Spark
    * operator uses, so the trained centroids match bit-for-bit.
    * Yields CTEs up to `afin` = (vec_id, cell_id, cos) vs c<iters>. */
  private def kmeansSql(k: String, iters: Int): String = {
    def assignSql(name: String, cents: String, withCos: Boolean): String = {
      val cosCol = if (withCos) s", round(${cosSql("e.v", s"$cents.c")}, 6) AS cos" else ""
      val outCos = if (withCos) ", cos" else ", v"
      val keepV = if (withCos) "" else ", e.v"
      s"""$name AS (
         |  SELECT vec_id, cell_id$outCos FROM (
         |    SELECT e.vec_id, $cents.cell_id$keepV$cosCol,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        round(${cosSql("e.v", s"$cents.c")}, 6) DESC, $cents.cell_id) AS rn
         |    FROM e CROSS JOIN $cents
         |  ) WHERE rn = 1
         |)""".stripMargin
    }
    val sb = new StringBuilder
    sb.append(
      s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (SELECT vec_id AS cell_id, v AS c FROM e WHERE vec_id < ($k))""".stripMargin)
    for (r <- 1 to iters) {
      sb.append(",\n").append(assignSql(s"a$r", s"c${r - 1}", withCos = false))
      sb.append(s""",
         |q$r AS (
         |  SELECT cell_id, i,
         |    CAST(floor(v[CAST(i AS INT) + 1] * 1000000.0 + 0.5) AS BIGINT) AS qc
         |  FROM a$r, unnest(range(0, len(v))) AS t(i)
         |), s$r AS (
         |  SELECT cell_id, i, sum(qc) AS s, count(*) AS n FROM q$r GROUP BY 1, 2
         |), c$r AS (
         |  SELECT cell_id,
         |    list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) ORDER BY i) AS c
         |  FROM s$r GROUP BY cell_id
         |)""".stripMargin)
    }
    sb.append(",\n").append(assignSql("afin", s"c$iters", withCos = true))
    sb.toString
  }

  /** #42's chunk stream (doc_id, chunk_start, chunk_text, n_tokens)
    * WITHOUT a trailing ORDER BY, reusable as a CTE body (chunk_pack). */
  private lazy val DOC_CHUNK_BODY =
    """WITH ctoks0 AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(text, '[ \t\n\r\f]+'), x -> x <> '') AS tokens
      |  FROM documents
      |), cstarts0 AS (
      |  SELECT doc_id, tokens,
      |    unnest(generate_series(0, len(tokens) - 1, 48)) AS start
      |  FROM ctoks0 WHERE len(tokens) > 0
      |)
      |SELECT doc_id, CAST(start AS BIGINT) AS chunk_start,
      |  array_to_string(list_slice(tokens, start + 1, start + 64), ' ') AS chunk_text,
      |  CAST(least(64, len(tokens) - start) AS BIGINT) AS n_tokens
      |FROM cstarts0""".stripMargin

  /** The corpus_clean pipeline (quality gate + near-dup cluster
    * closure, keep canonical) WITHOUT a trailing ORDER BY, so the
    * whole query can nest as a subquery of composed pipelines
    * (corpus_chunks). Yields (doc_id, quality). */
  private lazy val CORPUS_CLEAN_BODY =
    s"""WITH RECURSIVE $SH3, jp AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    count(*) AS inter, a.n_sh AS n_a, b.n_sh AS n_b
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 4, 5
       |  HAVING round(CAST(count(*) AS DOUBLE) / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE), 6) >= 0.5
       |), edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM jp
       |  UNION ALL SELECT doc_b, doc_a FROM jp
       |), reach AS (
       |  SELECT src AS id, src AS lab FROM edges
       |  UNION
       |  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst
       |), clu AS (
       |  SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id
       |), q0 AS (
       |  SELECT doc_id, text,
       |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END AS tk
       |  FROM documents
       |), q1 AS (
       |  SELECT doc_id,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CASE WHEN length(text) = 0 THEN 0.0
       |      ELSE CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
       |           / CAST(length(text) AS DOUBLE) END AS punct_ratio,
       |    CASE WHEN len(tk) = 0 THEN 0.0
       |      ELSE CAST(${hitsSql(Text.stopwords.head._2).replace(s"str_split($NORM, ' ')", "tk")} AS DOUBLE)
       |           / CAST(len(tk) AS DOUBLE) END AS stopword_ratio,
       |    CASE WHEN len(tk) = 0 THEN 0.0
       |      ELSE CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
       |           / CAST(len(tk) AS DOUBLE) END AS mean_token_len
       |  FROM q0
       |), q AS (
       |  SELECT doc_id, round(
       |    least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4 +
       |    (CASE WHEN mean_token_len >= 3.0 AND mean_token_len <= 10.0 THEN 1.0 ELSE 0.0 END) * 0.2 +
       |    (CASE WHEN punct_ratio <= 0.1 THEN 1.0 WHEN punct_ratio <= 0.3 THEN 0.5 ELSE 0.0 END) * 0.2 +
       |    (CASE WHEN stopword_ratio >= 0.05 THEN 1.0 ELSE 0.0 END) * 0.2, 6) AS quality
       |  FROM q1
       |)
       |SELECT q.doc_id, q.quality
       |FROM q LEFT JOIN clu ON q.doc_id = clu.doc_id
       |WHERE q.quality >= 0.5 AND (clu.cluster_id IS NULL OR clu.cluster_id = q.doc_id)""".stripMargin

  /** The text_quality score chain (qc0 → qc1 → qcq yielding
    * (doc_id, quality)) WITHOUT the WITH keyword or a trailing ORDER
    * BY, for interpolation into composed oracles (corpus_curriculum).
    * Same formula as the text_quality oracle body. */
  private lazy val QUALITY_CTES =
    s"""qc0 AS (
       |  SELECT doc_id, text,
       |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END AS tk
       |  FROM documents
       |), qc1 AS (
       |  SELECT doc_id,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len(tk) AS BIGINT) AS n_tokens,
       |    CASE WHEN length(text) = 0 THEN 0.0
       |      ELSE CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
       |           / CAST(length(text) AS DOUBLE) END AS punct_ratio,
       |    CASE WHEN len(tk) = 0 THEN 0.0
       |      ELSE CAST(${hitsSql(Text.stopwords.head._2).replace(s"str_split($NORM, ' ')", "tk")} AS DOUBLE)
       |           / CAST(len(tk) AS DOUBLE) END AS stopword_ratio,
       |    CASE WHEN len(tk) = 0 THEN 0.0
       |      ELSE CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
       |           / CAST(len(tk) AS DOUBLE) END AS mean_token_len
       |  FROM qc0
       |), qcq AS (
       |  SELECT doc_id, round(
       |    least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4 +
       |    (CASE WHEN mean_token_len >= 3.0 AND mean_token_len <= 10.0 THEN 1.0 ELSE 0.0 END) * 0.2 +
       |    (CASE WHEN punct_ratio <= 0.1 THEN 1.0 WHEN punct_ratio <= 0.3 THEN 0.5 ELSE 0.0 END) * 0.2 +
       |    (CASE WHEN stopword_ratio >= 0.05 THEN 1.0 ELSE 0.0 END) * 0.2, 6) AS quality
       |  FROM qc1
       |)""".stripMargin

  /** chunks → sharded → packed → packs: the #51 pack-assignment
    * replay (budget 256, 16 shards), shared by the chunk_pack and
    * pack_stats oracles so the rule lives once per engine. */
  private lazy val PACK_CTES =
    s"""chunks AS (
       |  $DOC_CHUNK_BODY
       |), sharded AS (
       |  SELECT doc_id, chunk_start, n_tokens, doc_id % 16 AS shard FROM chunks
       |), packed AS (
       |  SELECT shard, n_tokens,
       |    CAST(floor((sum(n_tokens) OVER w - n_tokens) / 256.0) AS BIGINT) AS pack_id
       |  FROM sharded
       |  WINDOW w AS (PARTITION BY shard ORDER BY doc_id, chunk_start
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |), packs AS (
       |  SELECT shard, pack_id, CAST(count(*) AS BIGINT) AS n_chunks,
       |    CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
       |  FROM packed GROUP BY shard, pack_id
       |)""".stripMargin

  /** probes → cand → ranked over [[ivfSql]]'s e/cent/assigned — the
    * knn_ivf probe ranking (nProbe = 4, queries = vec_id < 10), shared
    * by knn_ivf and the knn_recall audit so the ranking lives once. */
  private lazy val IVF_RANKED_SQL =
    s"""probes AS (
       |  SELECT query_id, q, cell_id FROM (
       |    SELECT qe.vec_id AS query_id, qe.v AS q, cent.cell_id,
       |      row_number() OVER (PARTITION BY qe.vec_id ORDER BY
       |        round(${cosSql("qe.v", "cent.c")}, 6) DESC, cent.cell_id) AS rn
       |    FROM e qe CROSS JOIN cent WHERE qe.vec_id < 10
       |  ) WHERE rn <= 4
       |), cand AS (
       |  SELECT p.query_id, a.vec_id, round(${cosSql("a.v", "p.q")}, 6) AS cos
       |  FROM assigned a JOIN probes p ON a.cell_id = p.cell_id
       |  WHERE a.vec_id <> p.query_id
       |), ranked AS (
       |  SELECT query_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
       |  FROM cand
       |)""".stripMargin

  /** DuckDB replay of the fused hybrid cascade - dense cosine +
    * BM25 sparse + integer RRF; `ranked` is the fused ranking, and
    * `dscored` (per-candidate dense cosines) stays visible for the
    * retrieval_eval_hybrid audit's exact side. Shared by the serving
    * oracle and the audit oracle so the two replays cannot drift. */
  private lazy val HYBRID_CTES: String =
    s"""q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
       |           FROM embeddings WHERE vec_id < 10),
       |dscored AS (
       |  SELECT q.query_id, e.vec_id,
       |    round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.q_emb) /
       |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
       |       sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos
       |  FROM embeddings e, q WHERE e.vec_id <> q.query_id
       |), dense AS (
       |  SELECT query_id, vec_id AS doc_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk_d
       |  FROM dscored QUALIFY rk_d <= 20
       |), t AS (
       |  SELECT doc_id, unnest(str_split($NORM, ' ')) AS token FROM documents
       |), tf AS (
       |  SELECT doc_id, token, count(*) AS tf FROM t WHERE token <> '' GROUP BY 1, 2
       |), dl AS (
       |  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
       |), dfq AS (
       |  SELECT token, count(*) AS df FROM tf GROUP BY 1
       |), stats AS (
       |  SELECT (SELECT count(*) FROM documents) AS n_docs,
       |    CAST((SELECT sum(dl) FROM dl) AS DOUBLE)
       |      / CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl
       |), wts AS (
       |  SELECT tf.doc_id, tf.token,
       |    CAST(round(round(ln((CAST(stats.n_docs AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5)
       |          / (CAST(dfq.df AS DOUBLE) + 0.5) + 1.0)
       |      * (CAST(tf.tf AS DOUBLE) * 2.2)
       |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (1.0 - 0.75
       |          + 0.75 * CAST(dl.dl AS DOUBLE) / stats.avgdl)), 6) * 1000000) AS BIGINT) AS w_i
       |  FROM tf JOIN dl USING (doc_id) JOIN dfq USING (token) CROSS JOIN stats
       |), qterms AS (
       |  SELECT doc_id AS query_id, token, w_i AS qw_i,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY w_i DESC, token) AS qrk
       |  FROM wts WHERE doc_id < 10
       |), shits AS (
       |  SELECT q.query_id, w.doc_id, CAST(sum(q.qw_i * w.w_i) AS BIGINT) AS score_i
       |  FROM wts w JOIN (SELECT * FROM qterms WHERE qrk <= 3) q USING (token)
       |  WHERE w.doc_id <> q.query_id
       |  GROUP BY 1, 2
       |), sparse AS (
       |  SELECT query_id, doc_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score_i DESC, doc_id) AS rk_s
       |  FROM shits QUALIFY rk_s <= 20
       |), fused AS (
       |  SELECT coalesce(d.query_id, s.query_id) AS query_id,
       |    coalesce(d.doc_id, s.doc_id) AS doc_id,
       |    coalesce(1000000000 // (60 + d.rk_d), 0)
       |      + coalesce(1000000000 // (60 + s.rk_s), 0) AS rrf_i
       |  FROM dense d FULL JOIN sparse s
       |    ON d.query_id = s.query_id AND d.doc_id = s.doc_id
       |), ranked AS (
       |  SELECT query_id, doc_id, CAST(rrf_i AS BIGINT) AS rrf_i,
       |    row_number() OVER (PARTITION BY query_id ORDER BY rrf_i DESC, doc_id) AS rk
       |  FROM fused
       |)""".stripMargin

  /** The sha-derived 64-bit SimHash signatures + capped 16-bit chunk
    * banding, as shared CTEs: `sims` = (doc_id, sim), `chk` = the
    * below-cap banded view. Shared by the dedup_simhash serving oracle
    * and the simhash_recall audit so the two replays cannot drift. */
  private lazy val SIMHASH_CTES: String =
    s"""t AS (
       |  SELECT doc_id, unnest(str_split($NORM, ' ')) AS tk FROM documents
       |), h AS (
       |  SELECT doc_id, CAST('0x' || substr(sha256(tk), 1, 16) AS UBIGINT) AS hv FROM t
       |), v AS (
       |  SELECT doc_id, j, sum(CASE WHEN (hv >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS vote
       |  FROM h CROSS JOIN range(0, 64) r(j) GROUP BY doc_id, j
       |), sims AS (
       |  SELECT doc_id, CAST(sum(CASE WHEN vote > 0
       |    THEN CAST(1 AS UBIGINT) << CAST(j AS INT) ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS sim
       |  FROM v GROUP BY doc_id
       |), chq AS (
       |  SELECT doc_id, sim, c,
       |    CAST((sim >> CAST(16 * c AS INT)) & CAST(65535 AS UBIGINT) AS BIGINT) AS val
       |  FROM sims, unnest([0, 1, 2, 3]) AS u(c)
       |), chk AS (
       |  SELECT chq.* FROM chq JOIN (
       |    SELECT c, val FROM chq GROUP BY c, val
       |    HAVING count(*) <= ${Dedup.bandBucketCap}
       |  ) ok USING (c, val)
       |)""".stripMargin

  /** The predicted-pixel aHash replay + capped chunk banding, as
    * shared CTEs: `hv` = (doc_id, ph, ptot), `kept` = the below-cap
    * banded view. Shared by the mm_dedup serving oracle and the
    * mm_recall audit so the two replays cannot drift. */
  private lazy val PHASH_CTES: String =
    s"""b AS (
       |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
       |  FROM documents
       |), dims AS (
       |  SELECT doc_id, hx, n,
       |    least(64, greatest(1, n)) AS w,
       |    greatest(1, (n + least(64, greatest(1, n)) - 1)
       |      // least(64, greatest(1, n))) AS h
       |  FROM b
       |), bytes AS (
       |  SELECT doc_id, n, w, h,
       |    list_transform(range(0, n), i ->
       |      CAST('0x' || substr(hx, 2 * CAST(i AS INT) + 1, 2) AS INT)) AS bs
       |  FROM dims
       |), tvals AS (
       |  SELECT doc_id, t,
       |    CASE WHEN (((t // 8) * h // 8) * w + ((t % 8) * w // 8)) < n
       |      THEN bs[CAST((((t // 8) * h // 8) * w + ((t % 8) * w // 8)) AS INT) + 1]
       |      ELSE 0 END AS v
       |  FROM bytes, unnest(range(0, 64)) AS u(t)
       |), tot AS (
       |  SELECT doc_id, sum(v) AS tot FROM tvals GROUP BY doc_id
       |), hv AS (
       |  SELECT tvals.doc_id,
       |    CAST(sum(CASE WHEN 64 * v > tot
       |      THEN CAST(1 AS UBIGINT) << CAST(t AS INT)
       |      ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS ph,
       |    CAST(max(tot) AS BIGINT) AS ptot
       |  FROM tvals JOIN tot USING (doc_id) GROUP BY tvals.doc_id
       |), ch AS (
       |  SELECT doc_id, ph, ptot, c,
       |    CAST((ph >> CAST(16 * c AS INT)) & CAST(65535 AS UBIGINT) AS BIGINT) AS val
       |  FROM hv, unnest([0, 1, 2, 3]) AS u(c)
       |), kept AS (
       |  SELECT ch.* FROM ch JOIN (
       |    SELECT c, val FROM ch GROUP BY c, val
       |    HAVING count(*) <= ${Multimodal.phashBucketCap}
       |  ) ok USING (c, val)
       |)""".stripMargin

  /** The operator-contract pair verify (degenerate-pair brightness
    * gate), shared by both mm oracles. */
  private def phashVerifySql(x: String, y: String): String =
    s"""(least(bit_count($x.ph), 64 - bit_count($x.ph)) > ${Multimodal.phashDegenerateBits}
       |    OR least(bit_count($y.ph), 64 - bit_count($y.ph)) > ${Multimodal.phashDegenerateBits}
       |    OR abs($x.ptot - $y.ptot) <= ${Multimodal.phashBrightnessTol})""".stripMargin

  /** The sign-LSH replay (16 sha-derived hyperplanes, 4-bit bands,
    * candidate join, exact-cosine re-rank) as shared CTEs: `e` = the
    * vector table, `ranked` = the LSH ranking. Shared by the knn_lsh
    * serving oracle and the knn_recall_lsh audit so the audited
    * ranking cannot drift from the served one. */
  private lazy val LSH_CTES: String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |proj AS (
       |  SELECT vec_id, p,
       |    list_reduce(list_transform(range(0, len(v)), i ->
       |      v[CAST(i AS INT) + 1] *
       |      ((CAST('0x' || substr(sha256('hyperplane|' || CAST(p AS VARCHAR) || '|' || CAST(i AS VARCHAR)), 1, 16) AS UBIGINT)
       |        % 1000000) / 1000000.0 - 0.5)
       |    ), (a, x) -> a + x) AS proj
       |  FROM e CROSS JOIN range(0, 16) r(p)
       |), sigs AS (
       |  SELECT vec_id, CAST(sum(CASE WHEN proj > 0
       |    THEN CAST(1 AS UBIGINT) << CAST(p AS INT) ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS sig
       |  FROM proj GROUP BY vec_id
       |), bands AS (
       |  SELECT vec_id, b, (sig >> CAST(b * 4 AS INT)) & 15 AS bucket
       |  FROM sigs CROSS JOIN range(0, 4) rb(b)
       |), cand AS (
       |  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id
       |  FROM bands qb JOIN bands cb ON qb.b = cb.b AND qb.bucket = cb.bucket
       |  WHERE qb.vec_id < 10 AND cb.vec_id <> qb.vec_id
       |), ranked AS (
       |  SELECT c.query_id, c.vec_id,
       |    round(${cosSql("ce.v", "qe.v")}, 6) AS cos,
       |    row_number() OVER (PARTITION BY c.query_id ORDER BY
       |      round(${cosSql("ce.v", "qe.v")}, 6) DESC, c.vec_id) AS rk
       |  FROM cand c
       |  JOIN e ce ON ce.vec_id = c.vec_id
       |  JOIN e qe ON qe.vec_id = c.query_id
       |)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // 143: the quality chain + fixed bands + the same salted-md5
    // shard/position arithmetic as the corpus_shard oracle
    "corpus_curriculum" ->
      s"""WITH $QUALITY_CTES, staged AS (
         |  SELECT doc_id, quality,
         |    CASE WHEN quality >= 0.75 THEN 0 WHEN quality >= 0.5 THEN 1
         |         WHEN quality >= 0.25 THEN 2 ELSE 3 END AS phase,
         |    md5('cur:' || CAST(doc_id AS VARCHAR)) AS k,
         |    CAST(('0x' || substr(md5('cur:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
         |      % 8 AS BIGINT) AS shard_id
         |  FROM qcq
         |)
         |SELECT CAST(phase AS BIGINT) AS phase, shard_id,
         |  CAST(row_number() OVER (PARTITION BY phase, shard_id
         |    ORDER BY k, doc_id) AS BIGINT) AS pos,
         |  doc_id, quality
         |FROM staged ORDER BY phase, shard_id, pos""".stripMargin,
    // 41: same salted-md5 bucket arithmetic as Sampling.hashBucket
    "sample_stratified" ->
      """SELECT doc_id, lang, source, bucket FROM (
        |  SELECT doc_id, lang, source,
        |    CAST(('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |      % 1000000 AS BIGINT) AS bucket
        |  FROM documents
        |) WHERE bucket < (CASE WHEN lang = 'en' THEN 500000
        |                       WHEN lang IN ('de','fr') THEN 300000
        |                       ELSE 100000 END)
        |ORDER BY doc_id""".stripMargin,
    // 52: same widen-to-double + multiply-divide-add-floor chain as
    // Knn.quantizeInt8
    "embed_quantize" ->
      """WITH staged AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |  FROM embeddings
        |), quant AS (
        |  SELECT vec_id, mx,
        |    CASE WHEN mx = 0 THEN list_transform(xd, x -> 0)
        |      ELSE list_transform(xd, x -> CAST(floor(x * 127.0 / mx + 0.5) AS INT))
        |    END AS q
        |  FROM staged
        |)
        |SELECT vec_id, round(mx / 127.0, 6) AS scale,
        |  CAST(len(q) AS BIGINT) AS n_dims,
        |  CAST(list_sum(q) AS BIGINT) AS sum_q,
        |  CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS sum_q2,
        |  CAST(list_min(q) AS INT) AS min_q,
        |  CAST(list_max(q) AS INT) AS max_q
        |FROM quant ORDER BY vec_id""".stripMargin,
    // 50: same normalization + 8-token shingle construction as
    // Dedup.shingles(text, 8)
    "decontaminate" ->
      s"""WITH toks8 AS (
         |  SELECT doc_id, str_split($NORM, ' ') AS w FROM documents
         |), sh8 AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
         |    ELSE list_transform(range(1, len(w) - 6),
         |      i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
         |           w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]) END)) AS s
         |  FROM toks8
         |), bench AS (
         |  SELECT DISTINCT s FROM sh8 WHERE doc_id % 20 = 7
         |), corp AS (
         |  SELECT doc_id, s FROM sh8 WHERE doc_id % 20 <> 7
         |)
         |SELECT c.doc_id, count(*) AS n_shared
         |FROM corp c JOIN bench b ON c.s = b.s
         |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    // 67b: same md5 hash-rank window arithmetic
    "sample_percap" ->
      """SELECT doc_id, lang, rk FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents
        |) WHERE rk <= 50 ORDER BY doc_id""".stripMargin,
    // 80: same u=(bucket+0.5)/1e6 draw; key = -round(ln(u),9)/w — the
    // ln is rounded onto a grid both engines agree on, the division is
    // a single IEEE-exact op, so wkey is bit-identical to Spark's
    "sample_weighted" ->
      """SELECT doc_id, lang, n_chars, wkey FROM (
        |  SELECT doc_id, lang, n_chars,
        |    CASE WHEN CAST(n_chars AS DOUBLE) <= 0 THEN CAST('inf' AS DOUBLE)
        |      ELSE -round(ln(
        |        (CAST(('0x' || substr(md5('wtd:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |          % 1000000 AS BIGINT) + 0.5) / 1000000.0), 9)
        |        / CAST(n_chars AS DOUBLE) END AS wkey
        |  FROM documents
        |) ORDER BY wkey ASC, doc_id LIMIT 200""".stripMargin,
    // 48: exact-integer group masses; one double rate expression in
    // the same operation order as Sampling.mixtureSample
    "sample_mixture" ->
      """WITH g AS (
        |  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS mass FROM documents GROUP BY lang
        |), t AS (
        |  SELECT CAST(sum(mass) AS BIGINT) AS total FROM g
        |), r AS (
        |  SELECT lang, CASE WHEN mass = 0 THEN 1000000
        |    ELSE CAST(floor(least(1.0,
        |      0.2 * CAST(total AS DOUBLE) / CAST(mass AS DOUBLE)) * 1000000) AS BIGINT)
        |    END AS thr
        |  FROM g, t
        |)
        |SELECT doc_id, lang, source, bucket FROM (
        |  SELECT d.doc_id, d.lang, d.source, r.thr,
        |    CAST(('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |      % 1000000 AS BIGINT) AS bucket
        |  FROM documents d JOIN r ON d.lang = r.lang
        |) WHERE bucket < thr ORDER BY doc_id""".stripMargin,
    // 144: the lmscore replay joined to sources, then the 3-round
    // linearized multiplicative-weights update in exact BIGINT (all
    // positive operands, so DuckDB // == Spark div), the same
    // quota/threshold arithmetic, and the drm-salted lattice
    "sample_doremi" -> {
      val roundCtes = (1 to 3).map { t =>
        val prev = if (t == 1) "f1" else s"w${t - 1}n"
        s"""w$t AS (
           |  SELECT source, n_g, nn, excess, factor,
           |    (w * factor) // 1000000 AS wr
           |  FROM $prev
           |), w${t}n AS (
           |  SELECT source, n_g, nn, excess, factor,
           |    CAST((wr * 1000000) // (sum(wr) OVER ()) AS BIGINT) AS w
           |  FROM w$t
           |)""".stripMargin
      }.mkString(", ")
      s"""WITH $LM_CTES, si AS (
         |  SELECT l.doc_id, d.source,
         |    CAST(round(l.avg_logprob * 1000000) AS BIGINT) AS s_mi
         |  FROM lmsc l JOIN documents d USING (doc_id)
         |), dom AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_g,
         |    CAST(sum(s_mi) AS BIGINT) AS sum_s
         |  FROM si GROUP BY source
         |), tot AS (
         |  SELECT CAST(sum(n_g) AS BIGINT) AS nn, CAST(sum(sum_s) AS BIGINT) AS ss
         |  FROM dom
         |), f0 AS (
         |  SELECT source, n_g, nn,
         |    CAST(floor(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE)) AS BIGINT)
         |      - CAST(floor(CAST(sum_s AS DOUBLE) / CAST(n_g AS DOUBLE)) AS BIGINT) AS excess
         |  FROM dom CROSS JOIN tot
         |), f1 AS (
         |  SELECT source, n_g, nn, excess,
         |    1000000 + greatest(-250000, least(250000,
         |      CAST(floor(CAST(excess AS DOUBLE) / 2.0) AS BIGINT))) AS factor,
         |    CAST(1000000 AS BIGINT) AS w
         |  FROM f0
         |), $roundCtes, fin AS (
         |  SELECT source, excess, w,
         |    CAST(least(1000000,
         |      (((((nn * 500000) // 1000000) * w) // 1000000) * 1000000) // n_g) AS BIGINT) AS thr
         |  FROM w3n
         |)
         |SELECT doc_id, source, excess_mi, w_mi, thr, bucket FROM (
         |  SELECT si.doc_id, si.source, fin.excess AS excess_mi, fin.w AS w_mi,
         |    fin.thr,
         |    CAST(('0x' || substr(md5('drm:' || CAST(si.doc_id AS VARCHAR)), 1, 8))::UBIGINT
         |      % 1000000 AS BIGINT) AS bucket
         |  FROM si JOIN fin USING (source)
         |) WHERE bucket < thr ORDER BY doc_id""".stripMargin
    },
    // 101: same sqrt-flattened weights on the 1e-6 grid, order-free
    // BIGINT normalizer, and the same fixed-order rate expression as
    // Sampling.temperatureSample (tau=2, budgetFrac=0.5)
    // 116: the water-filling allocation replayed in plain SQL — the
    // same cross-multiplied capped rule, prefix window, and floor
    // division
    "sample_unimax" ->
      """WITH m AS (
        |  SELECT lang AS grp, CAST(sum(n_chars) AS BIGINT) AS mass
        |  FROM documents GROUP BY lang
        |), t AS (
        |  SELECT CAST(sum(mass) AS BIGINT) AS total, count(*) AS n FROM m
        |), s AS (
        |  SELECT grp, mass, n,
        |    (total * 500000) // 1000000 AS budget_total,
        |    row_number() OVER (ORDER BY mass, grp) AS rank,
        |    coalesce(sum(2 * mass) OVER (ORDER BY mass, grp
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
        |  FROM m CROSS JOIN t
        |), f AS (
        |  SELECT *, 2 * mass * (n - rank + 1) <= budget_total - prefix AS capped
        |  FROM s
        |), c AS (
        |  SELECT CAST(coalesce(sum(CASE WHEN capped THEN 2 * mass END), 0) AS BIGINT) AS cap_total,
        |    CAST(sum(CASE WHEN capped THEN 0 ELSE 1 END) AS BIGINT) AS n_unc
        |  FROM f
        |)
        |SELECT grp AS lang, mass, CAST(rank AS BIGINT) AS rank, capped,
        |  CASE WHEN capped THEN 2 * mass
        |       ELSE (budget_total - cap_total) // n_unc END AS budget,
        |  CASE WHEN mass = 0 THEN 0
        |       ELSE ((CASE WHEN capped THEN 2 * mass
        |              ELSE (budget_total - cap_total) // n_unc END) * 10000) // mass
        |  END AS epochs_bp
        |FROM f CROSS JOIN c ORDER BY rank""".stripMargin,
    "sample_temperature" ->
      """WITH g AS (
        |  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS mass FROM documents GROUP BY lang
        |), w AS (
        |  SELECT lang, mass,
        |    CAST(round(sqrt(CAST(mass AS DOUBLE)) * 1000000) AS BIGINT) AS w_i
        |  FROM g
        |), t AS (
        |  SELECT CAST(sum(mass) AS BIGINT) AS total,
        |    CAST(sum(w_i) AS BIGINT) AS sumw_i FROM w
        |), r AS (
        |  SELECT lang, CASE WHEN mass = 0 THEN 1000000
        |    ELSE CAST(floor(least(1.0,
        |      0.5 * (CAST(w_i AS DOUBLE) / CAST(sumw_i AS DOUBLE))
        |          * (CAST(total AS DOUBLE) / CAST(mass AS DOUBLE))) * 1000000) AS BIGINT)
        |    END AS thr
        |  FROM w, t
        |)
        |SELECT doc_id, lang, source, bucket FROM (
        |  SELECT d.doc_id, d.lang, d.source, r.thr,
        |    CAST(('0x' || substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |      % 1000000 AS BIGINT) AS bucket
        |  FROM documents d JOIN r ON d.lang = r.lang
        |) WHERE bucket < thr ORDER BY doc_id""".stripMargin,
    // 96: same 40-bit sha-256-prefix gram hash, the same h·2^20 +
    // (2^20−1−pos) packing and the same CURRENT..3 FOLLOWING frame as
    // the Spark window — min(key) is (min h, rightmost pos) on both
    // engines, so the selected fingerprints replay exactly
    "text_winnow" ->
      s"""WITH $WINNOW_CTES
         |SELECT doc_id, CAST(1048575 - key % 1048576 AS BIGINT) AS pos,
         |  CAST(key // 1048576 AS BIGINT) AS fp
         |FROM sel ORDER BY doc_id, pos""".stripMargin,
    // 99b: same winnowed index, the same df <= 50 boilerplate guard
    // and the same shared >= 3 gate as the Spark join
    "winnow_pairs" ->
      s"""WITH $WINNOW_CTES, wfp AS (
         |  SELECT DISTINCT doc_id, key // 1048576 AS fp FROM sel
         |), kept AS (
         |  SELECT doc_id, fp FROM wfp
         |  WHERE fp IN (SELECT fp FROM wfp GROUP BY fp HAVING count(*) <= 50)
         |), nf AS (
         |  SELECT doc_id, count(*) AS n_fp FROM kept GROUP BY doc_id
         |), pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= 3
         |)
         |SELECT pr.doc_a, pr.doc_b, CAST(pr.shared AS BIGINT) AS shared,
         |  CAST(na.n_fp AS BIGINT) AS n_a, CAST(nb.n_fp AS BIGINT) AS n_b,
         |  round(CAST(pr.shared AS DOUBLE) /
         |    CAST(least(na.n_fp, nb.n_fp) AS DOUBLE), 6) AS score
         |FROM pr JOIN nf na ON pr.doc_a = na.doc_id
         |        JOIN nf nb ON pr.doc_b = nb.doc_id
         |ORDER BY pr.doc_a, pr.doc_b""".stripMargin,
    // 100: same IVF assignment CTEs as dedup_embed, per-vector ranked
    // same-cell neighbors
    "graph_knn" ->
      s"""WITH ${ivfSql()},
         |p AS (
         |  SELECT a.vec_id, b.vec_id AS nb_id,
         |    round(${cosSql("a.v", "b.v")}, 6) AS cos
         |  FROM assigned a JOIN assigned b
         |    ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id
         |), r AS (
         |  SELECT vec_id, nb_id, cos,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, nb_id) AS rk
         |  FROM p
         |)
         |SELECT vec_id, CAST(rk AS INT) AS rk, nb_id, cos
         |FROM r WHERE rk <= 3 ORDER BY vec_id, rk""".stripMargin,
    // 102: same mutual-top-3 symmetrization, min-label components via
    // the recursive closure (the dedup_cluster pattern), singletons
    // self-labeled through the left join
    "graph_clusters" ->
      s"""WITH RECURSIVE ${ivfSql()},
         |p AS (
         |  SELECT a.vec_id, b.vec_id AS nb_id,
         |    round(${cosSql("a.v", "b.v")}, 6) AS cos
         |  FROM assigned a JOIN assigned b
         |    ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id
         |), r AS (
         |  SELECT vec_id, nb_id,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, nb_id) AS rk
         |  FROM p
         |), e0 AS (
         |  SELECT vec_id AS doc_a, nb_id AS doc_b FROM r WHERE rk <= 3
         |), mut AS (
         |  SELECT a.doc_a, a.doc_b FROM e0 a
         |  JOIN e0 b ON a.doc_a = b.doc_b AND a.doc_b = b.doc_a
         |  WHERE a.doc_a < a.doc_b
         |), edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM mut
         |  UNION ALL SELECT doc_b, doc_a FROM mut
         |), reach AS (
         |  SELECT src AS id, src AS lab FROM edges
         |  UNION
         |  SELECT eg.src, rc.lab FROM edges eg JOIN reach rc ON rc.id = eg.dst
         |), clu AS (
         |  SELECT id AS vec_id, min(lab) AS cluster_id FROM reach GROUP BY id
         |)
         |SELECT allv.vec_id, coalesce(clu.cluster_id, allv.vec_id) AS cluster_id
         |FROM (SELECT vec_id FROM embeddings) allv LEFT JOIN clu USING (vec_id)
         |ORDER BY vec_id""".stripMargin,
    // 97: same md5 feature buckets, the same 1e-6-grid ln weights and
    // the same order-free BIGINT dot product as the Spark side
    "sample_importance" ->
      s"""WITH tk AS (
         |  SELECT doc_id, lang, unnest(str_split($NORM, ' ')) AS tok
         |  FROM documents
         |), bk AS (
         |  SELECT doc_id, lang,
         |    CAST(('0x' || substr(md5('dsir:' || tok), 1, 8))::UBIGINT
         |      % 64 AS BIGINT) AS b
         |  FROM tk WHERE tok <> ''
         |), cnt AS (
         |  SELECT b, count(*) AS raw,
         |    sum(CASE WHEN lang IN ('de','fr') THEN 1 ELSE 0 END) AS tgt
         |  FROM bk GROUP BY b
         |), w AS (
         |  SELECT b, CAST(round(round(ln((CAST(tgt AS DOUBLE) + 1.0)
         |    / (CAST(raw AS DOUBLE) + 1.0)), 6) * 1000000) AS BIGINT) AS w_i
         |  FROM cnt
         |)
         |SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_toks,
         |  CAST(sum(w_i) AS BIGINT) AS score_i
         |FROM bk JOIN w USING (b) GROUP BY doc_id, lang
         |ORDER BY score_i DESC, doc_id LIMIT 50""".stripMargin,
    // 98: same normalized-text duplicate window + per-source aggregate;
    // quantile_cont matches Spark's exact percentile interpolation
    "corpus_stats" ->
      s"""WITH s0 AS (
         |  SELECT source, lang, n_chars,
         |    CASE WHEN $NORM = '' THEN 0
         |         ELSE len(str_split($NORM, ' ')) END AS n_toks,
         |    count(*) OVER (PARTITION BY $NORM) AS n_same
         |  FROM documents
         |)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |  round(avg(CAST(n_chars AS DOUBLE)), 6) AS mean_chars,
         |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 6) AS p50_chars,
         |  CAST(sum(CASE WHEN n_same > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs
         |FROM s0 GROUP BY source ORDER BY source""".stripMargin,
    // 42: same tokenizer ([ \t\n\r\f]+ split, empties dropped) and the
    // same 64/16 window arithmetic as Text.chunk
    "doc_chunk" ->
      s"""$DOC_CHUNK_BODY
         |ORDER BY doc_id, chunk_start""".stripMargin,
    // 51: same shard assignment + offset-quota window arithmetic as
    // Text.packChunks over the #42 chunk stream
    "chunk_pack" ->
      s"""WITH $PACK_CTES
         |SELECT shard, pack_id, n_chunks, pack_tokens
         |FROM packs ORDER BY shard, pack_id""".stripMargin,
    // 145: the chunk_pack replay rolled up once more per shard
    "pack_stats" ->
      s"""WITH $PACK_CTES
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_packs,
         |  CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
         |  CAST(sum(pack_tokens) AS BIGINT) AS total_tokens,
         |  CAST(max(pack_tokens) AS BIGINT) AS max_pack_tokens,
         |  CAST(sum(CASE WHEN pack_tokens > 256 THEN 1 ELSE 0 END) AS BIGINT) AS n_overrun,
         |  CAST((sum(pack_tokens) * 1000000) // (count(*) * 256) AS BIGINT) AS fill_ppm
         |FROM packs GROUP BY shard ORDER BY shard""".stripMargin,
    // 30: full sign-LSH replay. Plane weight (p,i) =
    // unsigned(sha64("hyperplane|p|i")) % 1e6 / 1e6 - 0.5; projection is
    // the same sequential fold the kernel runs (list_reduce), bands are
    // 4 × 4 bits (Knn.autoBandBits at this corpus size), exact cosine
    // re-ranks candidates.
    "knn_lsh" ->
      s"""WITH $LSH_CTES
         |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id, cos FROM ranked
         |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,
    // 148c: the LSH ranking joined against the exact ranking at each
    // cutoff (the knn_recall shape; krl_-prefixed CTEs stay clear of
    // the LSH cascade's)
    "knn_recall_lsh" ->
      s"""WITH $LSH_CTES,
         |krl_exr AS (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS erk
         |  FROM (
         |    SELECT qe.vec_id AS query_id, ce.vec_id,
         |      round(${cosSql("ce.v", "qe.v")}, 6) AS cos
         |    FROM e ce CROSS JOIN e qe
         |    WHERE qe.vec_id < 10 AND ce.vec_id <> qe.vec_id
         |  )
         |), krl_ks AS (SELECT CAST(unnest([1, 5]) AS BIGINT) AS k),
         |krl_hits AS (
         |  SELECT r.query_id, krl_ks.k, CAST(count(*) AS BIGINT) AS hits
         |  FROM ranked r JOIN krl_exr x
         |    ON r.query_id = x.query_id AND r.vec_id = x.vec_id
         |  CROSS JOIN krl_ks
         |  WHERE r.rk <= krl_ks.k AND x.erk <= krl_ks.k
         |  GROUP BY r.query_id, krl_ks.k
         |)
         |SELECT b.query_id, b.k, coalesce(h.hits, CAST(0 AS BIGINT)) AS hits,
         |  round(CAST(coalesce(h.hits, 0) AS DOUBLE) / CAST(b.k AS DOUBLE), 6) AS recall
         |FROM (SELECT qe.vec_id AS query_id, krl_ks.k
         |      FROM e qe CROSS JOIN krl_ks WHERE qe.vec_id < 10) b
         |LEFT JOIN krl_hits h ON b.query_id = h.query_id AND b.k = h.k
         |ORDER BY b.query_id, b.k""".stripMargin,
    // 148d: the truncated-dim audit — approximate side ranks by cosine
    // over the first 16 components (list slice), exact side is the
    // full-dim ranking; same hits/base shape as knn_recall.
    "knn_recall_trunc" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |krt_apx AS (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS ark
         |  FROM (
         |    SELECT qe.vec_id AS query_id, ce.vec_id,
         |      round(${cosSql("ce.v[1:16]", "qe.v[1:16]")}, 6) AS cos
         |    FROM e ce CROSS JOIN e qe
         |    WHERE qe.vec_id < 10 AND ce.vec_id <> qe.vec_id
         |  )
         |), krt_exr AS (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS erk
         |  FROM (
         |    SELECT qe.vec_id AS query_id, ce.vec_id,
         |      round(${cosSql("ce.v", "qe.v")}, 6) AS cos
         |    FROM e ce CROSS JOIN e qe
         |    WHERE qe.vec_id < 10 AND ce.vec_id <> qe.vec_id
         |  )
         |), krt_ks AS (SELECT CAST(unnest([1, 5, 10]) AS BIGINT) AS k),
         |krt_hits AS (
         |  SELECT a.query_id, krt_ks.k, CAST(count(*) AS BIGINT) AS hits
         |  FROM krt_apx a JOIN krt_exr x
         |    ON a.query_id = x.query_id AND a.vec_id = x.vec_id
         |  CROSS JOIN krt_ks
         |  WHERE a.ark <= krt_ks.k AND x.erk <= krt_ks.k
         |  GROUP BY a.query_id, krt_ks.k
         |)
         |SELECT b.query_id, b.k, coalesce(h.hits, CAST(0 AS BIGINT)) AS hits,
         |  round(CAST(coalesce(h.hits, 0) AS DOUBLE) / CAST(b.k AS DOUBLE), 6) AS recall
         |FROM (SELECT qe.vec_id AS query_id, krt_ks.k
         |      FROM e qe CROSS JOIN krt_ks WHERE qe.vec_id < 10) b
         |LEFT JOIN krt_hits h ON b.query_id = h.query_id AND b.k = h.k
         |ORDER BY b.query_id, b.k""".stripMargin,
    // 26: full LSH replay — sha-256-prefix minhash signature, banded
    // keys, candidate join, exact-Jaccard verify (threshold 0.2).
    "dedup_minhash" ->
      s"""WITH $SH3, sig AS (
         |  SELECT doc_id, i, min(substr(sha256(CAST(i AS VARCHAR) || '|' || s), 1, 16)) AS m
         |  FROM sh CROSS JOIN range(0, 32) r(i) GROUP BY doc_id, i
         |), band AS (
         |  SELECT doc_id, i // 4 AS band, string_agg(m, ',' ORDER BY i) AS bkey
         |  FROM sig GROUP BY doc_id, i // 4
         |), bandk AS (
         |  SELECT band.* FROM band JOIN (
         |    SELECT band, bkey FROM band GROUP BY band, bkey
         |    HAVING count(*) <= ${Dedup.bandBucketCap}
         |  ) ok USING (band, bkey)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bandk a JOIN bandk b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |), pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS n_a, b.n_sh AS n_b,
         |    count(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
         |  GROUP BY 1, 2, 3, 4
         |)
         |SELECT doc_a, doc_b,
         |  round(CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE), 6) AS jaccard
         |FROM pairs
         |WHERE round(CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE), 6) >= 0.2
         |ORDER BY doc_a, doc_b""".stripMargin,
    // 25d: all four flag-set replays over the shifted-slice union —
    // exact fingerprints, the capped minhash replay, the capped
    // simhash replay (SH3/SIMHASH_CTES retargeted at the union), the
    // jaccard pairs — then the tagged-union self-join matrix.
    "dedup_overlap" ->
      s"""WITH ov AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id <= 25
         |), ${SH3.replace("FROM documents", "FROM ov")},
         |${SIMHASH_CTES.replace("FROM documents", "FROM ov")},
         |fpc AS (
         |  SELECT doc_id, sha256($NORM) AS fp FROM ov
         |), fdup AS (
         |  SELECT fp FROM fpc GROUP BY fp HAVING count(*) >= 2
         |), eids AS (
         |  SELECT doc_id FROM fpc WHERE fp IN (SELECT fp FROM fdup)
         |), sig AS (
         |  SELECT doc_id, i, min(substr(sha256(CAST(i AS VARCHAR) || '|' || s), 1, 16)) AS m
         |  FROM sh CROSS JOIN range(0, 32) r(i) GROUP BY doc_id, i
         |), band AS (
         |  SELECT doc_id, i // 4 AS band, string_agg(m, ',' ORDER BY i) AS bkey
         |  FROM sig GROUP BY doc_id, i // 4
         |), bandk AS (
         |  SELECT band.* FROM band JOIN (
         |    SELECT band, bkey FROM band GROUP BY band, bkey
         |    HAVING count(*) <= ${Dedup.bandBucketCap}
         |  ) ok USING (band, bkey)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bandk a JOIN bandk b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |), mpair AS (
         |  SELECT doc_a, doc_b FROM (
         |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS n_a, b.n_sh AS n_b,
         |      count(*) AS inter
         |    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |    JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
         |    GROUP BY 1, 2, 3, 4
         |  ) p WHERE round(CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE), 6) >= 0.2
         |), mids AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT doc_a AS doc_id FROM mpair UNION ALL SELECT doc_b FROM mpair)
         |), spair AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM chk a JOIN chk b ON a.c = b.c AND a.val = b.val AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sim, b.sim)) <= 3
         |), sids AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT doc_a AS doc_id FROM spair UNION ALL SELECT doc_b FROM spair)
         |), jpair AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, a.n_sh, b.n_sh
         |  HAVING round(CAST(count(*) AS DOUBLE) / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE), 6) >= 0.5
         |), jids AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT doc_a AS doc_id FROM jpair UNION ALL SELECT doc_b FROM jpair)
         |), tagged AS (
         |  SELECT 'exact' AS m, doc_id FROM eids
         |  UNION ALL SELECT 'minhash', doc_id FROM mids
         |  UNION ALL SELECT 'simhash', doc_id FROM sids
         |  UNION ALL SELECT 'jaccard', doc_id FROM jids
         |)
         |SELECT a.m AS method_a, b.m AS method_b, CAST(count(*) AS BIGINT) AS n_both
         |FROM tagged a JOIN tagged b ON a.doc_id = b.doc_id AND a.m <= b.m
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // 90: asymmetric LSH replay over the reconstructed corpus+batch —
    // same signature/band arithmetic as dedup_minhash, candidates
    // restricted to (new, old) pairs, plus the exact-fingerprint path
    "dedup_incremental" ->
      s"""WITH di AS (
         |  SELECT doc_id, text, 0 AS is_new FROM documents WHERE doc_id <= 450
         |  UNION ALL SELECT doc_id, text, 1 FROM documents WHERE doc_id > 450
         |  UNION ALL SELECT doc_id + 1000000, text, 1 FROM documents WHERE doc_id <= 50
         |), toks AS (
         |  SELECT doc_id, is_new, str_split($NORM, ' ') AS w FROM di
         |), sh AS (
         |  SELECT doc_id, is_new, n_sh, s FROM (
         |    SELECT doc_id, is_new,
         |      list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
         |        ELSE list_transform(range(1, len(w) - 1),
         |          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS ss
         |    FROM toks
         |  ), LATERAL (SELECT len(ss) AS n_sh), unnest(ss) AS t(s)
         |), sig AS (
         |  SELECT doc_id, is_new, i, min(substr(sha256(CAST(i AS VARCHAR) || '|' || s), 1, 16)) AS m
         |  FROM sh CROSS JOIN range(0, 32) r(i) GROUP BY doc_id, is_new, i
         |), band AS (
         |  SELECT doc_id, is_new, i // 4 AS band, string_agg(m, ',' ORDER BY i) AS bkey
         |  FROM sig GROUP BY doc_id, is_new, i // 4
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_new, b.doc_id AS doc_old
         |  FROM band a JOIN band b ON a.band = b.band AND a.bkey = b.bkey
         |  WHERE a.is_new = 1 AND b.is_new = 0
         |), pairs AS (
         |  SELECT c.doc_new, a.n_sh AS n_a, b.n_sh AS n_b, c.doc_old, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s
         |  JOIN cand c ON c.doc_new = a.doc_id AND c.doc_old = b.doc_id
         |  GROUP BY 1, 2, 3, 4
         |), nearids AS (
         |  SELECT DISTINCT doc_new AS doc_id FROM pairs
         |  WHERE round(CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE), 6) >= 0.2
         |), fpo AS (
         |  SELECT DISTINCT sha256($NORM) AS fp FROM di WHERE is_new = 0
         |), fpn AS (
         |  SELECT doc_id, sha256($NORM) AS fp FROM di WHERE is_new = 1
         |)
         |SELECT n.doc_id,
         |  (n.fp IN (SELECT fp FROM fpo)) AS dup_exact,
         |  (n.doc_id IN (SELECT doc_id FROM nearids)) AS dup_near,
         |  NOT ((n.fp IN (SELECT fp FROM fpo))
         |    OR (n.doc_id IN (SELECT doc_id FROM nearids))) AS kept
         |FROM fpn n ORDER BY n.doc_id""".stripMargin,
    // 25b/25c: Bloom membership — replay the k sha-derived positions
    // as hex-prefix STRINGS (the engine parses the same prefixes to
    // bit indices; hex→int is injective, so string-set membership ==
    // bitmap membership, false positives included). Constants
    // interpolated from Dedup so engine and oracle cannot drift.
    "dedup_bloom" -> BLOOM_SQL,
    "dedup_bloom_indexed" -> BLOOM_SQL,
    // 95: the persisted-index probe must equal the in-session
    // asymmetric LSH — replay it (corpus <= 450 vs batch > 450) and
    // emit the verified pairs; the lake round-trip is invisible
    "dedup_indexed" ->
      s"""WITH di AS (
         |  SELECT doc_id, text, 0 AS is_new FROM documents WHERE doc_id <= 450
         |  UNION ALL SELECT doc_id, text, 1 FROM documents WHERE doc_id > 450
         |), toks AS (
         |  SELECT doc_id, is_new, str_split($NORM, ' ') AS w FROM di
         |), sh AS (
         |  SELECT doc_id, is_new, n_sh, s FROM (
         |    SELECT doc_id, is_new,
         |      list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
         |        ELSE list_transform(range(1, len(w) - 1),
         |          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS ss
         |    FROM toks
         |  ), LATERAL (SELECT len(ss) AS n_sh), unnest(ss) AS t(s)
         |), sig AS (
         |  SELECT doc_id, is_new, i, min(substr(sha256(CAST(i AS VARCHAR) || '|' || s), 1, 16)) AS m
         |  FROM sh CROSS JOIN range(0, 32) r(i) GROUP BY doc_id, is_new, i
         |), band AS (
         |  SELECT doc_id, is_new, i // 4 AS band, string_agg(m, ',' ORDER BY i) AS bkey
         |  FROM sig GROUP BY doc_id, is_new, i // 4
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_new, b.doc_id AS doc_old
         |  FROM band a JOIN band b ON a.band = b.band AND a.bkey = b.bkey
         |  WHERE a.is_new = 1 AND b.is_new = 0
         |), pairs AS (
         |  SELECT c.doc_new, a.n_sh AS n_a, b.n_sh AS n_b, c.doc_old, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s
         |  JOIN cand c ON c.doc_new = a.doc_id AND c.doc_old = b.doc_id
         |  GROUP BY 1, 2, 3, 4
         |)
         |SELECT doc_new, doc_old,
         |  round(CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE), 6) AS jaccard
         |FROM pairs
         |WHERE round(CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE), 6) >= 0.2
         |ORDER BY doc_new, doc_old""".stripMargin,
    // 91: exact truth set (lossless prefix-filter equivalent) + full
    // minhash replay at the same threshold, integer recall report
    "dedup_recall" ->
      s"""WITH $SH3, jp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*) AS inter, a.n_sh AS n_a, b.n_sh AS n_b
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 4, 5
         |  HAVING round(CAST(count(*) AS DOUBLE) / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE), 6) >= 0.5
         |), sig AS (
         |  SELECT doc_id, i, min(substr(sha256(CAST(i AS VARCHAR) || '|' || s), 1, 16)) AS m
         |  FROM sh CROSS JOIN range(0, 32) r(i) GROUP BY doc_id, i
         |), band AS (
         |  SELECT doc_id, i // 4 AS band, string_agg(m, ',' ORDER BY i) AS bkey
         |  FROM sig GROUP BY doc_id, i // 4
         |), bandk AS (
         |  SELECT band.* FROM band JOIN (
         |    SELECT band, bkey FROM band GROUP BY band, bkey
         |    HAVING count(*) <= ${Dedup.bandBucketCap}
         |  ) ok USING (band, bkey)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bandk a JOIN bandk b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |), mh AS (
         |  SELECT c.doc_a, c.doc_b FROM (
         |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS n_a, b.n_sh AS n_b,
         |      count(*) AS inter
         |    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |    JOIN cand c2 ON c2.doc_a = a.doc_id AND c2.doc_b = b.doc_id
         |    GROUP BY 1, 2, 3, 4
         |  ) c
         |  WHERE round(CAST(c.inter AS DOUBLE) / CAST(c.n_a + c.n_b - c.inter AS DOUBLE), 6) >= 0.5
         |), ${recallReportSql("jp", "mh")}""".stripMargin,
    // 93: shared-shingle join (any pair with C >= t shares shingles),
    // directed containment on the probe side's set size
    "text_containment" ->
      s"""WITH $SH3, cp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*) AS inter, a.n_sh AS n_a
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2, 4
         |)
         |SELECT doc_a, doc_b,
         |  round(CAST(inter AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS containment
         |FROM cp
         |WHERE round(CAST(inter AS DOUBLE) / CAST(n_a AS DOUBLE), 6) >= 0.6
         |ORDER BY doc_a, doc_b""".stripMargin,
    // 79: same exact-Jaccard edge set, ordered three-way self-join
    "graph_triangles" ->
      s"""WITH $SH3, jp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*) AS inter, a.n_sh AS n_a, b.n_sh AS n_b
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 4, 5
         |  HAVING round(CAST(count(*) AS DOUBLE) / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE), 6) >= 0.5
         |), e AS (
         |  SELECT doc_a AS a, doc_b AS b FROM jp
         |)
         |SELECT e1.a AS doc_a, e1.b AS doc_b, e2.b AS doc_c
         |FROM e e1 JOIN e e2 ON e1.b = e2.a
         |JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
         |ORDER BY 1, 2, 3""".stripMargin,
    // 83: replay of sample_i = (byte_i - 128) * 256 and the integer
    // signal sums; zero counts as non-negative in the sign-change
    // test, exactly as the codec computes it
    "mm_audio" ->
      s"""WITH b AS (
         |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
         |  FROM documents
         |), ss AS (
         |  SELECT doc_id, n,
         |    list_transform(range(0, n), i ->
         |      (CAST('0x' || substr(hx, 2 * CAST(i AS INT) + 1, 2) AS INT) - 128) * 256) AS s
         |  FROM b
         |)
         |SELECT doc_id AS media_id,
         |  CAST(n AS BIGINT) AS n_samples,
         |  CAST(n * 1000000 // 8000 AS BIGINT) AS duration_us,
         |  CAST(coalesce(list_sum(list_transform(s, x -> abs(x))), 0) AS BIGINT) AS sum_abs,
         |  CAST(coalesce(list_sum(list_transform(s, x -> x * x)), 0) AS BIGINT) AS sum_sq,
         |  CAST(coalesce(list_sum(list_transform(range(1, n), i ->
         |    CASE WHEN (s[CAST(i AS INT)] < 0) <> (s[CAST(i AS INT) + 1] < 0)
         |      THEN 1 ELSE 0 END)), 0) AS BIGINT) AS zero_crossings,
         |  CAST(coalesce(list_max(list_transform(s, x -> abs(x))), 0) AS INT) AS peak
         |FROM ss ORDER BY media_id""".stripMargin,
    // 81: the SAME jaccard edge CTE, then three integer PageRank
    // rounds unrolled — every step is BIGINT div/sum, so the replay is
    // bit-exact regardless of execution order. base/teleport literals
    // mirror Graph.pagerankInt (massScale 10^12, damping 85/100).
    "graph_pagerank" ->
      s"""WITH $SH3, jp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*) AS inter, a.n_sh AS n_a, b.n_sh AS n_b
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 4, 5
         |  HAVING round(CAST(count(*) AS DOUBLE) / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE), 6) >= 0.5
         |), edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jp
         |  UNION ALL SELECT doc_b, doc_a FROM jp
         |), deg AS (
         |  SELECT src AS id, count(*) AS deg FROM edges GROUP BY 1
         |), consts AS (
         |  SELECT CAST(1000000000000 // count(*) AS BIGINT) AS base,
         |         CAST(15 * (1000000000000 // count(*)) // 100 AS BIGINT) AS tp
         |  FROM deg
         |), r0 AS (
         |  SELECT id, deg, (SELECT base FROM consts) AS r FROM deg
         |), r1 AS (
         |  SELECT d.id, d.deg, (SELECT tp FROM consts)
         |    + CAST(85 * coalesce(i.s, 0) // 100 AS BIGINT) AS r
         |  FROM deg d LEFT JOIN (
         |    SELECT e.dst AS id, sum(r.r // r.deg) AS s
         |    FROM edges e JOIN r0 r ON r.id = e.src GROUP BY 1) i ON i.id = d.id
         |), r2 AS (
         |  SELECT d.id, d.deg, (SELECT tp FROM consts)
         |    + CAST(85 * coalesce(i.s, 0) // 100 AS BIGINT) AS r
         |  FROM deg d LEFT JOIN (
         |    SELECT e.dst AS id, sum(r.r // r.deg) AS s
         |    FROM edges e JOIN r1 r ON r.id = e.src GROUP BY 1) i ON i.id = d.id
         |), r3 AS (
         |  SELECT d.id, d.deg, (SELECT tp FROM consts)
         |    + CAST(85 * coalesce(i.s, 0) // 100 AS BIGINT) AS r
         |  FROM deg d LEFT JOIN (
         |    SELECT e.dst AS id, sum(r.r // r.deg) AS s
         |    FROM edges e JOIN r2 r ON r.id = e.src GROUP BY 1) i ON i.id = d.id
         |)
         |SELECT id AS doc_id, CAST(r AS BIGINT) AS rank_i
         |FROM r3 ORDER BY doc_id""".stripMargin,
    // 38: transitive closure over the exact Jaccard>=0.5 pair graph —
    // min reachable doc_id per node == the min-label-propagation
    // fixpoint the Spark operator converges to.
    "dedup_cluster" ->
      s"""WITH RECURSIVE $SH3, jp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*) AS inter, a.n_sh AS n_a, b.n_sh AS n_b
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 4, 5
         |  HAVING round(CAST(count(*) AS DOUBLE) / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE), 6) >= 0.5
         |), edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jp
         |  UNION ALL SELECT doc_b, doc_a FROM jp
         |), reach AS (
         |  SELECT src AS id, src AS lab FROM edges
         |  UNION
         |  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst
         |)
         |SELECT id AS doc_id, min(lab) AS cluster_id
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    // 38b: the cluster closure joined back to documents; the election
    // is a per-cluster window argmax on (len DESC, doc_id) — same
    // total order the Spark max(struct) encodes
    "dedup_keep_best" ->
      s"""WITH RECURSIVE $SH3, jp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*) AS inter, a.n_sh AS n_a, b.n_sh AS n_b
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 4, 5
         |  HAVING round(CAST(count(*) AS DOUBLE) / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE), 6) >= 0.5
         |), edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jp
         |  UNION ALL SELECT doc_b, doc_a FROM jp
         |), reach AS (
         |  SELECT src AS id, src AS lab FROM edges
         |  UNION
         |  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst
         |), clu AS (
         |  SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id
         |), mem AS (
         |  SELECT cluster_id, doc_id, CAST(length($NORM) AS BIGINT) AS len
         |  FROM clu JOIN documents USING (doc_id)
         |), rk AS (
         |  SELECT cluster_id, doc_id, len,
         |    row_number() OVER (PARTITION BY cluster_id ORDER BY len DESC, doc_id) AS r,
         |    count(*) OVER (PARTITION BY cluster_id) AS n_members
         |  FROM mem
         |)
         |SELECT cluster_id, doc_id AS kept_id, len AS kept_len,
         |  CAST(n_members AS BIGINT) AS n_members
         |FROM rk WHERE r = 1 ORDER BY cluster_id""".stripMargin,
    // 123: the oracle is a FULL-union from-scratch recompute (same
    // closure as dedup_cluster, all docs self-labeled through the
    // left join) — hashing it against the Spark side's incremental
    // quotient-graph computation verifies the incremental algebra
    "dedup_cluster_inc" ->
      s"""WITH RECURSIVE $SH3, jp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*) AS inter, a.n_sh AS n_a, b.n_sh AS n_b
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 4, 5
         |  HAVING round(CAST(count(*) AS DOUBLE) / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE), 6) >= 0.5
         |), edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jp
         |  UNION ALL SELECT doc_b, doc_a FROM jp
         |), reach AS (
         |  SELECT src AS id, src AS lab FROM edges
         |  UNION
         |  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst
         |), clu AS (
         |  SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id
         |)
         |SELECT d.doc_id, coalesce(clu.cluster_id, d.doc_id) AS cluster_id
         |FROM documents d LEFT JOIN clu USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // 123b: identical from-scratch recompute — the lake-indexed probe
    // must land on the same labels as ground-truth CC over the union
    "dedup_cluster_lake" ->
      s"""WITH RECURSIVE $SH3, jp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*) AS inter, a.n_sh AS n_a, b.n_sh AS n_b
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 4, 5
         |  HAVING round(CAST(count(*) AS DOUBLE) / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE), 6) >= 0.5
         |), edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jp
         |  UNION ALL SELECT doc_b, doc_a FROM jp
         |), reach AS (
         |  SELECT src AS id, src AS lab FROM edges
         |  UNION
         |  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst
         |), clu AS (
         |  SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id
         |)
         |SELECT d.doc_id, coalesce(clu.cluster_id, d.doc_id) AS cluster_id
         |FROM documents d LEFT JOIN clu USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // 125: same per-feature smoothed PSI terms — one exact-integer
    // ratio into ln, 1e-6-grid rounding, BIGINT terms
    "corpus_drift" ->
      s"""WITH cutv AS (
         |  SELECT CAST(floor(count(*) * 0.7) AS BIGINT) AS cut FROM documents
         |), rows0 AS (
         |  SELECT 'lang' AS feature, lang AS bucket,
         |    doc_id < (SELECT cut FROM cutv) AS is_ref FROM documents
         |  UNION ALL
         |  SELECT 'source', source, doc_id < (SELECT cut FROM cutv) FROM documents
         |  UNION ALL
         |  SELECT 'len', 'chars_' || CAST(n_chars // 200 AS VARCHAR),
         |    doc_id < (SELECT cut FROM cutv) FROM documents
         |), cnt AS (
         |  SELECT feature, bucket,
         |    sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS ref_n,
         |    sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cur_n
         |  FROM rows0 GROUP BY 1, 2
         |), tot AS (
         |  SELECT feature, sum(ref_n) AS ref_tot, sum(cur_n) AS cur_tot,
         |    count(*) AS nb
         |  FROM cnt GROUP BY 1
         |)
         |SELECT c.feature, c.bucket, CAST(c.ref_n AS BIGINT) AS ref_n,
         |  CAST(c.cur_n AS BIGINT) AS cur_n,
         |  CAST(round(
         |    round(ln(CAST((c.ref_n + 1) * (t.cur_tot + t.nb) AS DOUBLE)
         |           / CAST((c.cur_n + 1) * (t.ref_tot + t.nb) AS DOUBLE)), 6)
         |    * round(CAST(c.ref_n + 1 AS DOUBLE) / CAST(t.ref_tot + t.nb AS DOUBLE)
         |          - CAST(c.cur_n + 1 AS DOUBLE) / CAST(t.cur_tot + t.nb AS DOUBLE), 6)
         |    * 1000000) AS BIGINT) AS term_i
         |FROM cnt c JOIN tot t USING (feature)
         |ORDER BY c.feature, c.bucket""".stripMargin,
    // 124: same closure, the split lattice hashed on the CLUSTER id
    "corpus_split" ->
      s"""WITH RECURSIVE $SH3, jp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*) AS inter, a.n_sh AS n_a, b.n_sh AS n_b
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 4, 5
         |  HAVING round(CAST(count(*) AS DOUBLE) / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE), 6) >= 0.5
         |), edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jp
         |  UNION ALL SELECT doc_b, doc_a FROM jp
         |), reach AS (
         |  SELECT src AS id, src AS lab FROM edges
         |  UNION
         |  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst
         |), clu AS (
         |  SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id
         |), labd AS (
         |  SELECT d.doc_id, coalesce(clu.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN clu USING (doc_id)
         |), bkt AS (
         |  SELECT doc_id, cluster_id,
         |    CAST(('0x' || substr(md5('split:' || CAST(cluster_id AS VARCHAR)), 1, 8))::UBIGINT
         |      % 1000000 AS BIGINT) AS b
         |  FROM labd
         |)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN b < 900000 THEN 'train'
         |       WHEN b < 950000 THEN 'val' ELSE 'test' END AS split
         |FROM bkt ORDER BY doc_id""".stripMargin,
    // 106: the dedup_cluster closure + 1/|cluster| md5-lattice keep rule
    "sample_softdedup" ->
      s"""WITH RECURSIVE $SH3, jp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*) AS inter, a.n_sh AS n_a, b.n_sh AS n_b
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 4, 5
         |  HAVING round(CAST(count(*) AS DOUBLE) / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE), 6) >= 0.5
         |), edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jp
         |  UNION ALL SELECT doc_b, doc_a FROM jp
         |), reach AS (
         |  SELECT src AS id, src AS lab FROM edges
         |  UNION
         |  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst
         |), lab AS (
         |  SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id
         |), withc AS (
         |  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN lab l USING (doc_id)
         |), sz AS (
         |  SELECT cluster_id, count(*) AS cluster_size FROM withc GROUP BY 1
         |)
         |SELECT w.doc_id, w.cluster_id, s.cluster_size
         |FROM withc w JOIN sz s USING (cluster_id)
         |WHERE CAST(('0x' || substr(md5('soft:' || CAST(w.doc_id AS VARCHAR)), 1, 8))::UBIGINT
         |    % 1000000 AS BIGINT) < 1000000 // s.cluster_size
         |ORDER BY w.doc_id""".stripMargin,
    // 39: quality formula + cluster closure composed — keep quality
    // >= 0.5 docs that are not a non-canonical near-dup copy.
    "corpus_clean" ->
      s"""$CORPUS_CLEAN_BODY
         |ORDER BY q.doc_id""".stripMargin,
    // 129: the corpus_clean closure with the trained-probe gate — the
    // full 8-step training loop replays inside (classifySql), then the
    // RANK gate (top 30% — exactly floor(3n/10) rows under the total
    // order (score DESC, md5-lattice bucket, doc_id), the order
    // Sampling.topFraction's histogram cascade realizes scale-free)
    // plus the canonical-member rule.
    "corpus_clean_ml" ->
      s"""WITH RECURSIVE $SH3, jp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*) AS inter, a.n_sh AS n_a, b.n_sh AS n_b
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 4, 5
         |  HAVING round(CAST(count(*) AS DOUBLE) / CAST(a.n_sh + b.n_sh - count(*) AS DOUBLE), 6) >= 0.5
         |), edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jp
         |  UNION ALL SELECT doc_b, doc_a FROM jp
         |), reach AS (
         |  SELECT src AS id, src AS lab FROM edges
         |  UNION
         |  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst
         |), clu AS (
         |  SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id
         |),
         |${classifySql(8, "8.0")},
         |scored AS (
         |  SELECT f.doc_id,
         |    floor(least(greatest(0.25 * (w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 + w.w4 * f.x4) + 0.5,
         |      CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS score
         |  FROM f CROSS JOIN w8s w
         |), rk2 AS (
         |  SELECT doc_id, score,
         |    row_number() OVER (ORDER BY score DESC,
         |      CAST(('0x' || substr(md5('cleanml:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
         |        % 1000000 AS BIGINT), doc_id) AS rn,
         |    (SELECT count(*) FROM scored) AS n
         |  FROM scored
         |)
         |SELECT r.doc_id, r.score
         |FROM rk2 r LEFT JOIN clu ON r.doc_id = clu.doc_id
         |WHERE r.rn <= (3 * r.n) // 10
         |  AND (clu.cluster_id IS NULL OR clu.cluster_id = r.doc_id)
         |ORDER BY r.doc_id""".stripMargin,
    // 130: the C4 line rules + keep-first duplicate-line removal,
    // reassembled text hash-checked. Keep-first mirrors Spark's
    // min(struct(doc_id, line_idx)) as a row_number window.
    "text_lines" ->
      s"""WITH d0 AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE NOT contains(lower(text), 'lorem ipsum')
         |    AND NOT contains(text, '{')
         |), ls AS (
         |  SELECT doc_id, string_split(text, chr(10)) AS ll FROM d0
         |), ln AS (
         |  SELECT doc_id, CAST(i AS INT) AS line_idx,
         |    ll[CAST(i AS INT) + 1] AS line, len(ll) AS n_lines
         |  FROM ls, unnest(range(0, len(ll))) AS u(i)
         |), flt AS (
         |  SELECT doc_id, line_idx, line, n_lines,
         |    regexp_replace(lower(trim(line)), '\\s+', ' ', 'g') AS lnorm
         |  FROM ln
         |  WHERE (CASE WHEN trim(line) = '' THEN 0
         |         ELSE len(string_split_regex(trim(line), ' +')) END) >= 3
         |    AND NOT contains(lower(line), 'javascript')
         |), rk AS (
         |  SELECT *, row_number() OVER (PARTITION BY lnorm
         |    ORDER BY doc_id, line_idx) AS rn
         |  FROM flt
         |)
         |SELECT doc_id,
         |  string_agg(line, chr(10) ORDER BY line_idx) AS clean_text,
         |  count(*) AS n_kept,
         |  CAST(max(n_lines) AS BIGINT) AS n_lines
         |FROM rk WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // 138: blocklist page filter — same interpolated token list as
    // the Spark side (exact token equality over NORM tokens).
    "text_badwords" -> {
      val lst = graft.operators.Lines.badwords
        .map(w => s"'${w.replace("'", "''")}'").mkString("[", ", ", "]")
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END AS toks
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CAST(len(list_filter(toks, x -> list_contains($lst, x))) AS BIGINT) AS n_bad,
         |  len(list_filter(toks, x -> list_contains($lst, x))) = 0 AS kept
         |FROM t ORDER BY doc_id""".stripMargin
    },
    // 138b: same literal phrase list interpolated into both engines;
    // strpos mirrors Spark's instr (1-based, 0 = miss).
    "text_license" -> {
      val vals = licensePlanted.map { case (id, t) =>
        s"(CAST($id AS BIGINT), ${sqlStr(t)})" }.mkString(",\n    ")
      val hits = graft.functions.Text.licensePhrases.map(p =>
        s"CASE WHEN strpos(lower(text), ${sqlStr(p)}) > 0 THEN 1 ELSE 0 END")
        .mkString("\n    + ")
      s"""WITH src AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    $vals) pl(doc_id, text)
         |), h AS (
         |  SELECT doc_id, CAST($hits AS BIGINT) AS n_phrases FROM src
         |)
         |SELECT doc_id, n_phrases, n_phrases >= 1 AS has_license
         |FROM h ORDER BY doc_id""".stripMargin
    },
    // 154: replay every green draw (md5 on the prev|cur transition),
    // the z arithmetic and the length-gated verdict; constants
    // interpolated from WM_GAMMA_PCT / WM_Z / WM_MIN.
    "text_watermark" -> {
      val vals = wmPlanted.map { case (id, t) =>
        s"(CAST($id AS BIGINT), ${sqlStr(t)})" }.mkString(",\n    ")
      val g = WM_GAMMA_PCT / 100.0
      val v = g * (1.0 - g)
      s"""WITH src AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    $vals) pl(doc_id, text)
         |), t AS (
         |  SELECT doc_id,
         |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END AS tk
         |  FROM src
         |), gr AS (
         |  SELECT doc_id,
         |    CAST(greatest(len(tk) - 1, 0) AS BIGINT) AS n_scored,
         |    CAST(CASE WHEN len(tk) >= 2 THEN list_sum(list_transform(range(2, len(tk) + 1),
         |      i -> CASE WHEN CAST(('0x' || substr(md5('wm:' || tk[CAST(i - 1 AS INT)] || '|' || tk[CAST(i AS INT)]), 1, 8))::UBIGINT AS BIGINT) % 100 < $WM_GAMMA_PCT
         |        THEN 1 ELSE 0 END))
         |    ELSE 0 END AS BIGINT) AS n_green
         |  FROM t
         |), zr AS (
         |  SELECT doc_id, n_scored, n_green,
         |    CASE WHEN n_scored > 0
         |      THEN round(CAST(n_green AS DOUBLE) / CAST(n_scored AS DOUBLE), 6)
         |      ELSE 0.0 END AS green_ratio,
         |    CASE WHEN n_scored > 0
         |      THEN round((CAST(n_green AS DOUBLE) - $g * CAST(n_scored AS DOUBLE))
         |        / sqrt(CAST(n_scored AS DOUBLE) * $v), 6)
         |      ELSE 0.0 END AS z
         |  FROM gr
         |)
         |SELECT doc_id, n_scored, n_green, green_ratio, z,
         |  (n_scored >= $WM_MIN AND z > $WM_Z) AS watermarked
         |FROM zr ORDER BY doc_id""".stripMargin
    },
    // 139: the same strip/decode chain, generated from the SAME
    // constants (dropRes / blockTagRe / anyTagRe / entities) the Spark
    // side folds — one definition, two engines.
    "html_extract" -> {
      import graft.functions.Html
      val vals = htmlPlanted.map { case (id, t) =>
        s"(CAST($id AS BIGINT), ${sqlStr(t)})" }.mkString(",\n    ")
      def rr(acc: String, re: String, repl: String) =
        s"regexp_replace($acc, ${sqlStr(re)}, $repl, 'g')"
      val dropped = Html.dropRes.foldLeft("text")((a, re) => rr(a, re, "''"))
      val blocks = rr(dropped, Html.blockTagRe, "chr(10)")
      val untagged = rr(blocks, Html.anyTagRe, "' '")
      val decoded = Html.entities.foldLeft(untagged) {
        case (a, (e, v)) => s"replace($a, ${sqlStr(e)}, ${sqlStr(v)})" }
      val sp = rr(decoded, "[ \\t]+", "' '")
      val nl = rr(sp, " ?\\n ?", "chr(10)")
      val para = rr(nl, "\\n{3,}", "chr(10) || chr(10)")
      val out = s"trim(${rr(para, "^\\n+|\\n+$", "''")})"
      s"""WITH src AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT * FROM (VALUES $vals) AS v(doc_id, text)
         |)
         |SELECT doc_id, $out AS text_plain, $out <> text AS changed
         |FROM src ORDER BY doc_id""".stripMargin
    },
    // 140: the whole pipeline as one generated WITH cascade — every
    // stage's fragment reuses the SAME shared constants as its
    // standalone oracle (MOJ_CHAIN/scrubRe, the badwords list, SH3 and
    // the CC closure retargeted onto the cleaned text, the full
    // 8-step classifier training replay over the deduped corpus, the
    // 'pretrain:' gate bucket, the 8-gram decon probe against RAW
    // benchmark text, the 'temp:' thresholds over cleaned char mass,
    // and the 'shard:' manifest). One definition per constant, two
    // engines.
    "corpus_pretrain" -> pretrainMat(PRETRAIN_RAW +
      """
        |SELECT shard_id, pos, doc_id, lang, score
        |FROM man ORDER BY shard_id, pos""".stripMargin),
    // 147: the same CTE chain counted at each stage boundary (psrc →
    // pbw → lout → pout → canon → gt → pk2 → samp — the exact frames
    // the Spark stages() shares with the manifest)
    "pretrain_yield" -> pretrainMat(PRETRAIN_RAW +
      """
        |SELECT stage, n_docs FROM (
        |  SELECT '0_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM psrc
        |  UNION ALL SELECT '1_blocklist', CAST(count(*) AS BIGINT) FROM pbw
        |  UNION ALL SELECT '2_line_clean', CAST(count(*) AS BIGINT) FROM lout
        |  UNION ALL SELECT '3_paragraph_dedup', CAST(count(*) AS BIGINT) FROM pout
        |  UNION ALL SELECT '4_cluster_dedup', CAST(count(*) AS BIGINT) FROM canon
        |  UNION ALL SELECT '5_classifier_gate', CAST(count(*) AS BIGINT) FROM gt
        |  UNION ALL SELECT '6_decontaminate', CAST(count(*) AS BIGINT) FROM pk2
        |  UNION ALL SELECT '7_temperature_sample', CAST(count(*) AS BIGINT) FROM samp
        |) ORDER BY stage""".stripMargin),
    // 149: SFT prompt-masked examples — rebuild the rendered token
    // stream (role markers + prompt/response split + maxLen
    // truncation) and the 0/1 mask stream, hash both. Constants
    // interpolated from SFT_PROMPT/SFT_MAXLEN.
    "sft_examples" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END AS w
         |  FROM documents
         |), st AS (
         |  SELECT doc_id, w FROM toks WHERE len(w) > $SFT_PROMPT
         |), ren AS (
         |  SELECT doc_id,
         |    list_concat(list_concat(list_concat(
         |      ['<|user|>'], w[1:$SFT_PROMPT]),
         |      ['<|assistant|>']), w[${SFT_PROMPT + 1}:]) AS a
         |  FROM st
         |), kp AS (
         |  SELECT doc_id, len(a) AS n_tokens, a[1:$SFT_MAXLEN] AS kept FROM ren
         |)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(len(kept) AS BIGINT) AS n_kept,
         |  CAST(len(kept) - ${SFT_PROMPT + 2} AS BIGINT) AS n_target,
         |  sha256(array_to_string(kept, ' ')) AS text_sha,
         |  sha256(array_to_string(list_transform(range(1, len(kept) + 1),
         |    i -> CASE WHEN i <= ${SFT_PROMPT + 2} THEN '0' ELSE '1' END),
         |    ',')) AS mask_sha
         |FROM kp WHERE len(kept) > ${SFT_PROMPT + 2}
         |ORDER BY doc_id""".stripMargin,
    // 155: same offset-quota assignment and ordered separator-join,
    // hashed byte-exact; budget interpolated from CTX_STITCH.
    "corpus_stitch" ->
      s"""WITH stok AS (
         |  SELECT doc_id, source, text,
         |    CAST(CASE WHEN $NORM = '' THEN 0
         |      ELSE len(str_split($NORM, ' ')) END AS BIGINT) AS n_tokens
         |  FROM documents
         |), sst AS (
         |  SELECT doc_id, source, text, n_tokens,
         |    coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
         |  FROM stok
         |)
         |SELECT source, CAST(cum_prev // $CTX_STITCH AS BIGINT) AS context_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
         |  sha256(string_agg(text, '<|doc|>' ORDER BY doc_id)) AS text_sha
         |FROM sst GROUP BY 1, 2
         |ORDER BY source, context_id""".stripMargin,
    // 149c: FIM — same sha-derived cut points (uniform over [0, n],
    // sorted) and gate, same PSM rendering, hashed token-exact.
    "doc_fim" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END AS tk
         |  FROM documents
         |), s AS (
         |  SELECT doc_id, tk, len(tk) AS n,
         |    CAST(('0x' || substr(md5('fima:' || doc_id), 1, 8))::UBIGINT AS BIGINT) % (len(tk) + 1) AS ca,
         |    CAST(('0x' || substr(md5('fimb:' || doc_id), 1, 8))::UBIGINT AS BIGINT) % (len(tk) + 1) AS cb,
         |    ('0x' || substr(md5('fimg:' || doc_id), 1, 8))::UBIGINT % 100 < $FIM_RATE AS gate
         |  FROM t
         |), c AS (
         |  SELECT doc_id, tk, n, least(ca, cb) AS p, greatest(ca, cb) AS q,
         |    (gate AND least(ca, cb) < greatest(ca, cb)) AS ap
         |  FROM s
         |)
         |SELECT doc_id, ap AS fim_applied,
         |  CAST(n AS BIGINT) AS n_tokens,
         |  CAST(CASE WHEN ap THEN p ELSE n END AS BIGINT) AS n_prefix,
         |  CAST(CASE WHEN ap THEN q - p ELSE 0 END AS BIGINT) AS n_middle,
         |  CAST(CASE WHEN ap THEN n - q ELSE 0 END AS BIGINT) AS n_suffix,
         |  sha256(array_to_string(CASE WHEN ap THEN
         |      list_concat(list_concat(list_concat(list_concat(list_concat(
         |        ['<|fim_pre|>'], tk[1:CAST(p AS INT)]),
         |        ['<|fim_suf|>']), tk[CAST(q + 1 AS INT):CAST(n AS INT)]),
         |        ['<|fim_mid|>']), tk[CAST(p + 1 AS INT):CAST(q AS INT)])
         |    ELSE tk END, ' ')) AS text_sha
         |FROM c ORDER BY doc_id""".stripMargin,
    // 150: DPO pairs — the shared quality chain (QUALITY_CTES) scores
    // candidates; ranks, disjointness guard and margin gate replay
    // with the same interpolated constants.
    "dpo_pairs" ->
      s"""WITH $QUALITY_CTES, sc AS (
         |  SELECT d.doc_id, d.source, q.quality,
         |    CAST(CAST(('0x' || substr(md5('dpo:' || d.doc_id), 1, 8))::UBIGINT AS BIGINT) % $DPO_BUCKETS AS BIGINT) AS bucket
         |  FROM documents d JOIN qcq q ON d.doc_id = q.doc_id
         |), rk AS (
         |  SELECT doc_id, source, quality, bucket,
         |    row_number() OVER (PARTITION BY source, bucket ORDER BY quality DESC, doc_id ASC) AS rb,
         |    row_number() OVER (PARTITION BY source, bucket ORDER BY quality ASC, doc_id DESC) AS rw,
         |    count(*) OVER (PARTITION BY source, bucket) AS gn
         |  FROM sc
         |)
         |SELECT b.source, b.bucket, CAST(b.rb AS BIGINT) AS pair_rank,
         |  b.doc_id AS chosen_id, w.doc_id AS rejected_id,
         |  b.quality AS chosen_q, w.quality AS rejected_q,
         |  round(b.quality - w.quality, 6) AS margin
         |FROM rk b JOIN rk w
         |  ON b.source = w.source AND b.bucket = w.bucket AND b.rb = w.rw
         |WHERE b.rb <= $DPO_TOPK AND b.rb * 2 <= b.gn AND w.rw * 2 <= w.gn
         |  AND b.quality - w.quality >= $DPO_MARGIN
         |ORDER BY 1, 2, 3""".stripMargin,
    // 141: manifest -> trainer-ready examples: 64/16 context chunks of
    // each manifest doc's cleaned text, packed into 256-token examples
    // IN TRAINING ORDER (the pack window partitions by the manifest
    // shard and orders by (pos, chunk_start) — the chunk_pack
    // offset-quota formulation over the manifest order).
    "pretrain_examples" -> pretrainMat(PRETRAIN_RAW +
      """, pchunks AS (
        |  SELECT shard_id, pos,
        |    list_filter(string_split_regex(text, '[ \t\n\r\f]+'), x -> x <> '') AS tokens
        |  FROM man
        |), pstarts AS (
        |  SELECT shard_id, pos, tokens,
        |    unnest(generate_series(0, len(tokens) - 1, 48)) AS start
        |  FROM pchunks WHERE len(tokens) > 0
        |), pch AS (
        |  SELECT shard_id, pos, CAST(start AS BIGINT) AS chunk_start,
        |    CAST(least(64, len(tokens) - start) AS BIGINT) AS n_tokens
        |  FROM pstarts
        |), ppack AS (
        |  SELECT shard_id, n_tokens,
        |    CAST(floor((sum(n_tokens) OVER w - n_tokens) / 256.0) AS BIGINT) AS pack_id
        |  FROM pch
        |  WINDOW w AS (PARTITION BY shard_id ORDER BY pos, chunk_start
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT shard_id, pack_id, count(*) AS n_chunks,
        |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
        |FROM ppack GROUP BY shard_id, pack_id
        |ORDER BY shard_id, pack_id""".stripMargin),
    // 141b: the BPE-budget pack — the renamed 8-round merge cascade
    // (trained FROM documents, exactly text_bpe_apply's trainer)
    // splices into the pretrain chain; each chunk's cost is the sum of
    // its lowered words' segment sizes with the character fallback for
    // OOV (the planted French rows are OOV by construction).
    "pretrain_examples_bpe" -> pretrainMatBpe(PRETRAIN_RAW + ", " +
      bpeCascadeSql("bp").stripPrefix("WITH ") +
      s""", bsegs AS (
        |  SELECT token,
        |    CAST(len(list_filter(str_split(trim(w), '  '), x -> x <> '')) AS BIGINT) AS n_sub
        |  FROM bpsym$BPE_ROUNDS
        |), pchunks AS (
        |  SELECT shard_id, pos,
        |    list_filter(string_split_regex(text, '[ \t\n\r\f]+'), x -> x <> '') AS tokens
        |  FROM man
        |), pstarts AS (
        |  SELECT shard_id, pos, tokens,
        |    unnest(generate_series(0, len(tokens) - 1, 48)) AS start
        |  FROM pchunks WHERE len(tokens) > 0
        |), pch AS (
        |  SELECT shard_id, pos, CAST(start AS BIGINT) AS chunk_start,
        |    list_transform(
        |      list_slice(tokens, CAST(start AS INT) + 1, CAST(start AS INT) + 64),
        |      x -> lower(x)) AS ctk
        |  FROM pstarts
        |), pct AS (
        |  SELECT shard_id, pos, chunk_start, unnest(ctk) AS token FROM pch
        |), pbpe AS (
        |  SELECT p.shard_id, p.pos, p.chunk_start,
        |    CAST(sum(coalesce(s.n_sub, length(p.token))) AS BIGINT) AS n_bpe
        |  FROM pct p LEFT JOIN bsegs s USING (token)
        |  GROUP BY 1, 2, 3
        |), ppack AS (
        |  SELECT shard_id, n_bpe,
        |    CAST(floor((sum(n_bpe) OVER w - n_bpe) / 256.0) AS BIGINT) AS pack_id
        |  FROM pbpe
        |  WINDOW w AS (PARTITION BY shard_id ORDER BY pos, chunk_start
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT shard_id, pack_id, count(*) AS n_chunks,
        |  CAST(sum(n_bpe) AS BIGINT) AS pack_tokens
        |FROM ppack GROUP BY shard_id, pack_id
        |ORDER BY shard_id, pack_id""".stripMargin),
    // 131: paragraph split + normalized fingerprint + keep-first; the
    // shifted union guarantees every paragraph repeats (grouping is by
    // the normalized TEXT on both engines — the sha fingerprint is a
    // shuffle-key compaction, not a semantic).
    "dedup_paragraph" ->
      s"""WITH u AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
         |), sp AS (
         |  SELECT doc_id, string_split_regex(text, '\\n{2,}') AS ps FROM u
         |), pr AS (
         |  SELECT doc_id, CAST(i AS INT) AS par_idx,
         |    ps[CAST(i AS INT) + 1] AS par
         |  FROM sp, unnest(range(0, len(ps))) AS u2(i)
         |), pn AS (
         |  SELECT doc_id, par_idx, par,
         |    regexp_replace(lower(trim(par)), '\\s+', ' ', 'g') AS pnorm
         |  FROM pr
         |  WHERE regexp_replace(lower(trim(par)), '\\s+', ' ', 'g') <> ''
         |), np AS (
         |  SELECT doc_id, count(*) AS n_pars FROM pn GROUP BY doc_id
         |), rk AS (
         |  SELECT *, row_number() OVER (PARTITION BY pnorm
         |    ORDER BY doc_id, par_idx) AS rn
         |  FROM pn
         |), agg AS (
         |  SELECT doc_id,
         |    string_agg(par, chr(10) || chr(10) ORDER BY par_idx) AS clean_text,
         |    count(*) AS n_kept
         |  FROM rk WHERE rn = 1 GROUP BY doc_id
         |)
         |SELECT agg.doc_id, clean_text,
         |  CAST(np.n_pars AS BIGINT) AS n_pars,
         |  CAST(np.n_pars - n_kept AS BIGINT) AS n_removed
         |FROM agg JOIN np ON agg.doc_id = np.doc_id
         |ORDER BY agg.doc_id""".stripMargin,
    // 132: distinct 8-grams, min-doc_id owner, per-doc novel fraction;
    // sub-8-token docs have no grams and score 1.0 like the Spark side
    "corpus_novelty" ->
      s"""WITH tkn AS (
         |  SELECT doc_id,
         |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END AS w
         |  FROM documents
         |), g AS (
         |  SELECT DISTINCT doc_id, g FROM (
         |    SELECT doc_id, unnest(
         |      CASE WHEN len(w) < 8 THEN CAST([] AS VARCHAR[])
         |      ELSE list_transform(range(1, len(w) - 6),
         |        i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
         |             w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]) END) AS g
         |    FROM tkn)
         |), own AS (
         |  SELECT g, min(doc_id) AS owner FROM g GROUP BY g
         |), per AS (
         |  SELECT doc_id, count(*) AS n_grams,
         |    sum(CASE WHEN doc_id = owner THEN 1 ELSE 0 END) AS n_novel
         |  FROM g JOIN own USING (g) GROUP BY doc_id
         |)
         |SELECT d.doc_id,
         |  CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
         |  CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
         |  CASE WHEN coalesce(n_grams, 0) > 0
         |    THEN round(CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE), 6)
         |    ELSE 1.0 END AS novelty
         |FROM documents d LEFT JOIN per USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // 133: the trained-tokenizer cascade + per-lang fertility math
    "text_fertility" ->
      s"""$BPE_CASCADE, segs AS (
         |  SELECT token, list_filter(str_split(trim(w), '  '), x -> x <> '') AS sy
         |  FROM sym$BPE_ROUNDS
         |), tkc AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END AS tk
         |  FROM documents
         |), tok AS (
         |  SELECT doc_id, lang, unnest(tk) AS token FROM tkc
         |), st AS (
         |  SELECT lang, count(*) AS n_words,
         |    CAST(sum(len(s.sy)) AS BIGINT) AS n_subtokens,
         |    CAST(sum(length(t.token)) AS BIGINT) AS n_chars
         |  FROM tok t JOIN segs s USING (token) GROUP BY lang
         |), nd AS (
         |  SELECT lang, count(DISTINCT doc_id) AS n_docs FROM documents GROUP BY lang
         |)
         |SELECT st.lang, CAST(nd.n_docs AS BIGINT) AS n_docs,
         |  CAST(st.n_words AS BIGINT) AS n_words, st.n_subtokens,
         |  round(CAST(st.n_subtokens AS DOUBLE) / CAST(st.n_words AS DOUBLE), 6) AS fertility,
         |  round(CAST(st.n_chars AS DOUBLE) / CAST(st.n_subtokens AS DOUBLE), 6) AS chars_per_subtoken
         |FROM st JOIN nd USING (lang)
         |ORDER BY st.lang""".stripMargin,
    // 45: the full training-data pipeline — corpus_clean survivors,
    // stratified-sampled, chunked to 64/16 context windows. The whole
    // corpus_clean query nests as a subquery; sampling and chunking
    // replay the same arithmetic as #41/#42.
    "corpus_chunks" ->
      s"""WITH kept AS (
         |  SELECT doc_id FROM ($CORPUS_CLEAN_BODY)
         |), samp AS (
         |  SELECT d.doc_id, d.text
         |  FROM documents d JOIN kept k ON d.doc_id = k.doc_id
         |  WHERE CAST(('0x' || substr(md5('smp:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT
         |      % 1000000 AS BIGINT)
         |    < (CASE WHEN d.lang = 'en' THEN 500000
         |            WHEN d.lang IN ('de','fr') THEN 300000
         |            ELSE 100000 END)
         |), ctoks AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(text, '[ \t\n\r\f]+'), x -> x <> '') AS tokens
         |  FROM samp
         |), cstarts AS (
         |  SELECT doc_id, tokens,
         |    unnest(generate_series(0, len(tokens) - 1, 48)) AS start
         |  FROM ctoks WHERE len(tokens) > 0
         |)
         |SELECT doc_id, CAST(start AS BIGINT) AS chunk_start,
         |  array_to_string(list_slice(tokens, start + 1, start + 64), ' ') AS chunk_text,
         |  CAST(least(64, len(tokens) - start) AS BIGINT) AS n_tokens
         |FROM cstarts ORDER BY doc_id, chunk_start""".stripMargin,
    // 27: sha-based 64-bit simhash recomputed per doc, then the BANDED
    // join replayed including the occupancy cap (chunk buckets with
    // df > cap dropped — Dedup.bandBucketCap, interpolated):
    // the pigeonhole is lossless for hamming <= 3, so below the cap
    // this equals the old all-pairs form, and above it both engines
    // drop the duplicate crowd identically.
    "dedup_simhash" ->
      s"""WITH $SIMHASH_CTES
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
         |FROM chk a JOIN chk b
         |  ON a.c = b.c AND a.val = b.val AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sim, b.sim)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    // 27b: brute-force hamming truth over the SAME signatures vs the
    // capped banded replay; the dedup_recall report shape
    "simhash_recall" ->
      s"""WITH $SIMHASH_CTES,
         |sr_true AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sims a JOIN sims b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sim, b.sim)) <= 3
         |), sr_found AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM chk a JOIN chk b
         |    ON a.c = b.c AND a.val = b.val AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.sim, b.sim)) <= 3
         |), ${recallReportSql("sr_true", "sr_found")}""".stripMargin,
    // 36: IVF near-dup replay — same-cell pairs, exact cosine verify.
    "dedup_embed" ->
      s"""WITH ${ivfSql()}
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  round(${cosSql("a.v", "b.v")}, 6) AS cos
         |FROM assigned a JOIN assigned b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
         |WHERE round(${cosSql("a.v", "b.v")}, 6) >= 0.35
         |ORDER BY vec_a, vec_b""".stripMargin,
    // 110: full power-iteration replay (3 unrolled rounds) + centered
    // projection
    "embed_pca" ->
      s"""WITH ${pcaSql(3, 64)}
         |SELECT e.vec_id,
         |  round(list_dot_product(e.x, p.v) - list_dot_product(mu.mu, p.v), 6) AS proj
         |FROM e CROSS JOIN v3 p CROSS JOIN mu
         |ORDER BY e.vec_id""".stripMargin,
    // 58: full k-means training replay (2 unrolled iterations)
    "embed_kmeans" ->
      s"""WITH ${kmeansSql("8", 2)}
         |SELECT vec_id, cell_id, cos FROM afin ORDER BY vec_id""".stripMargin,
    // 110b: same trained assignment (shared kmeans CTE), per-cell
    // mean/std from exact integer sums on the 1e-6 cosine grid, the
    // identical threshold expression both engines. (CTE names oqa/ost
    // avoid kmeansSql's s1/s2 round CTEs.)
    "embed_outliers" ->
      s"""WITH ${kmeansSql("8", 2)},
         |oqa AS (
         |  SELECT vec_id, cell_id, cos,
         |    CAST(floor(cos * 1000000.0 + 0.5) AS BIGINT) AS qcos
         |  FROM afin
         |), ost AS (
         |  SELECT cell_id, count(*) AS n_cell,
         |    sum(qcos) AS qs1, sum(qcos * qcos) AS qs2
         |  FROM oqa GROUP BY cell_id
         |), oms AS (
         |  SELECT cell_id,
         |    CAST(qs1 AS DOUBLE) / CAST(n_cell AS DOUBLE) AS mean,
         |    sqrt(greatest(CAST(qs2 AS DOUBLE) / CAST(n_cell AS DOUBLE)
         |      - (CAST(qs1 AS DOUBLE) / CAST(n_cell AS DOUBLE))
         |        * (CAST(qs1 AS DOUBLE) / CAST(n_cell AS DOUBLE)), 0.0)) AS std
         |  FROM ost
         |)
         |SELECT a.vec_id, a.cell_id, a.cos,
         |  CASE WHEN std > 0.0
         |    THEN round((CAST(a.qcos AS DOUBLE) - mean) / std, 6)
         |    ELSE 0.0 END AS z,
         |  (std > 0.0 AND CAST(a.qcos AS DOUBLE) < mean - $OUTLIER_Z * std)
         |    AS is_outlier
         |FROM oqa a JOIN oms USING (cell_id)
         |ORDER BY a.vec_id""".stripMargin,
    // 59: k-means cells + same-cell greedy-by-id cosine prune
    "dedup_semantic" ->
      s"""WITH ${kmeansSql(AUTO_CELLS_SQL, 2)},
         |dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM afin a JOIN afin b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
         |  JOIN e ea ON ea.vec_id = a.vec_id
         |  JOIN e eb ON eb.vec_id = b.vec_id
         |  WHERE round(${cosSql("ea.v", "eb.v")}, 6) >= 0.35
         |)
         |SELECT f.vec_id, f.cell_id FROM afin f
         |WHERE f.vec_id NOT IN (SELECT vec_id FROM dropped)
         |ORDER BY f.vec_id""".stripMargin,
    // 134: same trained cells, rank by cosine-to-centroid, drop each
    // cell's top quarter (integer div, ties to the lowest vec_id)
    "embed_diversify" ->
      s"""WITH ${kmeansSql(AUTO_CELLS_SQL, 2)},
         |rkd AS (
         |  SELECT vec_id, cell_id, cos,
         |    row_number() OVER (PARTITION BY cell_id
         |      ORDER BY cos DESC, vec_id) AS rk,
         |    count(*) OVER (PARTITION BY cell_id) AS n_cell
         |  FROM afin
         |)
         |SELECT vec_id, cell_id, cos FROM rkd
         |WHERE rk > n_cell // 4
         |ORDER BY vec_id""".stripMargin,
    // 37: IVF ANN replay — probe 4 nearest cells of each query vector,
    // exact re-rank, top-5.
    "knn_ivf" ->
      s"""WITH ${ivfSql()}, $IVF_RANKED_SQL
         |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id, cos FROM ranked
         |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,
    // 148: the IVF ranking joined against the exact ranking at each
    // k — hits are exact integers, recall one rounded division
    "knn_recall" ->
      s"""WITH ${ivfSql()}, $IVF_RANKED_SQL,
         |exr AS (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS erk
         |  FROM (
         |    SELECT qe.vec_id AS query_id, ce.vec_id,
         |      round(${cosSql("ce.v", "qe.v")}, 6) AS cos
         |    FROM e ce CROSS JOIN e qe
         |    WHERE qe.vec_id < 10 AND ce.vec_id <> qe.vec_id
         |  )
         |), ks AS (SELECT CAST(unnest([1, 5, 10]) AS BIGINT) AS k),
         |hits AS (
         |  SELECT r.query_id, ks.k, CAST(count(*) AS BIGINT) AS hits
         |  FROM ranked r JOIN exr x ON r.query_id = x.query_id AND r.vec_id = x.vec_id
         |  CROSS JOIN ks
         |  WHERE r.rk <= ks.k AND x.erk <= ks.k
         |  GROUP BY r.query_id, ks.k
         |)
         |SELECT b.query_id, b.k, coalesce(h.hits, CAST(0 AS BIGINT)) AS hits,
         |  round(CAST(coalesce(h.hits, 0) AS DOUBLE) / CAST(b.k AS DOUBLE), 6) AS recall
         |FROM (SELECT qe.vec_id AS query_id, ks.k
         |      FROM e qe CROSS JOIN ks WHERE qe.vec_id < 10) b
         |LEFT JOIN hits h ON b.query_id = h.query_id AND b.k = h.k
         |ORDER BY b.query_id, b.k""".stripMargin,
    // 122: full greedy-MMR replay — unrolled selection steps
    "knn_mmr" ->
      s"""WITH ${mmrSql(5, 10)}
         |SELECT query_id, CAST(rk AS INT) AS rk, vec_id, mmr10_i
         |FROM mmr_all ORDER BY query_id, rk""".stripMargin,
    // 119: full IVF-PQ replay — codebook training, codes, coarse
    // probes, integer-grid ADC shortlist, exact re-rank
    "knn_ivfpq" -> IVFPQ_SQL,
    // 148b: the IVF-PQ replay's final ranking joined against the exact
    // ranking at each cutoff (the knn_recall shape over rer; CTE names
    // krq_-prefixed to stay clear of the PQ cascade's)
    "knn_recall_pq" ->
      s"""WITH ${ivfPqSql(8, 16, 2, 4, 5, 4)},
         |krq_apx AS (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, vec_id) AS rk
         |  FROM rer
         |), krq_exr AS (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS erk
         |  FROM (
         |    SELECT qe.vec_id AS query_id, ce.vec_id,
         |      round(${cosSql("ce.v", "qe.v")}, 6) AS cos
         |    FROM e ce CROSS JOIN e qe
         |    WHERE qe.vec_id < 10 AND ce.vec_id <> qe.vec_id
         |  )
         |), krq_ks AS (SELECT CAST(unnest([1, 5]) AS BIGINT) AS k),
         |krq_hits AS (
         |  SELECT a.query_id, krq_ks.k, CAST(count(*) AS BIGINT) AS hits
         |  FROM krq_apx a JOIN krq_exr x
         |    ON a.query_id = x.query_id AND a.vec_id = x.vec_id
         |  CROSS JOIN krq_ks
         |  WHERE a.rk <= krq_ks.k AND x.erk <= krq_ks.k
         |  GROUP BY a.query_id, krq_ks.k
         |)
         |SELECT b.query_id, b.k, coalesce(h.hits, CAST(0 AS BIGINT)) AS hits,
         |  round(CAST(coalesce(h.hits, 0) AS DOUBLE) / CAST(b.k AS DOUBLE), 6) AS recall
         |FROM (SELECT qe.vec_id AS query_id, krq_ks.k
         |      FROM e qe CROSS JOIN krq_ks WHERE qe.vec_id < 10) b
         |LEFT JOIN krq_hits h ON b.query_id = h.query_id AND b.k = h.k
         |ORDER BY b.query_id, b.k""".stripMargin,
    // 119b: the published-index probe is oracle-IDENTICAL — the lake
    // round-trip (train once at publish, probe from the snapshot) must
    // be invisible to the ranking
    "knn_ivfpq_indexed" -> IVFPQ_SQL,
    // 35: the PNG is built from (doc_id, text) by formula, so the
    // oracle predicts the DECODED output independently: dimensions
    // from the integer dims formula, n_pixels = w·h, feature mass
    // from the fixed-point histogram of the utf-8 sample bytes over
    // the padded pixel count. A broken encode, deflate/inflate, or
    // unfilter step breaks the match. Container byte counts are
    // deflate-dependent and deliberately absent.
    "mm_features" ->
      s"""WITH b AS (
         |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
         |  FROM documents
         |), dims AS (
         |  SELECT doc_id, hx, n,
         |    least(64, greatest(1, n)) AS w,
         |    greatest(1, (n + least(64, greatest(1, n)) - 1)
         |      // least(64, greatest(1, n))) AS h
         |  FROM b
         |), bytes AS (
         |  SELECT doc_id, w, h,
         |    list_transform(range(0, n), i ->
         |      CAST('0x' || substr(hx, 2 * CAST(i AS INT) + 1, 2) AS INT)) AS bs
         |  FROM dims
         |), feats AS (
         |  SELECT doc_id, w, h,
         |    list_transform(range(0, 8), j ->
         |      CAST(floor(CAST(coalesce(list_sum(
         |        list_filter(bs, x -> x % 8 = CAST(j AS INT))), 0) AS DOUBLE)
         |        * 1000000 / (w * h)) AS BIGINT)) AS f
         |  FROM bytes
         |)
         |SELECT doc_id AS media_id,
         |  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
         |       ELSE 'video' END AS media_type,
         |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         |  CAST(w * h AS BIGINT) AS n_pixels,
         |  round(CAST(list_sum(f) AS DOUBLE) / 1000000, 6) AS feature_mass
         |FROM feats ORDER BY media_id""".stripMargin,
    // 114: frame split + stride sampling + per-frame byte sums + lag
    // motion, replayed from the utf-8 bytes (frame f covers bytes
    // [64f, min(n, 64f+64)); zero padding adds no mass)
    "mm_video" ->
      s"""WITH b AS (
         |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
         |  FROM documents
         |), f AS (
         |  SELECT doc_id, hx, n, greatest(1, (n + 63) // 64) AS nf FROM b
         |), s AS (
         |  SELECT doc_id, hx, n, nf, greatest(1, nf // 4) AS stride FROM f
         |), fr AS (
         |  SELECT doc_id, hx, n, nf, stride, unnest(range(0, nf)) AS fi FROM s
         |), sums AS (
         |  SELECT doc_id, nf, stride, fi,
         |    coalesce(list_sum(list_transform(range(64 * fi, least(n, 64 * fi + 64)),
         |      i -> CAST('0x' || substr(hx, 2 * CAST(i AS INT) + 1, 2) AS INT))), 0) AS fsum
         |  FROM fr WHERE fi % stride = 0
         |), agg AS (
         |  SELECT doc_id, nf, stride, count(*) AS n_sampled, sum(fsum) AS sampled_sum,
         |    coalesce(sum(CASE WHEN prev IS NULL THEN 0 ELSE abs(fsum - prev) END), 0) AS motion
         |  FROM (SELECT *, lag(fsum) OVER (PARTITION BY doc_id ORDER BY fi) AS prev
         |        FROM sums)
         |  GROUP BY 1, 2, 3
         |)
         |SELECT a.doc_id AS media_id, CAST(a.nf AS INT) AS n_frames, 4 AS fps,
         |  CAST(a.stride AS INT) AS kf_stride,
         |  CAST(a.n_sampled AS BIGINT) AS n_sampled,
         |  CAST(a.sampled_sum AS BIGINT) AS sampled_sum,
         |  CAST(a.motion AS BIGINT) AS motion,
         |  CAST(least(64, greatest(1, least(b.n, 64))) AS INT) AS f0_width,
         |  CAST(1 AS INT) AS f0_height
         |FROM agg a JOIN b USING (doc_id) ORDER BY media_id""".stripMargin,
    // 65: NN-thumbnail + frame-sample replay over the predicted pixel
    // grid (pixel(i) = byte i of the utf-8 text, zero beyond; same
    // integer floor index mapping as PngCodec.resizeNN)
    "mm_resize" ->
      s"""WITH b AS (
         |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
         |  FROM documents
         |), dims AS (
         |  SELECT doc_id, hx, n,
         |    least(64, greatest(1, n)) AS w,
         |    greatest(1, (n + least(64, greatest(1, n)) - 1)
         |      // least(64, greatest(1, n))) AS h
         |  FROM b
         |), bytes AS (
         |  SELECT doc_id, n, w, h,
         |    list_transform(range(0, n), i ->
         |      CAST('0x' || substr(hx, 2 * CAST(i AS INT) + 1, 2) AS INT)) AS bs
         |  FROM dims
         |), sums AS (
         |  SELECT doc_id, w, h,
         |    list_sum(list_transform(range(0, 64), t ->
         |      CASE WHEN (((t // 8) * h // 8) * w + ((t % 8) * w // 8)) < n
         |        THEN bs[CAST((((t // 8) * h // 8) * w + ((t % 8) * w // 8)) AS INT) + 1]
         |        ELSE 0 END)) AS thumb_sum,
         |    (h + greatest(1, h // 4) - 1) // greatest(1, h // 4) AS frame_rows,
         |    list_sum(list_transform(
         |      range(0, ((h + greatest(1, h // 4) - 1) // greatest(1, h // 4)) * w), t ->
         |      CASE WHEN ((t // w) * greatest(1, h // 4) * w + (t % w)) < n
         |        THEN bs[CAST(((t // w) * greatest(1, h // 4) * w + (t % w)) AS INT) + 1]
         |        ELSE 0 END)) AS frame_sum
         |  FROM bytes
         |)
         |SELECT doc_id AS media_id,
         |  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
         |       ELSE 'video' END AS media_type,
         |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         |  CAST(coalesce(thumb_sum, 0) AS BIGINT) AS thumb_sum,
         |  CAST(frame_rows AS BIGINT) AS frame_rows,
         |  CAST(coalesce(frame_sum, 0) AS BIGINT) AS frame_sum
         |FROM sums ORDER BY media_id""".stripMargin,
    // 127: average-hash replay from the PREDICTED decoded pixels —
    // the mm_resize thumbnail index mapping, strictly-above-mean bits
    // summed into a UBIGINT (the dedup_simhash idiom). The oracle
    // replays the BANDED join including its two scale/quality guards
    // (they are part of the operator's contract, so they must be
    // oracle-checked): (chunk, value) buckets with df > 4096 are
    // dropped before pairing (aHash bits are NOT uniform — flat
    // images collapse onto degenerate chunk values; see
    // Multimodal.phashBucketCap, interpolated), and DEGENERATE pairs
    // (both hashes within 4 bits of all-0/all-1) must agree on
    // brightness within |Δ ptot| <= 2048 = 64·32 (aHash is blind to
    // uniform intensity — all-white and all-black both hash to 0;
    // structured pairs skip the verify so brightness-shifted copies
    // of a real image stay caught; see Multimodal.phashBrightnessTol
    // / phashDegenerateBits).
    "mm_dedup" ->
      s"""WITH $PHASH_CTES
         |SELECT DISTINCT a.doc_id AS media_a, b.doc_id AS media_b,
         |  CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming
         |FROM kept a JOIN kept b
         |  ON a.c = b.c AND a.val = b.val AND a.doc_id < b.doc_id
         |WHERE ${phashVerifySql("a", "b")}
         |  AND bit_count(xor(a.ph, b.ph)) <= 3
         |ORDER BY media_a, media_b""".stripMargin,
    // 127b: brute-force hamming truth over the decoded aHashes (with
    // the operator-contract brightness verify) vs the capped banded
    // replay; the dedup_recall report shape
    "mm_recall" ->
      s"""WITH $PHASH_CTES,
         |mr_true AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM hv a JOIN hv b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.ph, b.ph)) <= 3
         |    AND ${phashVerifySql("a", "b")}
         |), mr_found AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM kept a JOIN kept b
         |    ON a.c = b.c AND a.val = b.val AND a.doc_id < b.doc_id
         |  WHERE ${phashVerifySql("a", "b")}
         |    AND bit_count(xor(a.ph, b.ph)) <= 3
         |), ${recallReportSql("mr_true", "mr_found")}""".stripMargin,
    "dedup_exact" ->
      s"""WITH u AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
         |)
         |SELECT sha256($NORM) AS fp, count(*) AS n_copies,
         |  min(doc_id) AS canonical_id
         |FROM u GROUP BY fp ORDER BY canonical_id""".stripMargin,
    "dedup_jaccard" ->
      s"""WITH toks AS (
         |  SELECT doc_id, str_split($NORM, ' ') AS w FROM documents
         |), sh AS (
         |  SELECT doc_id, n_sh, s FROM (
         |    SELECT doc_id,
         |      list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
         |        ELSE list_transform(range(1, len(w) - 1),
         |          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS ss
         |    FROM toks
         |  ), LATERAL (SELECT len(ss) AS n_sh), unnest(ss) AS t(s)
         |), pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS n_a, b.n_sh AS n_b,
         |    count(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4
         |)
         |SELECT doc_a, doc_b,
         |  round(CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE), 6) AS jaccard
         |FROM pairs
         |WHERE round(CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE), 6) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "knn_cosine" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_emb
        |           FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.q_emb) /
        |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id
        |), ranked AS (
        |  SELECT query_id, vec_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
        |  FROM scored
        |)
        |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id, cos FROM ranked
        |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,
    // 142: knn_cosine's replay at k=10 joined against label qrels;
    // the gain/ideal-DCG tables are interpolated from Knn.DCG_GAINS_MI
    // so the two engines share the literals
    "retrieval_eval" -> {
      val gainCase = Knn.DCG_GAINS_MI.zipWithIndex
        .map { case (g, i) => s"WHEN ${i + 1} THEN $g" }.mkString(" ")
      val idcgCase = Knn.IDCG_PREFIX_MI.zipWithIndex
        .map { case (p, i) => s"WHEN ${i + 1} THEN $p" }.mkString(" ")
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(label AS BIGINT) AS q_label,
         |             CAST(embedding AS DOUBLE[]) AS q_emb
         |           FROM embeddings WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.query_id, q.q_label, e.vec_id, CAST(e.label AS BIGINT) AS label,
         |    round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.q_emb) /
         |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
         |       sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos
         |  FROM embeddings e, q WHERE e.vec_id <> q.query_id
         |), top AS (
         |  SELECT query_id, q_label,
         |    CASE WHEN label = q_label THEN 1 ELSE 0 END AS rel,
         |    rk, CASE rk $gainCase END AS g
         |  FROM (SELECT query_id, q_label, label,
         |          row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
         |        FROM scored) WHERE rk <= 10
         |), agg AS (
         |  SELECT query_id, q_label, CAST(sum(rel) AS BIGINT) AS hits,
         |    CAST(sum(rel * g) AS BIGINT) AS dcg_i,
         |    CAST(coalesce(min(CASE WHEN rel = 1 THEN rk END), 0) AS BIGINT) AS first_rel
         |  FROM top GROUP BY query_id, q_label
         |), lc AS (
         |  SELECT CAST(label AS BIGINT) AS q_label,
         |    CAST(count(*) - 1 AS BIGINT) AS n_rel
         |  FROM embeddings GROUP BY 1
         |), j AS (
         |  SELECT a.query_id, a.q_label, lc.n_rel, a.hits, a.first_rel, a.dcg_i,
         |    CAST(CASE WHEN lc.n_rel <= 0 THEN 0
         |         ELSE (CASE least(lc.n_rel, 10) $idcgCase END) END AS BIGINT) AS idcg_i
         |  FROM agg a JOIN lc USING (q_label)
         |)
         |SELECT query_id, q_label, n_rel, hits, first_rel, dcg_i, idcg_i,
         |  CASE WHEN n_rel <= 0 THEN 0.0
         |       ELSE round(CAST(hits AS DOUBLE) / CAST(least(n_rel, 10) AS DOUBLE), 6) END AS recall,
         |  CASE WHEN first_rel = 0 THEN 0.0
         |       ELSE round(1.0 / CAST(first_rel AS DOUBLE), 6) END AS mrr,
         |  CASE WHEN idcg_i <= 0 THEN 0.0
         |       ELSE round(CAST(dcg_i AS DOUBLE) / CAST(idcg_i AS DOUBLE), 6) END AS ndcg
         |FROM j ORDER BY query_id""".stripMargin
    },
    // 146: one cosine replay ranked on both label sides, then the
    // pos × neg join and the same rounded margin
    "contrastive_triplets" ->
      s"""WITH q AS (SELECT vec_id AS anchor_id, CAST(label AS BIGINT) AS a_label,
         |             CAST(embedding AS DOUBLE[]) AS q_emb
         |           FROM embeddings WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.anchor_id, e.vec_id,
         |    CAST(e.label AS BIGINT) = q.a_label AS is_pos,
         |    round(${cosSql("CAST(e.embedding AS DOUBLE[])", "q.q_emb")}, 6) AS cos
         |  FROM embeddings e, q WHERE e.vec_id <> q.anchor_id
         |), ranked AS (
         |  SELECT anchor_id, vec_id, is_pos, cos,
         |    row_number() OVER (PARTITION BY anchor_id, is_pos
         |      ORDER BY cos DESC, vec_id) AS rk
         |  FROM scored
         |), pos AS (
         |  SELECT anchor_id, vec_id AS pos_id, cos AS pos_cos
         |  FROM ranked WHERE is_pos AND rk = 1
         |), neg AS (
         |  SELECT anchor_id, CAST(rk AS BIGINT) AS neg_rk, vec_id AS neg_id,
         |    cos AS neg_cos
         |  FROM ranked WHERE NOT is_pos AND rk <= 3
         |)
         |SELECT p.anchor_id, p.pos_id, p.pos_cos, n.neg_rk, n.neg_id, n.neg_cos,
         |  round(p.pos_cos - n.neg_cos, 6) AS margin
         |FROM pos p JOIN neg n USING (anchor_id)
         |ORDER BY anchor_id, neg_rk""".stripMargin,
    // 126: same cosine replay, max per corpus vector vs the benchmark set
    "decon_embed" ->
      """WITH b AS (SELECT CAST(embedding AS DOUBLE[]) AS b_emb
        |           FROM embeddings WHERE vec_id % 20 = 7),
        |scored AS (
        |  SELECT e.vec_id,
        |    round(list_dot_product(CAST(e.embedding AS DOUBLE[]), b.b_emb) /
        |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(b.b_emb, b.b_emb))), 6) AS cos
        |  FROM embeddings e, b WHERE e.vec_id % 20 <> 7
        |)
        |SELECT vec_id, max(cos) AS max_cos, max(cos) >= 0.35 AS contaminated
        |FROM scored GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    // 126b: full IVF replay over the BENCHMARK side — deterministic
    // centroid pick (first nc bench vectors by id — ORDER BY/LIMIT,
    // not a dense-id filter: the %20 split is sparse), benchmark
    // assignment, 4-cell probes, probed max. Probe order replays the
    // Spark side's (−qcos, cell_id) integer-grid sort as rounded
    // cosine DESC, cell_id ASC.
    "decon_embed_ivf" ->
      """WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id % 20 = 7),
        |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |      FROM embeddings WHERE vec_id % 20 <> 7),
        |cent AS (SELECT vec_id AS cell_id, v AS cv FROM b ORDER BY vec_id
        |         LIMIT (SELECT GREATEST(16, CAST(ceil(sqrt(count(*))) AS INT)) FROM b)),
        |bassign AS (
        |  SELECT vec_id, v, cell_id FROM (
        |    SELECT b.vec_id, b.v, cent.cell_id,
        |      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |        round(list_dot_product(b.v, cent.cv) /
        |          (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(cent.cv, cent.cv))), 6) DESC,
        |        cent.cell_id) AS rn
        |    FROM b CROSS JOIN cent
        |  ) WHERE rn = 1
        |), probes AS (
        |  SELECT vec_id, v, cell_id FROM (
        |    SELECT c.vec_id, c.v, cent.cell_id,
        |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |        round(list_dot_product(c.v, cent.cv) /
        |          (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(cent.cv, cent.cv))), 6) DESC,
        |        cent.cell_id) AS rn
        |    FROM c CROSS JOIN cent
        |  ) WHERE rn <= 4
        |), scored AS (
        |  SELECT p.vec_id,
        |    CASE WHEN a.vec_id IS NULL THEN -1.0
        |         ELSE round(list_dot_product(p.v, a.v) /
        |           (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(a.v, a.v))), 6)
        |    END AS cos
        |  FROM probes p LEFT JOIN bassign a ON p.cell_id = a.cell_id
        |)
        |SELECT vec_id, max(cos) AS max_cos, max(cos) >= 0.35 AS contaminated
        |FROM scored GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    // 103: knn_cosine's replay restricted to different-label candidates
    "knn_hardneg" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(label AS BIGINT) AS q_label,
        |             CAST(embedding AS DOUBLE[]) AS q_emb
        |           FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, e.vec_id, CAST(e.label AS BIGINT) AS neg_label,
        |    round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.q_emb) /
        |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos
        |  FROM embeddings e, q WHERE CAST(e.label AS BIGINT) <> q.q_label
        |), ranked AS (
        |  SELECT query_id, vec_id, neg_label, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
        |  FROM scored
        |)
        |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id, neg_label, cos FROM ranked
        |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,
    // 104: per-label exact 1e-6-grid centroid means + rounded-cosine
    // argmax with ties to the lowest label — the kmeansSql update step
    // grouped by label instead of trained cell
    "embed_classify" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(label AS BIGINT) AS label,
         |    CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings
         |), q AS (
         |  SELECT label AS cell_id, i,
         |    CAST(floor(v[CAST(i AS INT) + 1] * 1000000.0 + 0.5) AS BIGINT) AS qc
         |  FROM e, unnest(range(0, len(v))) AS t(i)
         |), s AS (
         |  SELECT cell_id, i, sum(qc) AS s, count(*) AS n FROM q GROUP BY 1, 2
         |), c AS (
         |  SELECT cell_id,
         |    list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) ORDER BY i) AS c
         |  FROM s GROUP BY cell_id
         |), a AS (
         |  SELECT vec_id, label, cell_id AS pred_label, cos FROM (
         |    SELECT e.vec_id, e.label, c.cell_id,
         |      round(${cosSql("e.v", "c.c")}, 6) AS cos,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        round(${cosSql("e.v", "c.c")}, 6) DESC, c.cell_id) AS rn
         |    FROM e CROSS JOIN c
         |  ) WHERE rn = 1
         |)
         |SELECT vec_id, label, pred_label, cos, label = pred_label AS agree
         |FROM a ORDER BY vec_id""".stripMargin,
    "text_langid" -> {
      val scoreCols = Text.stopwords.map { case (lang, ws) => s"${hitsSql(ws)} AS h_$lang" }
      // argmax with earlier-language tie preference, mirroring Spark fold
      val langs = Text.stopwords.map(_._1)
      val bestExpr = langs.tail.foldLeft((s"'${langs.head}'", s"h_${langs.head}")) {
        case ((bl, bs), l) =>
          (s"CASE WHEN h_$l > $bs THEN '$l' ELSE $bl END",
            s"greatest($bs, h_$l)")
      }
      s"""WITH staged AS (
         |  SELECT doc_id, lang, ${scoreCols.mkString(", ")} FROM documents
         |)
         |SELECT doc_id, lang AS lang_label,
         |  CASE WHEN ${bestExpr._2} > 0 THEN ${bestExpr._1} ELSE 'und' END AS lang_detected
         |FROM staged ORDER BY doc_id""".stripMargin
    },
    // 137: the same trigram-NB replay — salted-md5 buckets, add-one
    // smoothing, 1e-6-grid BIGINT ln sums, argmax via row_number with
    // (score DESC, lang) order, und for trigram-less docs.
    "text_langid2" ->
      s"""WITH nrm AS (
         |  SELECT doc_id, lang, $NORM AS s FROM documents
         |), tri AS (
         |  SELECT doc_id, lang, unnest(list_transform(range(1, length(s) - 1),
         |    i -> substr(s, CAST(i AS INT), 3))) AS t
         |  FROM nrm WHERE length(s) >= 3
         |), tb AS (
         |  SELECT doc_id, lang,
         |    CAST(('0x' || substr(md5('lid:' || t), 1, 8))::UBIGINT
         |      % ${LangId.defaultBuckets} AS BIGINT) AS b
         |  FROM tri
         |), prof AS (
         |  SELECT lang, b, count(*) AS c FROM tb WHERE doc_id % 2 = 0 GROUP BY 1, 2
         |), w AS (
         |  SELECT lang, b,
         |    CAST(round(round(ln(CAST(c AS DOUBLE) + 1.0), 6) * 1000000) AS BIGINT) AS w
         |  FROM prof
         |), prior AS (
         |  SELECT lang AS cand,
         |    CAST(round(round(ln(CAST(count(*) AS DOUBLE)), 6) * 1000000) AS BIGINT) AS prior
         |  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
         |), base AS (
         |  SELECT lang AS cand,
         |    CAST(round(round(ln(CAST(sum(c) AS DOUBLE) + ${LangId.defaultBuckets}.0), 6)
         |      * 1000000) AS BIGINT) AS base,
         |    prior
         |  FROM prof JOIN prior ON prior.cand = prof.lang GROUP BY 1, 3
         |), dm AS (
         |  SELECT doc_id, b, count(*) AS m FROM tb GROUP BY 1, 2
         |), dn AS (
         |  SELECT doc_id, count(*) AS n_tri FROM tb GROUP BY 1
         |), hits AS (
         |  SELECT dm.doc_id, w.lang, sum(dm.m * w.w) AS hit
         |  FROM dm JOIN w USING (b) GROUP BY 1, 2
         |), sc AS (
         |  SELECT dn.doc_id, base.cand, dn.n_tri,
         |    base.prior + coalesce(hits.hit, 0) - dn.n_tri * base.base AS score
         |  FROM dn CROSS JOIN base
         |  LEFT JOIN hits ON hits.doc_id = dn.doc_id AND hits.lang = base.cand
         |), win AS (
         |  SELECT doc_id, cand, n_tri FROM (
         |    SELECT doc_id, cand, n_tri,
         |      row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
         |    FROM sc) WHERE rn = 1
         |)
         |SELECT d.doc_id, d.lang AS lang_label,
         |  coalesce(win.cand, 'und') AS lang_tri,
         |  coalesce(win.n_tri, 0) AS n_tri
         |FROM documents d LEFT JOIN win ON win.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // 136: same planted fixtures (sqlStr-interpolated from
    // normPlanted), same repair chain (MOJ_CHAIN from Text.mojibake),
    // same scrub class, with DuckDB's utf8proc nfc_normalize standing
    // in for the JDK normalizer — both implement UAX #15 NFC, which
    // the hash compare proves agree on every row.
    "text_normalize" -> {
      val vals = normPlanted.map { case (id, t) =>
        s"(CAST($id AS BIGINT), ${sqlStr(t)})" }.mkString(",\n    ")
      s"""WITH src AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT * FROM (VALUES $vals) AS v(doc_id, text)
         |), moj AS (
         |  SELECT doc_id, text, $MOJ_CHAIN AS m FROM src
         |), fx AS (
         |  SELECT doc_id, text, m,
         |    nfc_normalize(regexp_replace(
         |      replace(replace(m, chr(13) || chr(10), chr(10)), chr(13), chr(10)),
         |      '${Text.scrubRe}', '', 'g')) AS text_norm
         |  FROM moj
         |)
         |SELECT doc_id, text_norm, text_norm <> text AS changed,
         |  m <> text AS mojibake_fixed
         |FROM fx ORDER BY doc_id""".stripMargin
    },
    // 139b: both group extractions replayed; positional zip via a
    // bounded range join (planted pages hold < 50 links); planted
    // rows interpolated from the same linksPlanted constants
    "html_links" -> {
      val vals = linksPlanted.map { case (id, t) =>
        s"(CAST($id AS BIGINT), ${sqlStr(t)})" }.mkString(",\n    ")
      s"""WITH src AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    $vals) pl(doc_id, text)
         |), ex AS (
         |  SELECT doc_id,
         |    regexp_extract_all(text, ${sqlStr(LINK_RE)}, 1) AS urls,
         |    regexp_extract_all(text, ${sqlStr(LINK_RE)}, 2) AS anchors
         |  FROM src
         |)
         |SELECT doc_id, CAST(i AS BIGINT) AS link_pos,
         |  urls[i] AS url, anchors[i] AS anchor,
         |  regexp_extract(urls[i], ${sqlStr(HOST_RE)}, 1) AS host
         |FROM ex CROSS JOIN range(1, 50) r(i)
         |WHERE i <= len(urls)
         |ORDER BY doc_id, link_pos""".stripMargin
    },
    // 149b: the two regexp signals + integer gate replayed; planted
    // rows interpolated from the same codePlanted constants
    "text_code" -> {
      val vals = codePlanted.map { case (id, t) =>
        s"(CAST($id AS BIGINT), ${sqlStr(t)})" }.mkString(",\n    ")
      s"""WITH src AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    $vals) pl(doc_id, text)
         |), m AS (
         |  SELECT doc_id,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(length(text) - length(regexp_replace(text,
         |      ${sqlStr(graft.functions.Text.codeSymbolRe)}, '', 'g')) AS BIGINT) AS n_symbols,
         |    CAST(len(regexp_extract_all(text,
         |      ${sqlStr(graft.functions.Text.codeKeywordRe)})) AS BIGINT) AS kw_hits
         |  FROM src
         |)
         |SELECT doc_id, n_chars, n_symbols, kw_hits,
         |  ((n_symbols * 25 >= n_chars AND n_chars > 0) OR kw_hits >= 3) AS is_code
         |FROM m ORDER BY doc_id""".stripMargin
    },
    // 32: the SAME quality chain the corpus_curriculum oracle
    // interpolates (QUALITY_CTES — one copy of the formula per engine)
    "text_quality" ->
      s"""WITH $QUALITY_CTES
         |SELECT qc1.doc_id, qc1.n_chars, qc1.n_tokens,
         |  round(qc1.mean_token_len, 6) AS mean_token_len,
         |  round(qc1.punct_ratio, 6) AS punct_ratio,
         |  round(qc1.stopword_ratio, 6) AS stopword_ratio,
         |  qcq.quality
         |FROM qc1 JOIN qcq USING (doc_id) ORDER BY qc1.doc_id""".stripMargin,
    "text_tokens" ->
      s"""SELECT doc_id,
         |  CAST(CASE WHEN $NORM = '' THEN 0 ELSE len(str_split($NORM, ' ')) END AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
         |  CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS n_est_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    // 75: same instance-level 8-token windows; df >= 2 marks a window
    // as duplicated across documents
    "text_dupsubstr" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END AS w
         |  FROM documents
         |), inst AS (
         |  SELECT doc_id, unnest(CASE WHEN len(w) >= 8
         |    THEN list_transform(range(1, len(w) - 6),
         |      i -> array_to_string(list_slice(w, i, i + 7), ' '))
         |    ELSE [] END) AS s
         |  FROM tk
         |), df8 AS (
         |  SELECT s, count(DISTINCT doc_id) AS nd FROM inst GROUP BY s
         |), dup AS (
         |  SELECT inst.doc_id, count(*) AS n_dup
         |  FROM inst JOIN df8 ON inst.s = df8.s AND df8.nd >= 2
         |  GROUP BY inst.doc_id
         |), base AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN len(w) >= 8 THEN len(w) - 7 ELSE 0 END AS BIGINT)
         |      AS n_windows
         |  FROM tk
         |)
         |SELECT b.doc_id, b.n_windows,
         |  CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup_windows,
         |  round(CASE WHEN b.n_windows = 0 THEN 0.0
         |    ELSE CAST(coalesce(d.n_dup, 0) AS DOUBLE) / CAST(b.n_windows AS DOUBLE)
         |  END, 6) AS dup_ratio
         |FROM base b LEFT JOIN dup d ON b.doc_id = d.doc_id
         |ORDER BY b.doc_id""".stripMargin,
    // 94: replay the span cut — duplicated window starts per doc, then
    // rebuild each edited token list and hash it
    "text_dupcut" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END AS w
         |  FROM documents
         |), inst AS (
         |  SELECT doc_id,
         |    unnest(CASE WHEN len(w) >= 8 THEN range(1, len(w) - 6)
         |      ELSE [] END) AS p,
         |    unnest(CASE WHEN len(w) >= 8
         |      THEN list_transform(range(1, len(w) - 6),
         |        i -> array_to_string(list_slice(w, i, i + 7), ' '))
         |      ELSE [] END) AS s
         |  FROM tk
         |), dupw AS (
         |  SELECT s FROM inst GROUP BY s HAVING count(DISTINCT doc_id) >= 2
         |), dps AS (
         |  SELECT inst.doc_id, list(p ORDER BY p) AS dps
         |  FROM inst JOIN dupw USING (s) GROUP BY inst.doc_id
         |), j AS (
         |  SELECT tk.doc_id, tk.w, coalesce(d.dps, []) AS dps
         |  FROM tk LEFT JOIN dps d ON tk.doc_id = d.doc_id
         |), k AS (
         |  SELECT doc_id, w,
         |    list_transform(
         |      list_filter(range(1, len(w) + 1),
         |        i -> len(list_filter(dps, p -> p <= i AND i <= p + 7)) = 0),
         |      i -> w[CAST(i AS INT)]) AS kept
         |  FROM j
         |)
         |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(len(w) - len(kept) AS BIGINT) AS n_cut,
         |  -- array_to_string([]) is NULL in DuckDB but '' in Spark
         |  sha256(coalesce(array_to_string(kept, ' '), '')) AS kept_sha
         |FROM k ORDER BY doc_id""".stripMargin,
    // 94b: same window machinery + the canonical election replayed as
    // a row_number over (doc_id, p) per window (== min(struct));
    // election beats cut on overlapping windows
    "text_dupcut_keepone" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END AS w
         |  FROM documents
         |), inst AS (
         |  SELECT doc_id,
         |    unnest(CASE WHEN len(w) >= 8 THEN range(1, len(w) - 6)
         |      ELSE [] END) AS p,
         |    unnest(CASE WHEN len(w) >= 8
         |      THEN list_transform(range(1, len(w) - 6),
         |        i -> array_to_string(list_slice(w, i, i + 7), ' '))
         |      ELSE [] END) AS s
         |  FROM tk
         |), dupw AS (
         |  SELECT s FROM inst GROUP BY s HAVING count(DISTINCT doc_id) >= 2
         |), di AS (
         |  SELECT inst.doc_id, inst.p,
         |    row_number() OVER (PARTITION BY inst.s
         |      ORDER BY inst.doc_id, inst.p) AS rk
         |  FROM inst JOIN dupw USING (s)
         |), marks AS (
         |  SELECT doc_id,
         |    list(p ORDER BY p) FILTER (WHERE rk = 1) AS kps,
         |    list(p ORDER BY p) FILTER (WHERE rk > 1) AS cps
         |  FROM di GROUP BY doc_id
         |), j AS (
         |  SELECT tk.doc_id, tk.w,
         |    coalesce(m.kps, []) AS kps, coalesce(m.cps, []) AS cps
         |  FROM tk LEFT JOIN marks m ON tk.doc_id = m.doc_id
         |), k AS (
         |  SELECT doc_id, w,
         |    list_transform(
         |      list_filter(range(1, len(w) + 1),
         |        i -> len(list_filter(kps, q -> q <= i AND i <= q + 7)) > 0
         |          OR len(list_filter(cps, q -> q <= i AND i <= q + 7)) = 0),
         |      i -> w[CAST(i AS INT)]) AS kept
         |  FROM j
         |)
         |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(len(w) - len(kept) AS BIGINT) AS n_cut,
         |  sha256(coalesce(array_to_string(kept, ' '), '')) AS kept_sha
         |FROM k ORDER BY doc_id""".stripMargin,
    // 62: same add-one-smoothed ln P(w2|w1), decimal-stabilized mean
    "text_lmscore" ->
      s"""WITH $LM_CTES
         |SELECT doc_id, n_bigrams, avg_logprob
         |FROM lmsc ORDER BY doc_id""".stripMargin,
    // 105: lmscore replay + the score-histogram bucket rule — bucket
    // = (3 · #docs with strictly better score) // n, replayed on the
    // same 1e-6 integer score grid.
    "text_ccnet" ->
      s"""WITH $LM_CTES, si AS (
         |  SELECT doc_id, avg_logprob,
         |    CAST(round(avg_logprob * 1000000) AS BIGINT) AS s_i
         |  FROM lmsc
         |), hist AS (
         |  SELECT s_i, count(*) AS c FROM si GROUP BY s_i
         |), cum AS (
         |  SELECT s_i, coalesce(sum(c) OVER (ORDER BY s_i DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM hist
         |), nn AS (SELECT count(*) AS n FROM si),
         |bk AS (
         |  SELECT s_i, CAST((cum * 3) // n AS INT) AS bk FROM cum CROSS JOIN nn
         |)
         |SELECT si.doc_id, si.avg_logprob,
         |  CASE WHEN bk.bk = 0 THEN 'head' WHEN bk.bk = 1 THEN 'middle'
         |       ELSE 'tail' END AS ppl_bucket,
         |  bk.bk < 2 AS keep
         |FROM si JOIN bk USING (s_i) ORDER BY si.doc_id""".stripMargin,
    // 113c: the full CM arithmetic replayed — per-seed hex-prefix
    // buckets (strings: injective to the engine's flat indices),
    // counters = per-(seed, bucket) sums over the WHOLE vocabulary
    // (collisions included), estimate = min over the probe token's
    // own seed counters
    "text_cms" ->
      s"""WITH t AS (
         |  SELECT unnest(str_split($NORM, ' ')) AS token FROM documents
         |), ex AS (
         |  SELECT token, count(*) AS exact FROM t WHERE token <> '' GROUP BY token
         |), topt AS (
         |  SELECT token, exact FROM ex ORDER BY exact DESC, token LIMIT 10
         |), pos AS (
         |  SELECT token, i AS seed,
         |    substr(sha256(CAST(i AS VARCHAR) || '|' || token), 1, $CMS_HEX) AS bucket
         |  FROM ex CROSS JOIN range(0, $CMS_DEPTH) r(i)
         |), counts AS (
         |  SELECT p.seed, p.bucket, sum(e.exact) AS c
         |  FROM pos p JOIN ex e USING (token) GROUP BY 1, 2
         |), est AS (
         |  SELECT tt.token, tt.exact, min(c.c) AS estimate
         |  FROM topt tt JOIN pos p USING (token)
         |  JOIN counts c ON c.seed = p.seed AND c.bucket = p.bucket
         |  GROUP BY 1, 2
         |)
         |SELECT token, CAST(exact AS BIGINT) AS exact,
         |  CAST(estimate AS BIGINT) AS estimate,
         |  CAST(estimate - exact AS BIGINT) AS over
         |FROM est ORDER BY token""".stripMargin,
    // 113: exact top-10 replay; the MG guarantees are literal TRUE in
    // the oracle (q_approx's convention), so a summary violating its
    // bound or presence contract flips a boolean and fails the hash
    "text_heavyhitters" ->
      s"""WITH t AS (
         |  SELECT unnest(str_split($NORM, ' ')) AS token FROM documents
         |), c AS (
         |  SELECT token, count(*) AS cnt FROM t WHERE token <> '' GROUP BY token
         |), r AS (
         |  SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rk
         |  FROM c
         |)
         |SELECT CAST(rk AS BIGINT) AS rk, token, cnt,
         |  TRUE AS bound_ok, TRUE AS presence_ok
         |FROM r WHERE rk <= 10 ORDER BY rk""".stripMargin,
    // 112: same instance n-grams, (source, gram) aggregate per n
    "corpus_diversity" -> {
      def gramSql(n: Int): String =
        if (n == 1) "list_transform(tk, x -> x)"
        else s"CASE WHEN len(tk) >= $n THEN list_transform(range(1, len(tk) - ${n - 2}), " +
          s"i -> ${(0 until n).map(j => s"tk[i+$j]").mkString(" || ' ' || ")}) ELSE [] END"
      val arms = (1 to 3).map { n =>
        s"""SELECT source, $n AS n, CAST(sum(cnt) AS BIGINT) AS n_instances,
           |  CAST(count(*) AS BIGINT) AS n_distinct,
           |  round(CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6) AS ttr
           |FROM (
           |  SELECT source, g, count(*) AS cnt FROM (
           |    SELECT source, unnest(${gramSql(n)}) AS g FROM t
           |  ) GROUP BY source, g
           |) GROUP BY source""".stripMargin
      }
      s"""WITH t AS (
         |  SELECT source,
         |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END AS tk
         |  FROM documents
         |)
         |${arms.mkString("\n", "\nUNION ALL\n", "\n")}
         |ORDER BY source, n""".stripMargin
    },
    // 111: same token/bigram machinery, all-integer rule comparisons
    "corpus_gopher" -> {
      val enList = Text.stopwords.head._2.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END AS tk
         |  FROM documents
         |), b AS (
         |  SELECT doc_id, tk,
         |    CASE WHEN len(tk) >= 2 THEN list_transform(range(1, len(tk)),
         |      i -> tk[i] || ' ' || tk[i+1]) ELSE [] END AS bg
         |  FROM t
         |), m AS (
         |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n,
         |    CAST(coalesce(list_sum(list_transform(tk, x -> length(x))), 0) AS BIGINT) AS tot_len,
         |    CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
         |    CAST(len(list_filter(tk, x -> list_contains($enList, x))) AS BIGINT) AS stop_hits,
         |    CAST(CASE WHEN len(tk) = 0 THEN 0
         |      ELSE list_max(list_transform(list_distinct(tk),
         |        u -> len(list_filter(tk, x -> x = u)))) END AS BIGINT) AS top_n,
         |    CAST(len(bg) AS BIGINT) AS n_bg,
         |    CAST(len(list_distinct(bg)) AS BIGINT) AS n_bg_d
         |  FROM b
         |)
         |SELECT doc_id, n AS n_tokens,
         |  n >= 30 AND n <= 100000 AS r_len,
         |  tot_len >= 3 * n AND tot_len <= 10 * n AND n > 0 AS r_meanlen,
         |  5 * n_alpha >= 4 * n AND n > 0 AS r_alpha,
         |  stop_hits >= 2 AS r_stop,
         |  5 * top_n <= n AS r_toptok,
         |  (n_bg - n_bg_d) * 5 <= n_bg AS r_dupbg,
         |  (n >= 30 AND n <= 100000) AND (tot_len >= 3 * n AND tot_len <= 10 * n AND n > 0)
         |    AND (5 * n_alpha >= 4 * n AND n > 0) AND stop_hits >= 2
         |    AND 5 * top_n <= n AND (n_bg - n_bg_d) * 5 <= n_bg AS pass
         |FROM m ORDER BY doc_id""".stripMargin
    },
    // 128: full training-loop replay — gopher features on the 1e-6
    // grid, 8 unrolled hard-sigmoid gradient steps, trained-weight
    // scores. A drifted gradient sum, weight rounding, or link clamp
    // anywhere breaks every score.
    "corpus_classify" ->
      s"""WITH ${classifySql(8, "8.0")}
         |SELECT f.doc_id,
         |  floor(least(greatest(0.25 * (w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 + w.w4 * f.x4) + 0.5,
         |      CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS score,
         |  (floor(least(greatest(0.25 * (w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 + w.w4 * f.x4) + 0.5,
         |      CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) >= 0.5 AS pred,
         |  f.label
         |FROM f CROSS JOIN w8s w ORDER BY f.doc_id""".stripMargin,
    // 128b: same trained scores (shared classifySql replay), decile
    // buckets, exact 1e-6-grid score mass per bucket.
    "classify_calibration" ->
      s"""WITH ${classifySql(8, "8.0")}, csc AS (
         |  SELECT f.doc_id,
         |    floor(least(greatest(0.25 * (w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 + w.w4 * f.x4) + 0.5,
         |      CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS score,
         |    f.label
         |  FROM f CROSS JOIN w8s w
         |), cb AS (
         |  SELECT CAST(least(floor(score * 10.0), 9.0) AS BIGINT) AS bucket,
         |    count(*) AS n,
         |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
         |    sum(CAST(floor(score * 1000000.0 + 0.5) AS BIGINT)) AS qs
         |  FROM csc GROUP BY 1
         |)
         |SELECT bucket, CAST(n AS BIGINT) AS n_docs,
         |  CAST(n_pos AS BIGINT) AS n_pos,
         |  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pos_rate,
         |  round(CAST(qs AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0), 6) AS mean_score
         |FROM cb ORDER BY bucket""".stripMargin,
    // 135: same (c/n)·ln(n/c) per distinct token, floored onto the
    // 1e-6 grid, summed as BIGINT — order-free on both engines
    "text_entropy" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(str_split($NORM, ' ')) AS tk FROM documents
         |), cnt AS (
         |  SELECT doc_id, tk, count(*) AS c FROM tok WHERE tk <> ''
         |  GROUP BY doc_id, tk
         |), per AS (
         |  SELECT doc_id, sum(c) AS n, count(*) AS n_distinct FROM cnt
         |  GROUP BY doc_id
         |), terms AS (
         |  SELECT cnt.doc_id, per.n, per.n_distinct,
         |    CAST(sum(CAST(floor((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
         |      ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE)) * 1000000.0 + 0.5)
         |      AS BIGINT)) AS BIGINT) AS ts
         |  FROM cnt JOIN per USING (doc_id)
         |  GROUP BY cnt.doc_id, per.n, per.n_distinct
         |)
         |SELECT d.doc_id,
         |  CAST(coalesce(t.n, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(t.n_distinct, 0) AS BIGINT) AS n_distinct,
         |  round(CAST(coalesce(t.ts, 0) AS DOUBLE) / 1000000.0, 6) AS entropy
         |FROM documents d LEFT JOIN terms t USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // 55: same token/bigram array math, list-op mirror
    "text_repetition" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END AS tk
         |  FROM documents
         |), b AS (
         |  SELECT doc_id, tk,
         |    CASE WHEN len(tk) >= 2 THEN list_transform(range(1, len(tk)),
         |      i -> tk[i] || ' ' || tk[i+1]) ELSE [] END AS bg
         |  FROM t
         |)
         |SELECT doc_id,
         |  CAST(len(tk) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct,
         |  round(CASE WHEN len(tk) = 0 THEN 0.0
         |    ELSE 1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE)
         |  END, 6) AS dup_token_ratio,
         |  round(CASE WHEN len(tk) = 0 THEN 0.0
         |    ELSE CAST(list_max(list_transform(list_distinct(tk),
         |        u -> len(list_filter(tk, x -> x = u)))) AS DOUBLE)
         |      / CAST(len(tk) AS DOUBLE)
         |  END, 6) AS top_token_ratio,
         |  round(CASE WHEN len(bg) = 0 THEN 0.0
         |    ELSE 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE)
         |  END, 6) AS dup_bigram_ratio
         |FROM b ORDER BY doc_id""".stripMargin,
    // 56: plain wordcount, deterministic top-100
    "text_vocab" ->
      s"""WITH t AS (
         |  SELECT unnest(str_split($NORM, ' ')) AS token FROM documents
         |)
         |SELECT token, count(*) AS n FROM t WHERE token <> ''
         |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin,
    // 57: same tf·ln(N/df)/len arithmetic, same parenthesization
    "text_tfidf" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(str_split($NORM, ' ')) AS token FROM documents
         |), tf AS (
         |  SELECT doc_id, token, count(*) AS tf FROM t WHERE token <> '' GROUP BY 1, 2
         |), dl AS (
         |  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
         |), dfq AS (
         |  SELECT token, count(*) AS df FROM tf GROUP BY 1
         |), nd AS (
         |  SELECT count(*) AS n_docs FROM documents
         |), scored AS (
         |  SELECT tf.doc_id, tf.token,
         |    round((CAST(tf.tf AS DOUBLE) *
         |        ln(CAST(nd.n_docs AS DOUBLE) / CAST(dfq.df AS DOUBLE))) /
         |      CAST(dl.dl AS DOUBLE), 6) AS tfidf
         |  FROM tf JOIN dl USING (doc_id) JOIN dfq USING (token) CROSS JOIN nd
         |), ranked AS (
         |  SELECT doc_id, token, tfidf,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rk
         |  FROM scored
         |)
         |SELECT doc_id, CAST(rk AS INT) AS rk, token, tfidf FROM ranked
         |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    // 85: the same tf/dl/df aggregates, BM25 formula mirrored
    // operation-for-operation (k1=1.2, b=0.75, Lucene idf)
    "text_bm25" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(str_split($NORM, ' ')) AS token FROM documents
         |), tf AS (
         |  SELECT doc_id, token, count(*) AS tf FROM t WHERE token <> '' GROUP BY 1, 2
         |), dl AS (
         |  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
         |), dfq AS (
         |  SELECT token, count(*) AS df FROM tf GROUP BY 1
         |), stats AS (
         |  SELECT (SELECT count(*) FROM documents) AS n_docs,
         |    CAST((SELECT sum(dl) FROM dl) AS DOUBLE)
         |      / CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl
         |), scored AS (
         |  SELECT tf.doc_id, tf.token,
         |    round(ln((CAST(stats.n_docs AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5)
         |          / (CAST(dfq.df AS DOUBLE) + 0.5) + 1.0)
         |      * (CAST(tf.tf AS DOUBLE) * 2.2)
         |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (1.0 - 0.75
         |          + 0.75 * CAST(dl.dl AS DOUBLE) / stats.avgdl)), 6) AS bm25
         |  FROM tf JOIN dl USING (doc_id) JOIN dfq USING (token) CROSS JOIN stats
         |), ranked AS (
         |  SELECT doc_id, token, bm25,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY bm25 DESC, token) AS rk
         |  FROM scored
         |)
         |SELECT doc_id, CAST(rk AS INT) AS rk, token, bm25 FROM ranked
         |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "text_retrieval" -> RETRIEVAL_SQL,
    // 121: same ranked retrieval, deep (top-10), same token counting
    // as corpus_stats, prefix-cumsum budget rule
    "retrieval_pack" ->
      s"""WITH $RETRIEVAL_CTES, ntok AS (
         |  SELECT doc_id, CASE WHEN $NORM = '' THEN 0
         |    ELSE len(str_split($NORM, ' ')) END AS n_tokens
         |  FROM documents
         |), packed AS (
         |  SELECT r.query_id, r.rk, r.doc_id,
         |    CAST(nt.n_tokens AS BIGINT) AS n_tokens,
         |    CAST(sum(nt.n_tokens) OVER (PARTITION BY r.query_id ORDER BY r.rk
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_tokens
         |  FROM ranked r JOIN ntok nt USING (doc_id) WHERE r.rk <= 10
         |)
         |SELECT query_id, CAST(rk AS INT) AS rk, doc_id, n_tokens, cum_tokens
         |FROM packed WHERE cum_tokens <= 120 ORDER BY query_id, rk""".stripMargin,
    // 95b: the lake round-trip is invisible to the result by design —
    // the persisted-index probe must answer exactly like the
    // in-session one, so it shares the oracle verbatim
    "retrieval_indexed" -> RETRIEVAL_SQL,
    // 95g: publish-on-90% + frozen-stats append of the held-out 10% —
    // df/n_docs/avgdl come from the BASE slice only (the published
    // snapshot), tf/dl from every doc, the inner df join drops the
    // appended docs' OOV tokens (frozen-vocabulary contract), and the
    // probe runs the standard sparse top-k over the union
    "retrieval_indexed_append" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(str_split($NORM, ' ')) AS token FROM documents
         |), tf AS (
         |  SELECT doc_id, token, count(*) AS tf FROM t WHERE token <> '' GROUP BY 1, 2
         |), dl AS (
         |  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
         |), dfq AS (
         |  SELECT token, count(*) AS df FROM tf WHERE doc_id % 10 <> 9 GROUP BY 1
         |), stats AS (
         |  SELECT (SELECT count(*) FROM documents WHERE doc_id % 10 <> 9) AS n_docs,
         |    CAST((SELECT sum(dl.dl) FROM dl WHERE dl.doc_id % 10 <> 9) AS DOUBLE)
         |      / CAST((SELECT count(*) FROM documents WHERE doc_id % 10 <> 9) AS DOUBLE) AS avgdl
         |), wts AS (
         |  SELECT tf.doc_id, tf.token,
         |    CAST(round(round(ln((CAST(stats.n_docs AS DOUBLE) - CAST(dfq.df AS DOUBLE) + 0.5)
         |          / (CAST(dfq.df AS DOUBLE) + 0.5) + 1.0)
         |      * (CAST(tf.tf AS DOUBLE) * 2.2)
         |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (1.0 - 0.75
         |          + 0.75 * CAST(dl.dl AS DOUBLE) / stats.avgdl)), 6) * 1000000) AS BIGINT) AS w_i
         |  FROM tf JOIN dl USING (doc_id) JOIN dfq USING (token) CROSS JOIN stats
         |), qterms AS (
         |  SELECT doc_id AS query_id, token, w_i AS qw_i,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY w_i DESC, token) AS qrk
         |  FROM wts WHERE doc_id <= 10
         |), hits AS (
         |  SELECT q.query_id, w.doc_id, CAST(sum(q.qw_i * w.w_i) AS BIGINT) AS score_i
         |  FROM wts w JOIN (SELECT * FROM qterms WHERE qrk <= 3) q USING (token)
         |  GROUP BY 1, 2
         |), ranked AS (
         |  SELECT query_id, doc_id, score_i,
         |    row_number() OVER (PARTITION BY query_id ORDER BY score_i DESC, doc_id) AS rk
         |  FROM hits
         |)
         |SELECT query_id, CAST(rk AS INT) AS rk, doc_id, score_i FROM ranked
         |WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin,
    "hybrid_rerank" ->
      s"""WITH $HYBRID_CTES
         |SELECT query_id, CAST(rk AS INT) AS rk, doc_id, rrf_i FROM ranked
         |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,
    // 142b: the fused cascade's top-5 graded against pseudo-qrels =
    // the dense exact top-5 (dscored re-ranked); gain/ideal-DCG
    // literals interpolated from Knn.DCG_GAINS_MI like retrieval_eval
    "retrieval_eval_hybrid" -> {
      val gainCase = Knn.DCG_GAINS_MI.zipWithIndex
        .map { case (g, i) => s"WHEN ${i + 1} THEN $g" }.mkString(" ")
      val idcgCase = Knn.IDCG_PREFIX_MI.zipWithIndex
        .map { case (p, i) => s"WHEN ${i + 1} THEN $p" }.mkString(" ")
      s"""WITH $HYBRID_CTES,
         |exr AS (
         |  SELECT query_id, vec_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS erk
         |  FROM dscored
         |), hev AS (
         |  SELECT r.query_id, r.rk,
         |    CASE WHEN x.vec_id IS NOT NULL THEN 1 ELSE 0 END AS rel,
         |    CASE r.rk $gainCase END AS g
         |  FROM (SELECT query_id, doc_id, rk FROM ranked WHERE rk <= 5) r
         |  LEFT JOIN (SELECT query_id, vec_id FROM exr WHERE erk <= 5) x
         |    ON x.query_id = r.query_id AND x.vec_id = r.doc_id
         |), perq AS (
         |  SELECT query_id, CAST(sum(rel) AS BIGINT) AS hits,
         |    CAST(sum(rel * g) AS BIGINT) AS dcg_i,
         |    CAST(coalesce(min(CASE WHEN rel = 1 THEN rk END), 0) AS BIGINT) AS first_rel
         |  FROM hev GROUP BY query_id
         |), nrel AS (
         |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
         |  FROM exr WHERE erk <= 5 GROUP BY query_id
         |)
         |SELECT n.query_id, n.n_rel,
         |  coalesce(p.hits, CAST(0 AS BIGINT)) AS hits,
         |  coalesce(p.first_rel, CAST(0 AS BIGINT)) AS first_rel,
         |  coalesce(p.dcg_i, CAST(0 AS BIGINT)) AS dcg_i,
         |  CAST(CASE least(n.n_rel, 5) $idcgCase END AS BIGINT) AS idcg_i,
         |  round(CAST(coalesce(p.hits, 0) AS DOUBLE)
         |    / CAST(least(n.n_rel, 5) AS DOUBLE), 6) AS recall,
         |  CASE WHEN coalesce(p.first_rel, 0) = 0 THEN 0.0
         |       ELSE round(1.0 / CAST(p.first_rel AS DOUBLE), 6) END AS mrr,
         |  CASE WHEN (CASE least(n.n_rel, 5) $idcgCase END) <= 0 THEN 0.0
         |       ELSE round(CAST(coalesce(p.dcg_i, 0) AS DOUBLE)
         |         / CAST((CASE least(n.n_rel, 5) $idcgCase END) AS DOUBLE), 6) END AS ndcg
         |FROM nrel n LEFT JOIN perq p USING (query_id)
         |ORDER BY n.query_id""".stripMargin
    },
    "doc_mask" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END AS tk
         |  FROM documents
         |), s AS (
         |  SELECT doc_id, tk, len(tk) AS n FROM t
         |), m AS (
         |  SELECT doc_id, n,
         |    flatten(list_transform(range(0, CAST(greatest(ceil(n / 8.0), 1) AS BIGINT)),
         |      b -> CASE WHEN n - 8*b >= 8
         |          AND ('0x' || substr(md5('mask:' || doc_id || ':' || b), 1, 8))::UBIGINT % 100 < 30
         |        THEN list_concat(list_concat(
         |          tk[8*b + 1 : 8*b + CAST(('0x' || substr(md5('off:' || doc_id || ':' || b), 1, 8))::UBIGINT % 6 AS INT)],
         |          ['<extra_id>']),
         |          tk[8*b + CAST(('0x' || substr(md5('off:' || doc_id || ':' || b), 1, 8))::UBIGINT % 6 AS INT) + 4 : 8*b + 8])
         |        ELSE tk[8*b + 1 : CAST(least(8*b + 8, n) AS INT)] END)) AS mtk
         |  FROM s
         |)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
         |  CAST(3 * ((n - len(mtk)) // 2) AS BIGINT) AS n_masked,
         |  sha256(array_to_string(mtk, ' ')) AS masked_sha
         |FROM m ORDER BY doc_id""".stripMargin,
    "corpus_shard" ->
      """WITH keyed AS (
        |  SELECT doc_id, md5('shard:' || CAST(doc_id AS VARCHAR)) AS k,
        |    CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |      % 8 AS BIGINT) AS shard_id
        |  FROM documents
        |)
        |SELECT shard_id, CAST(row_number() OVER
        |    (PARTITION BY shard_id ORDER BY k, doc_id) AS BIGINT) AS pos,
        |  doc_id
        |FROM keyed ORDER BY shard_id, pos""".stripMargin,
    "text_bpe" ->
      s"""WITH t AS (
         |  SELECT unnest(str_split($NORM, ' ')) AS token FROM documents
         |), freq AS (
         |  SELECT token, count(*) AS f FROM t WHERE token <> '' GROUP BY 1
         |), pos AS (
         |  SELECT token, f, unnest(range(1, length(token))) AS i
         |  FROM freq WHERE length(token) >= 2
         |), pairs AS (
         |  SELECT substr(token, CAST(i AS INT), 2) AS pair, f FROM pos
         |)
         |SELECT pair, CAST(sum(f) AS BIGINT) AS w FROM pairs
         |GROUP BY pair ORDER BY w DESC, pair LIMIT 20""".stripMargin,
    // 89b: full replay of the 8-round merge chain — chained CTEs (one
    // pairs/best/sym triple per round; recursive CTEs cannot aggregate
    // over the recursive table), same separator-string replace
    "text_bpe_train" -> {
      val unions = (1 to BPE_ROUNDS)
        .map(i => s"SELECT step, l, r, wt FROM best$i").mkString(" UNION ALL ")
      s"""$BPE_CASCADE
         |SELECT step, l, r, CAST(wt AS BIGINT) AS wt
         |FROM ($unions) ORDER BY step""".stripMargin
    },
    // 89c: the trained segmentation applied back to the corpus — join
    // every token instance (position-kept) to sym8's symbols, rebuild
    // each document's subtoken stream in order, hash it
    "text_bpe_apply" ->
      s"""$BPE_CASCADE, segs AS (
         |  SELECT token, list_filter(str_split(trim(w), '  '), x -> x <> '') AS sy
         |  FROM sym$BPE_ROUNDS
         |), tkc AS (
         |  SELECT doc_id,
         |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END AS tk
         |  FROM documents
         |), tok AS (
         |  SELECT doc_id, unnest(range(1, len(tk) + 1)) AS pos,
         |    unnest(tk) AS token
         |  FROM tkc
         |), seginst AS (
         |  SELECT t.doc_id, t.pos, len(s.sy) AS n_sub,
         |    array_to_string(s.sy, ' ') AS seg
         |  FROM tok t JOIN segs s USING (token)
         |), agg AS (
         |  SELECT doc_id, CAST(sum(n_sub) AS BIGINT) AS n_subtokens,
         |    string_agg(seg, ' ' ORDER BY pos) AS stream
         |  FROM seginst GROUP BY doc_id
         |)
         |SELECT d.doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
         |  coalesce(a.n_subtokens, 0) AS n_subtokens,
         |  sha256(coalesce(a.stream, '')) AS seg_sha
         |FROM tkc d LEFT JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "text_fingerprint" ->
      s"""SELECT doc_id, sha256($NORM) AS fp_sha256,
         |  substr(sha256($NORM), 1, 16) AS fp_prefix
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_redact" -> {
      val (em, ip, dg) = (Text.emailRe, Text.ipv4Re, Text.longDigitsRe)
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$em')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ipv4,
         |  CAST(len(regexp_extract_all(text, '$dg')) AS BIGINT) AS n_digit_runs,
         |  sha256(regexp_replace(regexp_replace(regexp_replace(text,
         |    '$em', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$dg', '<NUM>', 'g')) AS fp_redacted
         |FROM documents ORDER BY doc_id""".stripMargin
    })
    // 141c: the published-tokenizer pack must be byte-identical to
    // training in-session — it SHARES pretrain_examples_bpe's oracle
    // verbatim (the retrieval_indexed convention: the lake round trip
    // is invisible to the result, and the shared SQL proves it)
    match {
      case m => m.updated("pretrain_examples_bpe_indexed",
        m("pretrain_examples_bpe"))
    }
}
