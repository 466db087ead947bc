package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.sources.Tables

/** Driver-facing queries + DuckDB oracles for the LLM-data-pipeline
  * operators (SURVEY §2 #25-35) over `documents` / `embeddings`.
  *
  * Near-dup / LSH / multimodal queries are rows-only checked (no
  * oracleSql): their semantics hinge on xxhash64 seeds and stub codecs
  * that no other engine reproduces; their correctness is pinned by
  * ScalaTest specs instead.
  */
object PipelineQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)
  private def embs(s: SparkSession, d: String): DataFrame = Tables.embeddings(s, d)

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
    // 27: SimHash near-dup pairs (rows-only; spec-pinned)
    "dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(docs(s, d), maxHamming = 6)
        .orderBy(col("doc_a"), col("doc_b"))),
    // 28: exact n-gram Jaccard similarity join (prefix-filtered;
    // trigram shingles keep document frequencies low -> small Σdf²)
    "dedup_jaccard" -> ((s, d) =>
      Dedup.jaccardPairs(docs(s, d), k = 3, threshold = 0.5)
        .orderBy(col("doc_a"), col("doc_b"))),
    // 29: brute-force cosine top-k, 10 broadcast query vectors
    "knn_cosine" -> ((s, d) => {
      val e = embs(s, d)
      Knn.cosineTopK(e, e.where(col("vec_id") < 10), k = 5)
        .select(col("query_id"), col("rk"), col("vec_id"), col("cos"))
    }),
    // 30: LSH-bucketed ANN (rows-only; spec checks recall vs #29)
    "knn_lsh" -> ((s, d) => {
      val e = embs(s, d)
      Knn.lshTopK(e, e.where(col("vec_id") < 10), k = 5, nPlanes = 16, bandBits = 4)
        .select(col("query_id"), col("rk"), col("vec_id"), col("cos"))
    }),
    // 36: embedding-cosine near-dup pairs (rows-only; spec pins
    // precision=1 and recall vs brute force)
    "dedup_embed" -> ((s, d) =>
      Knn.embeddingPairs(embs(s, d), threshold = 0.35)
        .orderBy(col("vec_a"), col("vec_b"))),
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
    // 33: token counting, three ways
    "text_tokens" -> ((s, d) => docs(s, d).select(
      col("doc_id"),
      Text.tokenCount(col("text")).cast("long").as("n_ws_tokens"),
      Text.bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"),
      Text.estTokensByChars(col("text")).as("n_est_tokens"))
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
        .orderBy(col("media_id"))))

  /** DuckDB oracles. Shared normalization: lower+trim+collapse-ws. */
  private val NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
  private def hitsSql(ws: Seq[String]): String = {
    val list = ws.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(str_split($NORM, ' '), t -> list_contains($list, t)))"
  }

  val oracleSql: Map[String, String] = Map(
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
    "text_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id, text, $NORM AS norm,
         |    CASE WHEN $NORM = '' THEN [] ELSE str_split($NORM, ' ') END AS toks
         |  FROM documents
         |), m AS (
         |  SELECT doc_id, text, toks,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    CASE WHEN length(text) = 0 THEN 0.0
         |      ELSE CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
         |           / CAST(length(text) AS DOUBLE) END AS punct_ratio,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |      ELSE CAST(${hitsSql(Text.stopwords.head._2).replace(s"str_split($NORM, ' ')", "toks")} AS DOUBLE)
         |           / CAST(len(toks) AS DOUBLE) END AS stopword_ratio,
         |    CASE WHEN len(toks) = 0 THEN 0.0
         |      ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
         |           / CAST(len(toks) AS DOUBLE) END AS mean_token_len
         |  FROM t
         |)
         |SELECT doc_id, n_chars, n_tokens,
         |  round(mean_token_len, 6) AS mean_token_len,
         |  round(punct_ratio, 6) AS punct_ratio,
         |  round(stopword_ratio, 6) AS stopword_ratio,
         |  round(
         |    least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4 +
         |    (CASE WHEN mean_token_len >= 3.0 AND mean_token_len <= 10.0 THEN 1.0 ELSE 0.0 END) * 0.2 +
         |    (CASE WHEN punct_ratio <= 0.1 THEN 1.0 WHEN punct_ratio <= 0.3 THEN 0.5 ELSE 0.0 END) * 0.2 +
         |    (CASE WHEN stopword_ratio >= 0.05 THEN 1.0 ELSE 0.0 END) * 0.2, 6) AS quality
         |FROM m ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      s"""SELECT doc_id,
         |  CAST(CASE WHEN $NORM = '' THEN 0 ELSE len(str_split($NORM, ' ')) END AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
         |  CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS n_est_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      s"""SELECT doc_id, sha256($NORM) AS fp_sha256,
         |  substr(sha256($NORM), 1, 16) AS fp_prefix
         |FROM documents ORDER BY doc_id""".stripMargin)
}
