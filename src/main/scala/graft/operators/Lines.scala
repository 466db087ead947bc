package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line- and paragraph-granularity corpus cleaning — the C4 /
  * RefinedWeb curation stages between raw text and document-level
  * dedup:
  *
  * - [[cleanLines]] is C4 §2.2's line filter set (Raffel et al., 2020)
  *   plus RefinedWeb-style cross-document duplicate-line removal:
  *   per-line keep rules (minimum word count, the "javascript" rule,
  *   optional terminal-punctuation requirement), page-level drops
  *   ("lorem ipsum", curly brace), then every normalized line that
  *   repeats across the corpus keeps only its first occurrence —
  *   boilerplate headers/footers/cookie banners vanish from every
  *   page but one.
  * - [[dedupParagraphs]] is Falcon/RefinedWeb exact-dedup at paragraph
  *   granularity: split on blank lines, fingerprint the normalized
  *   paragraph, keep-first across the corpus, reassemble.
  *
  * Scale shape (both): explode is a narrow map; first-occurrence
  * election is ONE aggregation keyed on the normalized line/paragraph
  * (map-side combine absorbs hot boilerplate keys — a footer in 10⁶
  * docs produces one partial per map task, never a 10⁶-row reduce
  * group), and the keep-first join's key includes (doc_id, idx), so
  * no hot key reaches a join. Reassembly groups by doc_id — bounded
  * by document size, the doc_chunk discipline. Nothing corpus-sized
  * crosses the driver.
  */
object Lines {

  /** The shared whitespace-collapse normalization (the corpus NORM
    * convention) applied to one line/paragraph. */
  private def norm(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Page + line rule stage shared by [[cleanLines]] and the
    * streaming gate: page-level drops (C4's "lorem ipsum" / curly
    * brace), then per-line min-words, "javascript", and optional
    * terminal-punctuation filters. Returns (doc_id, line_idx, line,
    * n_lines, lnorm). */
  private[graft] def ruleLines(docs: DataFrame, minWords: Int,
      requireTerminalPunct: Boolean): DataFrame = {
    val pages = docs.select(col("doc_id"), col("text"))
      .where(!lower(col("text")).contains("lorem ipsum") &&
        !col("text").contains("{"))
    val lines = pages
      .select(col("doc_id"), size(split(col("text"), "\n", -1)).as("n_lines"),
        posexplode(split(col("text"), "\n", -1)))
      .withColumnRenamed("pos", "line_idx").withColumnRenamed("col", "line")
    val tl = trim(col("line"))
    val wc = when(tl === "", lit(0)).otherwise(size(split(tl, " +", -1)))
    val punctOk =
      if (requireTerminalPunct) tl.rlike("[.!?\"]$") else lit(true)
    lines
      .where(wc >= minWords && !lower(col("line")).contains("javascript") &&
        punctOk)
      .withColumn("lnorm", norm(col("line")))
  }

  /** Keep-first duplicate-line removal + per-doc reassembly over a
    * [[ruleLines]]-shaped frame: elect the lexicographically smallest
    * (doc_id, line_idx) per normalized line via ONE aggregation (hot
    * boilerplate keys combine map-side), re-join on a key that
    * includes the position (never hot), rebuild the text. */
  private[graft] def assembleKeepFirst(kept: DataFrame): DataFrame = {
    // ONE aggregation elects the first occurrence AND carries its
    // payload: min(struct(doc_id, line_idx, line, n_lines)) is the
    // lexicographic minimum over the unique (doc_id, line_idx) prefix,
    // so the trailing fields ride along with the elected row — the
    // former elect-then-join-back form paid a second exchange and a
    // join on the same key for identical rows (r18-opt). Hot
    // boilerplate keys still combine map-side (min over structs).
    val keptFirst = kept.groupBy(col("lnorm"))
      .agg(min(struct(col("doc_id"), col("line_idx"), col("line"),
        col("n_lines"))).as("first"))
      .select(col("first.doc_id").as("doc_id"),
        col("first.line_idx").as("line_idx"), col("first.line").as("line"),
        col("first.n_lines").as("n_lines"))
    keptFirst.groupBy(col("doc_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("line_idx"), col("line")))),
          x => x("line")), "\n").as("clean_text"),
        count(lit(1)).as("n_kept"),
        first(col("n_lines")).cast("long").as("n_lines"))
  }

  /** The page blocklist (C4 §2.2's "bad word" rule: drop any page
    * containing a listed token — the "List of Dirty, Naughty, Obscene
    * or Otherwise Bad Words" stand-in). A FIXED interpolated list, the
    * mojibake-table convention: the same Seq folds into the Spark
    * filter and the text_badwords oracle SQL, so the two engines
    * cannot drift. The list is matched against NORMALIZED whitespace
    * tokens (exact token equality, not substring — "scunthorpe" stays
    * clean), which is C4's actual behavior. Contains both
    * corpus-present tokens (so the sf fixtures exercise the drop
    * branch) and absent ones (the keep branch). */
  val badwords: Seq[String] = Seq("dup", "poison", "hazmat", "contraband")

  /** Blocklist PAGE FILTER as a pure narrow predicate: keep rows with
    * zero blocklisted tokens. This is the composition form — a
    * semi-join against [[badwordAudit]] would shuffle two corpus-sized
    * sides for what one codegen'd array-HOF `.where` expresses. */
  def dropBadwordPages(docs: DataFrame): DataFrame = {
    val arr = array(badwords.map(lit): _*)
    docs.where(size(filter(graft.functions.Text.tokensOrEmpty(col("text")),
      t => array_contains(arr, t))) === 0)
  }

  /** Per-page blocklist audit: (doc_id, n_bad, kept) — `n_bad` counts
    * blocklisted tokens (with multiplicity), `kept` = no hits. A pure
    * narrow map over the token array (array HOF against a 4-element
    * literal array — codegen'd, zero shuffles at any corpus size);
    * page filtering composes through [[dropBadwordPages]] (the
    * narrow `.where` form — never a semi-join back onto the corpus). */
  def badwordAudit(docs: DataFrame): DataFrame = {
    val arr = array(badwords.map(lit): _*)
    docs.select(col("doc_id"),
      size(filter(graft.functions.Text.tokensOrEmpty(col("text")),
        t => array_contains(arr, t))).cast("long").as("n_bad"))
      .select(col("doc_id"), col("n_bad"), (col("n_bad") === 0).as("kept"))
  }

  /** C4-style line cleaning. Returns (doc_id, clean_text, n_kept,
    * n_lines); documents with zero surviving lines (or tripping the
    * page-level rules) drop out, like C4's empty-page discard.
    *
    * `requireTerminalPunct` is C4's "retain only lines ending in
    * terminal punctuation" — real web-crawl hygiene, but a synthetic
    * punctuation-free corpus would lose every line, so the query key
    * runs with it off and the planted-fixture spec pins it on. */
  def cleanLines(docs: DataFrame, minWords: Int = 3,
      requireTerminalPunct: Boolean = false): DataFrame =
    // single consumer since the election join folded into one
    // aggregate (see assembleKeepFirst) — no materialization needed
    assembleKeepFirst(ruleLines(docs, minWords, requireTerminalPunct))

  /** Paragraph-level exact dedup (Falcon/RefinedWeb): split on blank
    * lines, fingerprint the normalized paragraph (sha-256 — the
    * dedup_exact convention), keep only the corpus-first occurrence of
    * each fingerprint, reassemble with blank-line separators. Returns
    * (doc_id, clean_text, n_pars, n_removed); documents whose every
    * paragraph is a repeat drop out entirely. */
  def dedupParagraphs(docs: DataFrame): DataFrame = {
    // materialized ONCE: the paragraph rows feed the n_pars totals,
    // the first-occurrence election AND the keep join (three
    // consumers) — un-truncated, the blank-line split + normalize +
    // sha-256 chain (and everything upstream of `docs`, a full
    // line-clean pipeline when composed in prepText) re-ran per
    // reference (r18-opt; the streaming gate already materialized its
    // paragraphs frame for this reason).
    val pars = graft.Materialize.once(paragraphs(docs))
    assembleParagraphsKeepFirst(pars, pars)
  }

  /** Fingerprinted paragraph rows of `docs`: (doc_id, par_idx, par,
    * pnorm, fp) — blank-line split, empty paragraphs dropped, sha-256
    * of the normalized paragraph. Shared by [[dedupParagraphs]] and
    * the streaming gate (CorpusStream.startParagraphDedup). */
  private[graft] def paragraphs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .select(col("doc_id"), posexplode(split(col("text"), "\\n{2,}", -1)))
      .withColumnRenamed("pos", "par_idx").withColumnRenamed("col", "par")
      .withColumn("pnorm", norm(col("par")))
      .where(col("pnorm") =!= "")
      .withColumn("fp", sha2(col("pnorm"), 256))

  /** Keep-first election + reassembly over [[paragraphs]]-shaped
    * frames: `eligible` supplies the candidate paragraphs (the batch
    * minus the already-published registry, in the streaming case),
    * `all` supplies the per-doc paragraph totals the n_pars/n_removed
    * accounting reports (the FULL split, so a registry-dropped
    * paragraph still counts as removed). */
  private[graft] def assembleParagraphsKeepFirst(eligible: DataFrame,
      all: DataFrame): DataFrame = {
    val nPars = all.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pars"))
    // one-aggregation election with the payload riding the struct min
    // (see assembleKeepFirst) — the elect-then-join-back form paid a
    // second exchange + join on fp for identical rows (r18-opt)
    val keptFirst = eligible.groupBy(col("fp"))
      .agg(min(struct(col("doc_id"), col("par_idx"), col("par"))).as("first"))
      .select(col("first.doc_id").as("doc_id"),
        col("first.par_idx").as("par_idx"), col("first.par").as("par"))
    keptFirst.groupBy(col("doc_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("par_idx"), col("par")))),
          x => x("par")), "\n\n").as("clean_text"),
        count(lit(1)).as("n_kept"))
      .join(nPars, Seq("doc_id"))
      .select(col("doc_id"), col("clean_text"), col("n_pars"),
        (col("n_pars") - col("n_kept")).as("n_removed"))
  }
}
