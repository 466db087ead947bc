package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML/markup stripping ahead of the text-curation stack — real crawl
  * corpora arrive as HTML, and every downstream stage (C4 line rules,
  * paragraph dedup, fingerprinting) assumes plain text. The extraction
  * is the standard main-content reduction:
  *
  *  1. DROP invisible elements wholesale: script/style (and HTML
  *     comments) contribute code, not text.
  *  2. Block-boundary tags (`</p>`, `<br>`, `</div>`, headings, list
  *     items, table rows) become NEWLINES — preserving the line/
  *     paragraph structure text_lines and dedup_paragraph key on.
  *  3. Every remaining tag becomes a space (inline markup separates
  *     words, never glues them: `a<b>b</b>` → "a b", not "ab").
  *  4. Decode the common entities (fixed interpolated table, the
  *     mojibake convention — `&amp;` deliberately LAST so already-
  *     escaped text like `&amp;lt;` decodes ONCE to `&lt;`, never
  *     twice to `<`).
  *  5. Collapse space runs and 3+ newline runs (keeping blank-line
  *     paragraph boundaries).
  *
  * Everything is regexp/replace built-ins written in the regex subset
  * Java and RE2 (DuckDB) interpret identically — inline `(?is)` flags,
  * non-greedy spans, no backreferences — so the html_extract oracle
  * replays the chain bit-for-bit. Pure narrow map: zero shuffles at
  * any corpus size, whole-stage codegen'd. */
object Html {

  /** Invisible-element spans, dropped wholesale (non-greedy, dotall,
    * case-insensitive). UNCLOSED spans never match their pattern and
    * fall through to the later stages, whose behavior differs by
    * kind: an unclosed `<script>`/`<style>` OPEN TAG is a well-formed
    * tag, so [[anyTagRe]] strips it and the (dead) body survives as
    * text; an unclosed `<!--` is not (no closing `>` within the
    * marker), so anyTagRe matches from `<!--` to the NEXT stray `>`
    * if one exists (eating the text between — bounded by the next
    * `>`, never to end-of-document) or leaves the literal `<!--`
    * when none does. Truncated pages therefore degrade locally, never
    * losing the whole remainder of the document. */
  val dropRes: Seq[String] = Seq(
    // whole <head> first: titles/meta are boilerplate, not content —
    // without this, </title> becomes a newline and the page title
    // flows into C4 line rules / line-fingerprint registries /
    // paragraph dedup as the first "content" line of every page.
    // `(?:\s[^>]*)?` (not `[^>]*`) so HTML5 <header>, which IS
    // visible content, never matches; no lookahead — RE2 (the oracle
    // engine) has none. An unclosed <head> falls through like any
    // unclosed span (the tag strips, its text survives — local
    // degradation, per the unclosed-span contract below).
    "(?is)<head(?:\\s[^>]*)?>.*?</head\\s*>",
    "(?is)<script[^>]*>.*?</script>",
    "(?is)<style[^>]*>.*?</style>",
    "(?s)<!--.*?-->")

  /** Tags that end a visual block: rewritten to \n BEFORE the generic
    * tag strip so document line structure survives. */
  val blockTagRe: String = "(?i)<(br|/p|/div|/h[1-6]|/li|/tr|/title)[^>]*>"

  /** Any remaining tag (or lone closer). */
  val anyTagRe: String = "<[^>]*>"

  /** Entity-decode table, applied in order; `&amp;` LAST (see object
    * doc). INTERPOLATED into the html_extract oracle SQL so the two
    * engines share one table. */
  val entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
    "&mdash;" -> "—", "&ndash;" -> "–", "&hellip;" -> "…",
    "&amp;" -> "&")

  /** Plain text of an HTML column (see object doc for the stages). */
  def extractText(html: Column): Column = {
    val dropped = dropRes.foldLeft(html)((c, re) => regexp_replace(c, re, ""))
    val blocks = regexp_replace(dropped, blockTagRe, "\n")
    val untagged = regexp_replace(blocks, anyTagRe, " ")
    val decoded = entities.foldLeft(untagged) {
      case (c, (e, v)) => replace(c, lit(e), lit(v))
    }
    // collapse: space runs to one space, spaces around newlines away,
    // 3+ newlines to a blank-line paragraph boundary, outer trim
    val sp = regexp_replace(decoded, "[ \\t]+", " ")
    val nl = regexp_replace(sp, " ?\\n ?", "\n")
    val para = regexp_replace(nl, "\\n{3,}", "\n\n")
    // boundary strip: trim handles spaces, not the newlines block
    // tags leave at the document edges
    trim(regexp_replace(para, "^\\n+|\\n+$", ""))
  }
}
