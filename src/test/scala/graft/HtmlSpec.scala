package graft

import org.apache.spark.sql.functions._
import graft.functions.Html

/** HTML extraction (SURVEY §2 #139): strip semantics on planted pages
  * and the curation-stack composition ahead of text_lines. */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def ex(s: String): String =
    Seq(1).toDF("x").select(Html.extractText(lit(s)).as("r")).head.getString(0)

  test("extractText: drops, block structure, inline spacing, entities") {
    // script/style/comment content must vanish entirely
    assert(!ex("<p>keep</p><script>var secret = 1;</script>").contains("secret"))
    assert(!ex("<style>body { color: red }</style>visible").contains("color"))
    assert(!ex("before<!-- hidden words --><b>after</b>").contains("hidden"))
    // block tags become line boundaries; inline tags separate words
    assert(ex("<p>one line</p><p>two line</p>") == "one line\ntwo line")
    assert(ex("a<b>b</b>c") == "a b c", "inline tags must separate words")
    // entity decode, once: already-escaped text stays escaped
    assert(ex("fish &amp; chips") == "fish & chips")
    assert(ex("&amp;lt; is an escaped less-than") == "&lt; is an escaped less-than")
    assert(ex("a&nbsp;b&mdash;c") == "a b—c")
    // markup-free text is (whitespace-normalized) identity
    assert(ex("plain words only") == "plain words only")
    // head content (title/meta) is boilerplate, dropped wholesale
    assert(ex("<head><title>Site Name</title><meta charset=\"utf-8\"></head>" +
      "<p>real body text</p>") == "real body text")
    assert(ex("<head profile=\"x\"><title>T</title></head>body") == "body")
    // HTML5 <header> is VISIBLE content — must not match the head drop
    assert(ex("<header>site banner words</header><p>body</p>")
      .contains("site banner words"))
    // unclosed <head> degrades locally: the tag strips, text survives
    assert(ex("<head><title>orphan title</title>no close body words")
      .contains("no close body words"))
  }

  test("composition: html -> fixText -> badwords -> cleanLines yields clean pages") {
    val pages = Seq(
      (1L, "<html><body><p>genuine content line here</p>" +
        "<p>shared footer subscribe now</p>" +
        "<script>tracking()</script></body></html>"),
      (2L, "<div>another genuine content line</div>" +
        "<p>shared footer subscribe now</p>"),
      (3L, "<p>this page mentions dup so the blocklist drops it</p>")
    ).toDF("doc_id", "text")
    val plain = pages.select(col("doc_id"),
      graft.functions.Text.fixText(Html.extractText(col("text"))).as("text"))
    val kept = plain.join(
      graft.operators.Lines.badwordAudit(plain).where(col("kept"))
        .select(col("doc_id")), Seq("doc_id"), "left_semi")
    val out = graft.operators.Lines.cleanLines(kept)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // blocklisted page gone; footer kept once (first occurrence)
    assert(out.keySet == Set(1L, 2L), out.toString)
    assert(out(1L) == "genuine content line here\nshared footer subscribe now")
    assert(out(2L) == "another genuine content line",
      s"cross-page footer must dedup: ${out(2L)}")
  }
}
