package graft

import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.operators.LangId

/** Trigram-NB language ID (SURVEY §2 #137): semantics on a planted
  * multilingual fixture — the corpus oracle key only pins the
  * arithmetic, since the synthetic corpus's lang label is independent
  * of its text. */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  // even doc_ids = training split; realistic-ish prose per language
  private val train = Seq(
    (0L, "en", "the butterfly spreads bright wings and flies over the garden wall every morning"),
    (2L, "en", "small wings carry the butterfly between flowering branches in the warm summer air"),
    (4L, "de", "der schmetterling breitet seine flügel aus und fliegt über die gartenmauer am morgen"),
    (6L, "de", "kleine flügel tragen den schmetterling zwischen blühenden zweigen durch die warme sommerluft"),
    (8L, "fr", "le papillon déploie ses ailes brillantes et vole au-dessus du mur du jardin chaque matin"),
    (10L, "fr", "de petites ailes portent le papillon entre les branches fleuries dans la chaleur"))
  // odd doc_ids = held-out short docs with NO stopwords from any list
  private val test = Seq(
    (1L, "en", "butterfly wings"),
    (3L, "de", "schmetterling flügel"),
    (5L, "fr", "papillon ailes"),
    (7L, "en", "xq"))  // < 3 normalized chars -> und

  test("trigram NB classifies short stopword-free docs the heuristic calls und") {
    val docs = (train ++ test).toDF("doc_id", "lang", "text")
    val got = LangId.langIdTrigram(docs)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3))).toMap
    // held-out short docs: trigram model right, stopword heuristic und
    for ((id, want) <- Seq(1L -> "en", 3L -> "de", 5L -> "fr")) {
      assert(got(id)._2 == want, s"doc $id: got ${got(id)}")
      val heur = docs.where(col("doc_id") === id)
        .select(Text.langId(col("text"))).head.getString(0)
      assert(heur == "und", s"doc $id: heuristic unexpectedly resolved $heur")
    }
    // trigram-less doc stays und with n_tri = 0
    assert(got(7L)._2 == "und" && got(7L)._3 == 0L)
    // training docs classify as their own language (in-sample sanity)
    for ((id, lang, _) <- train)
      assert(got(id)._2 == lang, s"train doc $id: got ${got(id)}")
  }

  test("determinism and out-of-profile behavior") {
    val docs = (train ++ test).toDF("doc_id", "lang", "text")
    val a = LangId.langIdTrigram(docs).orderBy("doc_id").collect().toSeq
    val b = LangId.langIdTrigram(docs).orderBy("doc_id").collect().toSeq
    assert(a == b)
    // a doc sharing no trigrams with ANY profile: every language scores
    // prior - n_tri*base. Here every language trains on 2 docs (equal
    // prior), so the winner is the SMALLEST base = ln(T_L + B), i.e.
    // the LEAST training trigram mass; with unequal training splits the
    // prior tilts short alien docs toward the best-represented
    // language. Ties alphabetical - deterministic, never null
    val alien = Seq((99L, "zz", "零宽字符测试样本")).toDF("doc_id", "lang", "text")
    val out = LangId.langIdTrigram(docs.unionByName(alien))
      .where(col("doc_id") === 99L).collect()
    assert(out.length == 1 && out(0).getString(2) != null && out(0).getString(2) != "und")
  }
}
