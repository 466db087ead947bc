package graft

import graft.analytics.Analytics
import graft.operators.Scd
import scala.util.Random

/** Randomized equivalence properties for the newer operators: the
  * scalable forms must agree with independent brute-force
  * reimplementations on arbitrary inputs — ties, duplicate
  * timestamps, empty groups, deleted keys, interleaved stages. Fixed
  * seeds keep the suite deterministic. */
class OperatorPropertiesSpec extends SparkSpec {
  import spark.implicits._

  test("funnel greedy scan == brute-force chain existence on random event sets") {
    // independent reference: stage via explicit existential chain search
    def brute(ev: Seq[(Long, String)]): Int = {
      val cs = ev.collect { case (t, "click") => t }
      val vs = ev.collect { case (t, "view") => t }
      val ps = ev.collect { case (t, "purchase") => t }
      if (cs.isEmpty) 0
      else if (!cs.exists(c => vs.exists(_ > c))) 1
      else if (!cs.exists(c => vs.exists(v => v > c && ps.exists(_ > v)))) 2
      else 3
    }
    val types = Seq("click", "view", "purchase")
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val events = for {
        u <- 0 until 20
        _ <- 0 until (1 + rnd.nextInt(12))
      } yield (u.toLong, rnd.nextInt(8).toLong /* many ties */,
        types(rnd.nextInt(3)))
      val got = Analytics.funnelStages(events.toDF("user_id", "t", "et"))
        .as[(Long, Int)].collect().toMap
      val want = events.groupBy(_._1).map { case (u, evs) =>
        u -> brute(evs.map(e => (e._2, e._3)))
      }
      assert(got == want, s"seed=$seed: funnel stages diverge")
    }
  }

  test("funnel survives one adversarial hot user (10^6 events, spill-safe state)") {
    // a bot key with a million events: a collect_list form would
    // materialize them all in ONE aggregation row; the window form
    // spills to disk instead. The hot user's event cycle contains the
    // full chain; a control user with no click must stay at stage 0.
    val types = Seq("click", "view", "purchase")
    val hot = spark.range(1000000).selectExpr(
      "CAST(0 AS LONG) AS user_id", "id + 3 AS t",
      s"element_at(array(${types.map("'" + _ + "'").mkString(",")}), CAST(id % 3 AS INT) + 1) AS et")
    val control = Seq((0L, 0L, "click"), (1L, 1L, "view"), (1L, 2L, "purchase"))
      .toDF("user_id", "t", "et")
    val got = Analytics.funnelStages(hot.unionByName(control))
      .as[(Long, Int)].collect().toMap
    assert(got(0L) == 3, s"hot user should complete the funnel: $got")
    assert(got(1L) == 0, s"view/purchase without click is stage 0: $got")
  }

  test("scd2 merge == independent per-key classification on random snapshots") {
    val attrs = "ABCDE"
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val nKeys = 3 + rnd.nextInt(8)
      val open = (0 until nKeys).filter(_ => rnd.nextBoolean()).map { k =>
        (k.toLong, attrs(rnd.nextInt(5)).toString, "2020-01-01",
          None: Option[String], true)
      }
      val history = (0 until nKeys).filter(_ => rnd.nextInt(3) == 0).map { k =>
        (k.toLong, attrs(rnd.nextInt(5)).toString, "2010-01-01",
          Option("2020-01-01"), false)
      }
      val snap = (0 until nKeys + 2).filter(_ => rnd.nextBoolean()).map { k =>
        (k.toLong, attrs(rnd.nextInt(5)).toString)
      }
      val current = (history ++ open)
        .toDF("k", "attr", "valid_from", "valid_to", "is_current")
      val got = Scd.scd2Merge(current, snap.toDF("k", "attr"),
          Seq("k"), Seq("attr"), "2024-01-01")
        .as[(Long, String, String, Option[String], Boolean)].collect().toSet

      // independent classification
      val openMap = open.map(r => r._1 -> r).toMap
      val snapMap = snap.toMap
      val expected = history.toSet ++
        (openMap.keySet ++ snapMap.keySet).flatMap { k =>
          (openMap.get(k), snapMap.get(k)) match {
            case (Some(o), Some(a)) if o._2 == a => Set(o)
            case (Some(o), Some(a)) => Set(
              (k, o._2, o._3, Option("2024-01-01"), false),
              (k, a, "2024-01-01", None: Option[String], true))
            case (Some(o), None) =>
              Set((k, o._2, o._3, Option("2024-01-01"), false))
            case (None, Some(a)) =>
              Set((k, a, "2024-01-01", None: Option[String], true))
            case (None, None) => Set.empty[(Long, String, String, Option[String], Boolean)]
          }
        }
      assert(got == expected, s"seed=$seed: scd2 classification diverges")
    }
  }

  test("doc_mask: block invariants + independent md5-lattice replay of the mask count") {
    val rows = SparkEntry.queries("doc_mask")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // independent JVM-side replay of the gate lattice (third
    // implementation beside the Column expr and the DuckDB oracle)
    def bucket(s: String, mod: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % mod
    }
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = r.getAs[Long]("n_tokens")
      val m = r.getAs[Long]("n_masked")
      assert(m % 3 == 0 && m >= 0 && m <= n, s"doc $id: bad mask count $m/$n")
      if (n < 8) assert(m == 0, s"doc $id: short doc masked")
      val expected = 3L * (0L until math.max((n + 7) / 8, 1L)).count(b =>
        n - 8 * b >= 8 && bucket(s"mask:$id:$b", 100) < 30)
      assert(m == expected, s"doc $id: mask count $m != lattice replay $expected")
    }
  }

  test("doc_mask: empty/whitespace-only documents count zero tokens (oracle's semantics)") {
    // the testdata has no empty docs, so this divergence class is
    // invisible to the hash gate: Spark's split('') yields [''] →
    // n_tokens=1 unless guarded, while the oracle maps '' to []
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-mask-empty").toString
    graft.sources.Tables.documents(spark, sfDir).limit(3)
      .unionByName(Seq(
        (9001L, "", "en", "unit", 0L),
        (9002L, "   \t  ", "en", "unit", 6L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .write.mode("overwrite").parquet(s"$base/documents.parquet")
    val rows = SparkEntry.queries("doc_mask")(spark, base).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_masked"))).toMap
    assert(rows(9001L) == (0L, 0L), s"empty doc: ${rows(9001L)}")
    // tab-only doc: trim strips SPACES only in Spark and DuckDB alike,
    // so NORM is " " (not ""), and both engines split it to ['', ''] —
    // n_tokens=2 is the PARITY answer, quirky as it is
    assert(rows(9002L) == (2L, 0L), s"tab-only doc: ${rows(9002L)}")
  }

  test("text_dupcut: cuts exactly the planted cross-document span, leaves unique text") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-dupcut").toString
    val span = (1 to 9).map(i => s"shared$i").mkString(" ") // 9 tokens: two 8-windows
    val rows = Seq(
      (1L, s"alpha beta $span gamma delta epsilon zeta eta theta iota kappa"),
      (2L, s"one two three $span four five six seven eight nine ten"),
      (3L, "entirely unique content with no repeated windows at all here today"))
    rows.map { case (id, t) => (id, t, "en", "unit", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$base/documents.parquet")
    val got = SparkEntry.queries("text_dupcut")(spark, base).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_cut"), r.getAs[String]("kept_sha"))).toMap
    def sha(s: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // both holders lose exactly the 9 span tokens; the edited text is
    // the doc with the span excised (brute-force replay)
    assert(got(1L) == (19L, 9L,
      sha("alpha beta gamma delta epsilon zeta eta theta iota kappa")))
    assert(got(2L) == (19L, 9L,
      sha("one two three four five six seven eight nine ten")))
    assert(got(3L)._2 == 0L && got(3L)._1 == 11L, s"unique doc touched: ${got(3L)}")
  }

  test("corpus_shard: exact partition of the corpus with dense per-shard positions") {
    val rows = SparkEntry.queries("corpus_shard")(spark, sfDir).collect()
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length, "a doc appears twice in the manifest")
    val all = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.toSet == all, "manifest is not an exact partition of the corpus")
    rows.groupBy(_.getAs[Long]("shard_id")).foreach { case (sid, rs) =>
      val pos = rs.map(_.getAs[Long]("pos")).sorted.toSeq
      assert(pos == (1L to rs.length).toSeq, s"shard $sid positions not dense: $pos")
    }
    // reproducible: a second evaluation yields the identical manifest
    val again = SparkEntry.queries("corpus_shard")(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
