package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Knn}
import graft.sources.Tables

/** The native codegen expressions must reproduce the built-in-function
  * (HOF) compositions bit-for-bit — swapping implementations can never
  * change query results. Asserted over the whole sf0.001 corpus plus
  * edge-case strings.
  */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)
    .unionByName(Seq(
      (100001L, "", "x", "src", 0L),
      (100002L, "   ", "x", "src", 3L),
      (100003L, "ONE", "x", "src", 3L),
      (100004L, "A  B\tC\nd   e", "x", "src", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))

  test("simhash64 native == HOF on corpus + edges") {
    val diff = docs.select(
      Dedup.simhash64($"text").as("a"), Dedup.simhash64Hof($"text").as("b"))
      .where($"a" =!= $"b").count()
    assert(diff == 0)
  }

  test("shingles native == HOF (k=2,3) on corpus + edges") {
    for (k <- Seq(2, 3)) {
      val diff = docs.select(
        Dedup.shingles($"text", k).as("a"), Dedup.shinglesHof($"text", k).as("b"))
        .where($"a" =!= $"b").count()
      assert(diff == 0, s"k=$k")
    }
  }

  test("intersect_count native == HOF intersection count on shingle-set pairs") {
    // every adjacent-id doc pair: distinct shingle sets of varying
    // overlap, including empty-token edge docs. The reference is a HOF
    // composition the IntersectCountRewrite rule does NOT match (a
    // size(array_intersect) reference would now be rewritten to the
    // kernel itself and prove nothing).
    def ref(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      size(filter(array_distinct(a), x => array_contains(b, x)))
    val a = docs.select($"doc_id", Dedup.shingles($"text", 3).as("sh_a"))
    val b = docs.select(($"doc_id" - 1).as("doc_id"), Dedup.shingles($"text", 3).as("sh_b"))
    val joined = a.join(b, "doc_id")
    val diff = joined.select(
      graft.expressions.native.intersectCount($"sh_a", $"sh_b").as("x"),
      ref($"sh_a", $"sh_b").as("y"),
      graft.expressions.native.intersectCount($"sh_b", $"sh_a").as("z"))
      .where($"x" =!= $"y" || $"z" =!= $"y").count()
    assert(diff == 0)
  }

  test("size(array_intersect) auto-rewrites to the kernel; dups count once") {
    // built over range() so constant folding cannot collapse the plan
    // before the rewrite is observable
    val df = spark.range(4).select(
      when($"id" === 0, array(lit("x")))
        .when($"id" === 1, array(lit("a"), lit("a"), lit("b")))
        .when($"id" === 2, array().cast("array<string>"))
        .otherwise(array(lit("u"), lit("v"))).as("a"),
      when($"id" === 0, array(lit("x"), lit("x")))
        .when($"id" === 1, array(lit("b"), lit("b"), lit("a"), lit("c")))
        .when($"id" === 2, array(lit("a")))
        .otherwise(lit(null).cast("array<string>")).as("b"),
      $"id")
    val q = df.select($"id", size(array_intersect($"a", $"b")).as("n"))
    assert(q.queryExecution.optimizedPlan.toString.contains("graft_intersect_count"),
      "optimizer rule did not rewrite size(array_intersect)")
    val got = q.orderBy($"id").select($"n").collect()
    // dups count once (rows 0,1), empty -> 0, null side -> null
    assert(got(0).getInt(0) == 1 && got(1).getInt(0) == 2 && got(2).getInt(0) == 0)
    assert(got(3).isNullAt(0))
  }

  test("minhash signature native == HOF on corpus") {
    val diff = docs.select(
      graft.expressions.native.minhashSig($"text", 3, 32).as("a"),
      Dedup.minhashSignature(Dedup.shinglesHof($"text", 3), 32).as("b"))
      .where($"a" =!= $"b").count()
    assert(diff == 0)
  }

  test("cosine + lsh signature native == HOF on embeddings") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.select($"vec_id".as("qid"), $"embedding".as("q"))
      .where($"qid" < 20)
    val joined = e.crossJoin(broadcast(q))
    val cosDiff = joined.select(
      Knn.cosine($"embedding", $"q").as("a"),
      Knn.cosineHof($"embedding", $"q").as("b"))
      .where($"a" =!= $"b" && !(isnan($"a") && isnan($"b"))).count()
    assert(cosDiff == 0)
    val sigDiff = e.select(
      Knn.lshSignature($"embedding", 16).as("a"),
      Knn.lshSignatureHof($"embedding", 16).as("b"))
      .where($"a" =!= $"b").count()
    assert(sigDiff == 0)
    // mixed float-vector × double-centroid kernel (k-means / Rocchio
    // assignment): native == HOF bit-for-bit, including against
    // non-trivial double centroids (a scaled mean-ish vector)
    val cents = q.select(($"qid" % 4).as("cid"),
      transform($"q", x => x.cast("double") * 1.37 + 0.001).as("c"))
    val fdDiff = e.crossJoin(broadcast(cents)).select(
      graft.expressions.native.cosineFD($"embedding", $"c").as("a"),
      Knn.cosineDHof($"embedding", $"c").as("b"))
      .where($"a" =!= $"b" && !(isnan($"a") && isnan($"b"))).count()
    assert(fdDiff == 0)
    // PQ code-assignment distance: native == HOF over double pairs
    val dd = e.select(transform($"embedding", x => x.cast("double")).as("v"))
      .crossJoin(broadcast(cents))
      .select(round(graft.expressions.native.dist2D($"v", $"c"), 6).as("a"),
        graft.operators.Pq.dist2Hof($"v", $"c").as("b"))
      .where($"a" =!= $"b").count()
    assert(dd == 0)
  }

  test("sha-256 kernels match a plain-JVM reference implementation") {
    import graft.expressions.Kernels
    // sha64 / sha64Hex vs MessageDigest computed here, independently
    for (s <- Seq("", "a", "hello world", "的 是 了")) {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val h = md.digest(s.getBytes("UTF-8"))
      val expectHex = h.take(8).map(b => f"${b & 0xff}%02x").mkString
      assert(Kernels.sha64Hex(s) == expectHex)
      assert(Kernels.sha64(s) == java.lang.Long.parseUnsignedLong(expectHex, 16))
    }
    // simhash64Sha: equal text -> equal hash, multiplicity matters
    val r = docs.select(Dedup.simhash64Sha($"text").as("a"),
      Dedup.simhash64Sha(concat($"text", lit(""))).as("b"))
      .where($"a" =!= $"b").count()
    assert(r == 0)
    // minhashSigSha: right arity, each entry 16 lowercase hex chars
    val sig = docs.limit(20).select(
      graft.expressions.native.minhashSigSha($"text", 3, 32).as("sig"))
      .collect().map(_.getSeq[String](0))
    sig.foreach { sg =>
      assert(sg.length == 32)
      sg.foreach(h => assert(h.matches("[0-9a-f]{16}")))
    }
  }

  test("extension function args validated: non-constant band count fails cleanly") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_lsh_sign(array(1.0f), CAST(col AS INT)) FROM (SELECT 16 AS col)")
        .collect()
    }
    assert(e.getMessage.contains("graft_lsh_sign"))
    // a plain BIGINT literal (the previously-crashing case) now works
    val ok = spark.sql("SELECT graft_lsh_sign(array(1.0f, -2.0f), CAST(8 AS BIGINT)) AS s")
      .head.getLong(0)
    assert(ok >= 0)
  }

  test("SQL registration via SparkSessionExtensions") {
    // the shared test session is built with GraftExtensions
    val r = spark.sql("SELECT graft_simhash64('hello world') AS h").head.getLong(0)
    val c = Seq(("hello world")).toDF("t")
      .select(Dedup.simhash64($"t")).head.getLong(0)
    assert(r == c)
  }

  test("bloom probe == position-set composition; no false negatives on members") {
    val corpus = docs.where($"doc_id" <= 300)
    val idx = Dedup.bloomIndex(corpus)
    val got = Dedup.bloomProbe(idx, docs)
    // reference: all k positions ∈ the corpus's DISTINCT position set
    // (the definition the bitmap compresses — built-ins only)
    val cset = corpus
      .select(explode(Dedup.bloomPositions($"text")).as("p"))
      .agg(collect_set($"p").as("ps"))
    val ref = docs.crossJoin(broadcast(cset))
      .select($"doc_id",
        forall(Dedup.bloomPositions($"text"),
          p => array_contains($"ps", p)).as("want"))
    val diff = got.join(ref, "doc_id").where($"maybe_dup" =!= $"want").count()
    assert(diff == 0)
    // Bloom contract: a member can NEVER read false
    val fn = Dedup.bloomProbe(idx,
      corpus.select(($"doc_id" + 5000000L).as("doc_id"), $"text"))
      .where(!$"maybe_dup").count()
    assert(fn == 0)
  }

  test("bloom bitmap is row-order/partitioning/merge-shape invariant") {
    val corpus = docs.where($"doc_id" <= 300)
    def bits(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      Dedup.bloomIndex(df).head.getAs[Array[Byte]]("bitmap")
    val b1 = bits(corpus.repartition(1))
    val b32 = bits(corpus.repartition(32))
    val brev = bits(corpus.orderBy($"doc_id".desc).repartition(7))
    assert(java.util.Arrays.equals(b1, b32))
    assert(java.util.Arrays.equals(b1, brev))
    assert(b1.length == Dedup.bloomBits / 8)
  }

  test("bloom positions floorMod-wrap: -1 and mBits-1 set the same bit") {
    val m = Dedup.bloomBits
    val r = spark.sql(
      s"""SELECT graft_bloom_contains(b, array(CAST(${m - 1} AS BIGINT))) AS hi,
         |  graft_bloom_contains(b, array(CAST(${2L * m + 7} AS BIGINT))) AS wrap,
         |  graft_bloom_contains(b, array(CAST(7 AS BIGINT))) AS base,
         |  graft_bloom_contains(b, array(CAST(8 AS BIGINT))) AS miss,
         |  graft_bloom_contains(b, array()) AS empty
         |FROM (SELECT graft_bloom_agg(p, $m) AS b
         |      FROM (VALUES (CAST(-1 AS BIGINT)), (CAST(7 AS BIGINT))) v(p))
         |""".stripMargin).head()
    assert(r.getBoolean(0), "-1 wraps to bit mBits-1")
    assert(r.getBoolean(1), "2m+7 wraps to bit 7")
    assert(r.getBoolean(2))
    assert(!r.getBoolean(3), "unset bit reads false")
    assert(r.getBoolean(4), "empty position set is vacuously a member")
  }

  test("graft_bloom_agg validates its argument types cleanly") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT graft_bloom_agg(t, ${Dedup.bloomBits}) FROM (SELECT 'x' AS t)")
        .collect()
    }
    assert(e.getMessage.contains("graft_bloom_agg"))
  }

  test("cms: never underestimates, exact under no collisions, merge-shape invariant") {
    // tokens with known counts; indices = identity (idx = value) into
    // a 16-counter sketch — values 0..3 across 4 "seeds" of width 4
    // would collide; use a single-seed identity layout first
    val rows = (1 to 100).map(i => (i % 5).toLong) // counts: 0->20, 1..4->20 each
    val df = rows.toDF("v")
    // single index per row: no min, counter == count when no collision
    val sk = df.agg(graft.expressions.native.cmsAgg($"v", 16).as("sk"))
    val est = sk.select(
      graft.expressions.native.cmsEstimate($"sk", array(lit(0L))).as("e0"),
      graft.expressions.native.cmsEstimate($"sk", array(lit(3L))).as("e3"),
      graft.expressions.native.cmsEstimate($"sk", array(lit(9L))).as("e9"),
      graft.expressions.native.cmsEstimate($"sk",
        expr("CAST(array() AS ARRAY<BIGINT>)")).as("emp"))
      .head()
    assert(est.getLong(0) == 20L && est.getLong(1) == 20L)
    assert(est.getLong(2) == 0L, "untouched counter reads 0")
    assert(est.getLong(3) == 0L, "empty index set reads 0")
    // forced collisions: width 4 folds 0..4 -> {0,1,2,3} with 0 and 4
    // sharing counter 0 (floorMod): estimate(0) = 20 + 20 = 40 >= 20
    val skC = df.agg(graft.expressions.native.cmsAgg($"v", 4).as("sk"))
    val over = skC.select(
      graft.expressions.native.cmsEstimate($"sk", array(lit(0L))).as("e")).head().getLong(0)
    assert(over == 40L, "collision sums, never drops")
    // merge-shape invariance: sketch bytes identical across partitionings
    def bytes(n: Int): Array[Byte] =
      df.repartition(n).agg(graft.expressions.native.cmsAgg($"v", 16).as("sk"))
        .head().getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(bytes(1), bytes(32)))
    // SQL registration + type validation
    val viaSql = spark.sql(
      "SELECT graft_cms_estimate(graft_cms_agg(CAST(v AS BIGINT), 16), array(CAST(1 AS BIGINT))) AS e " +
        "FROM (SELECT explode(sequence(1, 10)) AS v)").head().getLong(0)
    assert(viaSql == 1L)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_cms_agg(t, 16) FROM (SELECT 'x' AS t)").collect()
    }
    assert(err.getMessage.contains("graft_cms_agg"))
  }
}
