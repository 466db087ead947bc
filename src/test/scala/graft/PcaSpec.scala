package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca
import graft.sources.Tables

/** Spec for the matrix-free power-iteration PCA (#110): the full
  * training loop replayed in plain Scala, plus variance-capture and
  * unit-norm sanity. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("pc1 + project: exact Scala replay of the integer-grid power iteration") {
    val e = Tables.embeddings(spark, sfDir)
    val vecs = e.select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => (id, v.map(_.toDouble).toArray) }
    val n = vecs.length
    val dim = vecs.head._2.length
    // exact integer-grid mean
    val muS = Array.fill(dim)(0L)
    vecs.foreach(_._2.zipWithIndex.foreach { case (x, i) =>
      muS(i) += math.floor(x * 1000000.0 + 0.5).toLong })
    val mu = muS.map(s => s.toDouble / (n.toDouble * 1000000.0))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    var v = Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)
    (1 to 3).foreach { _ =>
      val sums = Array.fill(dim)(0L)
      vecs.foreach { case (_, x) =>
        val y = dot(x, v)
        x.zipWithIndex.foreach { case (xi, i) =>
          sums(i) += math.floor(xi * y * 1000000.0 + 0.5).toLong }
      }
      val mudotv = dot(mu, v)
      val w = Array.tabulate(dim)(i =>
        sums(i).toDouble / (n.toDouble * 1000000.0) - mu(i) * mudotv)
      val nrm = math.sqrt(dot(w, w))
      v = w.map(x => round6(x / nrm))
    }
    val wantProj = vecs.map { case (id, x) =>
      id -> round6(dot(x, v) - dot(mu, v)) }.toMap
    val got = Pca.project(e, iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(got.size == n)
    wantProj.foreach { case (id, p) => assert(got(id) == p, s"vec $id") }
    // trained component is unit norm (up to the 1e-6 rounding)
    assert(math.abs(dot(v, v) - 1.0) < 1e-4)
    // PC1 captures at least as much variance as the init direction e0
    // (power iteration is monotone in the Rayleigh quotient)
    def variance(proj: Iterable[Double]): Double = {
      val m = proj.sum / proj.size
      proj.map(p => (p - m) * (p - m)).sum / proj.size
    }
    val v0 = vecs.map { case (_, x) => x(0) - mu(0) }
    assert(variance(wantProj.values) >= variance(v0.toSeq) * 0.99)
  }

  test("degenerate corpus (all vectors identical) fails fast, not silent NaN") {
    import spark.implicits._
    val flat = (0L until 20L).map(i => (i, Array.fill(8)(0.25f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] { Pca.project(flat, iters = 2).collect() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(ex).exists(m => m != null && m.contains("zero-norm")), chain(ex).toString)
  }
}
