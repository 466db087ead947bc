package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Joins
import scala.util.Random

/** Randomized equivalence properties for the non-equi join rewrites:
  * the scalable forms must agree with the naive theta-join forms on
  * arbitrary inputs — including ties, duplicates, unmatched rows,
  * negative values, zero-length intervals, and bucket-boundary points.
  * Fixed seeds keep the suite deterministic. */
class JoinPropertiesSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin == naive latest-match over random datasets") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val nKeys = 1 + rnd.nextInt(4)
      // right side unique per (key, t) as the operator requires
      val right = (for {
        k <- 0 until nKeys
        t <- rnd.shuffle((0 until 40).toList).take(5 + rnd.nextInt(10))
      } yield (k.toLong, t.toLong, rnd.nextInt(100))).distinct
      val left = (0 until 30).map { i =>
        (rnd.nextInt(nKeys + 1).toLong, // one key may have no right rows
          (rnd.nextInt(44) - 2).toLong, i.toLong) // times outside right's range too
      }
      val r = right.toDF("k", "rt", "payload")
        .select($"k", $"rt", $"rt".as("m_t"), $"payload".as("m_p"))
      val l = left.toDF("k", "t", "row_id")
      val got = Joins.asofJoin(l, r, Seq("k"), "t", "rt", Seq("m_t", "m_p"))
      val naive = {
        val rr = right.toDF("rk", "rt", "rp")
        val w = Window.partitionBy($"row_id").orderBy($"rt".desc)
        l.join(rr, $"k" === $"rk" && $"rt" <= $"t", "left")
          .withColumn("rn", row_number().over(w)).where($"rn" === 1)
          .select($"k", $"t", $"row_id", $"rt".as("m_t"), $"rp".as("m_p"))
      }
      assert(got.count() == left.size, s"seed=$seed: not left-total")
      assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
        s"seed=$seed: asof mismatch")
    }
  }

  test("rangeJoin == naive BETWEEN join over random intervals and widths") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val ints = (0 until 25).map { i =>
        val lo = (rnd.nextInt(200) - 100).toLong // negative bounds too
        (i.toLong, lo, lo + rnd.nextInt(30))     // zero-length allowed
      }.toDF("int_id", "lo", "hi")
      val pts = (0 until 60).map { i =>
        (i.toLong, (rnd.nextInt(240) - 120).toLong)
      }.toDF("pt_id", "pt")
      for (width <- Seq(1L, 7L, 64L)) {
        val got = Joins.rangeJoin(pts, ints, Nil, "pt", "lo", "hi", width)
          .select($"int_id", $"pt_id")
        val naive = pts.join(ints, $"pt" >= $"lo" && $"pt" <= $"hi")
          .select($"int_id", $"pt_id")
        assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
          s"seed=$seed width=$width: range mismatch")
      }
    }
  }
}
