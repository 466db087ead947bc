package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout
import graft.sources.Tables

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderValue interleaves bits exactly") {
    val df = Seq((3L, 0L), (0L, 3L), (65535L, 65535L), (21845L, 0L))
      .toDF("x", "y")
    val z = df.select(Layout.zorderValue($"x", $"y").as("z")).as[Long].collect()
    assert(z(0) == 5L)            // x bits 0,1 -> z bits 0,2
    assert(z(1) == 10L)           // y bits 0,1 -> z bits 1,3
    assert(z(2) == 0xFFFFFFFFL)   // all 32 bits set
    assert(z(3) == 0x11111111L)   // alternating x bits -> every 4th z bit
  }

  test("z>>12 tiles bound BOTH dimensions to 64-value spans") {
    val got = SparkEntry.queries("q_zorder")(spark, sfDir).collect()
    assert(got.length > 10, s"zorder collapsed to ${got.length} buckets")
    got.foreach { r =>
      assert(r.getAs[Long]("max_ck") - r.getAs[Long]("min_ck") <= 63,
        "custkey span leaked outside the tile")
      assert(r.getAs[Long]("max_dy") - r.getAs[Long]("min_dy") <= 63,
        "order-day span leaked outside the tile")
    }
  }

  test("clusterByZ: z-sorted within partitions, disjoint ranges across them") {
    val ord = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey")
    val z = Layout.zorderValue($"o_custkey", $"o_orderkey")
    val ranges = Layout.clusterByZ(ord, z, 4)
      .select(Layout.zorderValue($"o_custkey", $"o_orderkey").as("z")).as[Long]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          var sorted = true; var prev = Long.MinValue
          var lo = Long.MaxValue; var hi = Long.MinValue
          it.foreach { v =>
            if (v < prev) sorted = false
            prev = v; lo = math.min(lo, v); hi = math.max(hi, v)
          }
          Iterator.single((sorted, lo, hi))
        }
      }.collect()
    assert(ranges.forall(_._1), "a partition is not z-sorted")
    val sortedRanges = ranges.sortBy(_._2)
    sortedRanges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) =>
        assert(hi1 <= lo2, "partition z-ranges overlap")
      case _ =>
    }
  }
}
