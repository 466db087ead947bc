package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional lake layout: Z-order (Morton curve) clustering.
  *
  * At 100 TB the dominant read cost is scan pruning: sorting a table
  * by one column gives min/max file skipping on that column only;
  * writing it in Z-order of (x, y) gives useful min/max ranges on
  * BOTH columns in every file, so selective predicates on either
  * dimension prune. [[zorderValue]] is a pure codegen'd Column (16
  * bits per dimension, statically unrolled interleave — no UDF);
  * [[clusterByZ]] is the write-side shuffle you pay once
  * (repartitionByRange + sortWithinPartitions on the z-value) so
  * every later scan is prunable.
  */
object Layout {

  /** 32-bit Morton interleave of two dimensions, each masked to its
    * low 16 bits: bit i of x lands at position 2i, bit i of y at
    * 2i+1. Pure integer bit arithmetic — an independent engine
    * replays it exactly (q_zorder oracle). Negative inputs contribute
    * their two's-complement low 16 bits (same on every engine);
    * shift/offset dimensions into [0, 2^16) first when sign order
    * matters for locality. */
  def zorderValue(x: Column, y: Column): Column = {
    val xb = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val yb = y.cast("long").bitwiseAND(lit(0xFFFFL))
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Write-side clustering: one range shuffle on the z-value, files
    * sorted by it — parquet row-group min/max then prunes on both
    * interleaved dimensions. */
  def clusterByZ(df: DataFrame, z: Column, nFiles: Int): DataFrame =
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
}
