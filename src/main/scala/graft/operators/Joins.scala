package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew- and locality-aware join helpers (SURVEY §5).
  *
  * AQE's skew-join split handles most skew at runtime; these are the
  * explicit tools for the cases it can't: a dimension too large to
  * broadcast joined on a key with pathological hot values
  * ([[saltedJoin]]), and repeated co-located joins on the same key
  * where the shuffle should be paid once at write time (bucketed
  * tables, see BucketingSpec).
  */
object Joins {

  /** Equi-join a skewed fact side against a (non-broadcastable)
    * dimension, salting the hot keys: the fact side gets a per-row
    * salt in [0, factor), the dim side is replicated once per salt
    * value, and the join key becomes (key, salt) — a hot key's rows
    * now spread over `factor` reducers instead of one straggler task.
    *
    * Result set is identical to `fact.join(dim, key)`: every fact row
    * meets every dim row of its key exactly once (the dim replica with
    * the matching salt). Cost: dim shuffle volume × factor — the
    * classic skew trade.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      factor: Int = 16): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(factor.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
