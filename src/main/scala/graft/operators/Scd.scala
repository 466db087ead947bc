package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 merge: maintain full attribute
  * history for a dimension table as snapshots arrive — the lakehouse
  * companion of the partitioned sink's merge-by-id (which is SCD1:
  * overwrite-in-place semantics).
  *
  * One full-outer join on the key classifies every row:
  *  - unchanged  → current row passes through;
  *  - changed    → current version closes (valid_to = effective date,
  *    is_current = false) AND a new open version inserts;
  *  - new key    → open version inserts;
  *  - deleted    → current version closes (tombstone-free delete
  *    tracking: history keeps the last attributes).
  *
  * Scale shape: dimensions are small next to facts, but at 10⁹-row
  * dimensions this is still a single keyed shuffle join (both sides
  * hash-partition on the key) plus a narrow row-expansion for the
  * changed class — no window, no global sort, no driver state.
  */
object Scd {

  /** `current` must carry (key..., attrs..., valid_from, valid_to,
    * is_current); `snapshot` carries (key..., attrs...). Only
    * `is_current = true` rows participate — closed history passes
    * through untouched. Preconditions: at most ONE open row per key
    * (an SCD2 invariant the writer maintains — duplicates would fan
    * out through the join) and at most one snapshot row per key. */
  def scd2Merge(current: DataFrame, snapshot: DataFrame, keys: Seq[String],
      attrs: Seq[String], effectiveDate: String): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty, "scd2Merge needs keys and attrs")
    val history = current.where(!col("is_current"))
    val open = current.where(col("is_current"))
    val snap = snapshot.select(
      keys.map(k => col(k).as(s"s_$k")) ++ attrs.map(a => col(a).as(s"s_$a")): _*)
    val joinCond = keys.map(k => col(k) === col(s"s_$k")).reduce(_ && _)
    // The classified join feeds THREE branches (unchanged/closed/
    // opened); exchange reuse does not fire across union branches, so
    // an un-materialized join would execute three times (verified by a
    // scans-per-plan audit). Materialization is EAGER — the join
    // executes at call time, before any action on the result — and in
    // the default local mode has no lineage fallback on executor loss;
    // dimension-sized data makes that cheap, and at extreme dimension
    // cardinality (or on clusters with churn) set
    // spark.graft.materialize=reliable on the session (Materialize).
    // Streaming inputs are not supported (checkpoint throws).
    val j = graft.Materialize.once(open.join(snap, joinCond, "full_outer"))
    val inSnap = col(s"s_${keys.head}").isNotNull
    val inCur = col(keys.head).isNotNull
    val changed = attrs.map(a => !(col(a) <=> col(s"s_$a"))).reduce(_ || _)

    val unchanged = j.where(inCur && inSnap && !changed)
      .select(current.columns.map(col): _*)
    val closed = j.where(inCur && (!inSnap || changed))
      .select(keys.map(col) ++ attrs.map(col) ++ Seq(
        col("valid_from"), lit(effectiveDate).as("valid_to"),
        lit(false).as("is_current")): _*)
    val opened = j.where(inSnap && (!inCur || changed))
      .select(keys.map(k => col(s"s_$k").as(k)) ++
        attrs.map(a => col(s"s_$a").as(a)) ++ Seq(
        lit(effectiveDate).as("valid_from"),
        lit(null).cast("string").as("valid_to"),
        lit(true).as("is_current")): _*)
    history.unionByName(unchanged).unionByName(closed).unionByName(opened)
  }
}
