package graft

import org.scalatest.funsuite.AnyFunSuite

/** PLANCHECK.json is the mechanical plan gate over all oracle keys
  * (graft.PlanCheck, regenerated per round — the gen_survey_index
  * discipline). This spec is its anti-drift bolt:
  *
  *  - the artifact's key set must equal `SparkEntry.queries.keySet`
  *    (adding a query without re-running PlanCheck fails the build);
  *  - ZERO cartesian products anywhere;
  *  - every broadcast-nested-loop flag must be in
  *    [[PlanCheck.sanctioned]] with a reason, and every sanctioned
  *    entry must still flag (stale allowlist rows fail too);
  *  - at most ONE global sort per key — the trailing
  *    output-determinism orderBy; interior global sorts (a
  *    corpus-sized range shuffle hiding mid-plan) are zero;
  *  - the per-key parquet-scan budget (≤ 6, PlanSpec's
  *    multi-consumer-recompute guard) holds for ALL keys, not just
  *    the hand-picked ones PlanSpec tests.
  */
class PlanCheckSpec extends AnyFunSuite {

  private case class Row(shuffles: Int, cartesian: Boolean, bnlj: Boolean,
      globalSorts: Int, parquetScans: Int)

  private lazy val rows: Map[String, Row] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("PLANCHECK.json")), "UTF-8")
    val re = ("\"([a-z0-9_]+)\": \\{\"shuffles\":(\\d+),\"broadcasts\":\\d+," +
      "\"cartesian\":(true|false),\"bnlj\":(true|false)," +
      "\"global_sorts\":(\\d+),\"parquet_scans\":(\\d+)").r
    re.findAllMatchIn(text).map { m =>
      m.group(1) -> Row(m.group(2).toInt, m.group(3).toBoolean,
        m.group(4).toBoolean, m.group(5).toInt, m.group(6).toInt)
    }.toMap
  }

  test("PLANCHECK covers exactly the oracle keys") {
    val keys = SparkEntry.queries.keySet
    assert(rows.keySet == keys,
      s"PLANCHECK.json drifted: missing=${(keys -- rows.keySet).toSeq.sorted} " +
        s"stale=${(rows.keySet -- keys).toSeq.sorted} " +
        "(regenerate: sbt \"runMain graft.PlanCheck /root/testdata/sf0.001\")")
  }

  test("zero cartesian products") {
    val cart = rows.collect { case (k, r) if r.cartesian => k }
    assert(cart.isEmpty, s"cartesian products in: ${cart.toSeq.sorted}")
  }

  test("every nested-loop join is sanctioned, every sanction still flags") {
    val flagged = rows.collect { case (k, r) if r.bnlj => k }.toSet
    val unsanctioned = flagged -- PlanCheck.sanctioned.keySet
    assert(unsanctioned.isEmpty,
      s"UNEXPLAINED BroadcastNestedLoopJoin in: ${unsanctioned.toSeq.sorted} " +
        "(add to PlanCheck.sanctioned with the bounded-side reason, or fix the plan)")
    val stale = PlanCheck.sanctioned.keySet -- flagged
    assert(stale.isEmpty,
      s"stale sanctioned entries (no longer flag): ${stale.toSeq.sorted}")
  }

  test("at most one global sort per key (the output orderBy); zero interior") {
    val multi = rows.collect { case (k, r) if r.globalSorts > 1 => k }
    assert(multi.isEmpty,
      s"interior global sorts (range shuffle mid-plan) in: ${multi.toSeq.sorted}")
  }

  test("parquet-scan budget <= 6 for every key") {
    val over = rows.collect { case (k, r) if r.parquetScans > 6 => (k, r.parquetScans) }
    assert(over.isEmpty,
      s"scan budget exceeded (multi-consumer recompute?): ${over.toSeq.sorted}")
  }
}
