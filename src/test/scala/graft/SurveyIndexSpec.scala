package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2b is the generated key index the judge/driver audit the
  * correctness gate against (tools/gen_survey_index.py). This spec is
  * the anti-drift bolt: the committed table's key set must equal
  * `SparkEntry.queries.keySet` exactly, and every key must have an
  * oracleSql entry — so adding a query without regenerating the index
  * (or documenting a key that no longer exists) fails the build. */
class SurveyIndexSpec extends AnyFunSuite {

  private def indexedKeys: Set[String] = {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val marker = "### §2b Generated key index"
    assert(survey.contains(marker), "SURVEY.md lost its §2b generated index")
    val section = survey.substring(survey.indexOf(marker))
    // end-of-file fallback mirrors gen_survey_index.py: §2b may be the
    // last section of the file (ADVICE r17)
    val nextHeading = section.indexOf("\n## ")
    val body = if (nextHeading < 0) section else section.substring(0, nextHeading)
    "\\| `([a-z0-9_]+)` \\|".r.findAllMatchIn(body).map(_.group(1)).toSet
  }

  test("§2b index == SparkEntry.queries, and every key has an oracle") {
    val idx = indexedKeys
    val keys = SparkEntry.queries.keySet
    assert(idx == keys,
      s"SURVEY §2b drifted: missing=${(keys -- idx).toSeq.sorted} " +
        s"stale=${(idx -- keys).toSeq.sorted} " +
        "(regenerate: python3 tools/gen_survey_index.py <verify-out>)")
    val noOracle = keys -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without an oracleSql entry: ${noOracle.toSeq.sorted}")
  }
}
