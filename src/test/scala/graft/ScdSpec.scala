package graft

import graft.operators.Scd

class ScdSpec extends SparkSpec {
  import spark.implicits._

  test("scd2 merge: unchanged/changed/deleted/new classified; history untouched") {
    val current = Seq(
      (1L, "A", "2020-01-01", Option("2021-01-01"), false), // closed history
      (1L, "B", "2021-01-01", None: Option[String], true),  // open, unchanged
      (2L, "C", "2020-01-01", None: Option[String], true),  // open, will change
      (3L, "D", "2020-01-01", None: Option[String], true))  // open, deleted
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val snapshot = Seq((1L, "B"), (2L, "C2"), (4L, "E")).toDF("k", "attr")

    val got = Scd.scd2Merge(current, snapshot, Seq("k"), Seq("attr"), "2022-01-01")
      .as[(Long, String, String, Option[String], Boolean)].collect().toSet

    val want = Set(
      (1L, "A", "2020-01-01", Some("2021-01-01"), false),  // passthrough
      (1L, "B", "2021-01-01", None, true),                 // unchanged
      (2L, "C", "2020-01-01", Some("2022-01-01"), false),  // closed (changed)
      (2L, "C2", "2022-01-01", None, true),                // new version
      (3L, "D", "2020-01-01", Some("2022-01-01"), false),  // closed (deleted)
      (4L, "E", "2022-01-01", None, true))                 // new key
    assert(got == want)
  }
}
