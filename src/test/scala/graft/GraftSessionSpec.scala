package graft

/** Pins the session-level engine-stability configs that correctness or
  * performance depend on, so a GraftSession refactor can't silently
  * drop them. */
class GraftSessionSpec extends SparkSpec {

  test("heap-robustness: TaskMemoryManager page size is pinned (HEAPCHECK.md)") {
    // Without this, page size scales with the execution pool (up to
    // 64 MB at a 64g heap) and the dedup family's many-small-consumer
    // stages pay 5.7x task CPU in allocation/zeroing + humongous-region
    // GC (VERDICT r4 item 1, measured in HEAPCHECK.md).
    assert(spark.conf.get("spark.buffer.pageSize") == "4m")
  }

  test("engine-stability configs survive session construction") {
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
  }

  test("reliable-materialize checkpoints are cleaner-managed") {
    // without this, reliable mode's Dataset.checkpoint files outlive
    // every query in the session (nothing deletes them by default)
    assert(spark.conf.get("spark.cleaner.referenceTracking.cleanCheckpoints") == "true")
  }
}
