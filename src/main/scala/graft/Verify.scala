package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: restrict the dump to these query names
    // (local iteration; the driver always passes exactly two args)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A query that fails to plan/execute must stay VISIBLE in the round
    // artifacts: its output dir is simply absent, which a correctness
    // harness keyed on present outputs can mis-read as a smaller-but-
    // fully-green suite (that is exactly how 27 analysis failures hid in
    // round 6). Record every failure in _verify_errors.json beside the
    // outputs and exit non-zero so nothing downstream can call the run
    // clean.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        times(name) = (System.nanoTime() - t0) / 1e9
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/_verify_errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    // per-key dump wall-clock (construction + write, cold, in suite
    // order) — the timing side of an off-SF evidence run (sf1); NOT
    // comparable to Bench's warm count-series numbers
    Files.writeString(Paths.get(s"$outDir/_verify_times.json"),
      times.map { case (k, v) => s"${q(k)}: ${"%.3f".format(v)}" }
        .mkString("{", ",", "}"))
    val expected = SparkEntry.queries.keys
      .filter(n => only.isEmpty || only(n)).size
    println(s"[verify] ${expected - errors.size}/$expected queries dumped, " +
      s"${errors.size} failed")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
