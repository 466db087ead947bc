package graft

/** Standalone host-calibration probe: prints the same single-thread
  * and multi-thread FNV iters/ms stamps Bench embeds in its JSON
  * (healthy host ≈ 900k single-thread), without running any queries —
  * for deciding whether a bench run is attributable before paying for
  * it. */
object Calib {
  def main(args: Array[String]): Unit = {
    val st = Bench.calibrate()
    val mt = Bench.calibrateMt()
    println(f"[calib] single_thread=${st}%.0f iters_per_ms multi_thread_avg=${mt}%.0f")
  }
}
