package graft

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Scratch A/B profiler for the PPJoin positional filter: candidate
  * count + wall + summed task CPU of jaccardPairs' candidate stage and
  * the full verified join, with the positional bound on vs off, in one
  * JVM (cross-run comparisons are host-wave-noisy). */
object ProfilePpjoin {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpu = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) cpu.add(e.taskMetrics.executorCpuTime)
    })
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm the scan
    def t(name: String)(f: => Long): Unit = {
      cpu.reset()
      val t0 = System.nanoTime()
      val n = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let task-end events drain
      println(f"[ppjoin] $name rows=$n wall=$wall%.2f s taskCpu=${cpu.sum / 1e9}%.1f s")
    }
    for (i <- 1 to 2) {
      t(s"cand_prefixOnly_$i")(graft.operators.Dedup
        .jaccardCandidates(docs, k = 3, threshold = 0.5, positional = false).count())
      t(s"cand_positional_$i")(graft.operators.Dedup
        .jaccardCandidates(docs, k = 3, threshold = 0.5, positional = true).count())
      t(s"pairs_full_$i")(graft.operators.Dedup
        .jaccardPairs(docs, k = 3, threshold = 0.5).count())
    }
    for (i <- 1 to 2) {
      t(s"contain_cand_prefixOnly_$i")(graft.operators.Dedup
        .containmentCandidates(docs, k = 3, threshold = 0.6, positional = false).count())
      t(s"contain_cand_positional_$i")(graft.operators.Dedup
        .containmentCandidates(docs, k = 3, threshold = 0.6, positional = true).count())
      t(s"contain_pairs_full_$i")(graft.operators.Dedup
        .containmentPairs(docs, k = 3, threshold = 0.6).count())
    }
    spark.stop()
  }
}
