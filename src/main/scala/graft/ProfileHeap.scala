package graft

import java.lang.management.ManagementFactory
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev diagnostic for the large-heap dedup pathology (VERDICT r4 #1):
  * runs the named queries while a SparkListener accumulates per-stage
  * executor run time, JVM GC time, spill bytes and peak execution
  * memory, plus process-level GC bean deltas per query. Compare the
  * dumps from `SPARK_DRIVER_MEM=8g` vs `64g` to see where the extra
  * wall-clock goes (GC vs bigger unspilled hash/sort state).
  */
object ProfileHeap {
  final case class Acc(var runMs: Long = 0, var gcMs: Long = 0,
      var spillMem: Long = 0, var spillDisk: Long = 0,
      var peakExec: Long = 0, var tasks: Long = 0, var cpuMs: Long = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // GRAFT_FORCED=1 reproduces the BENCH forced series (full-plan
    // toRdd over the cpus-file split copy) instead of count() — the
    // text_containment heap inflation (HEAPCHECK round 8) only
    // appears there, so the diagnostic must run the same shape.
    val forced = sys.env.get("GRAFT_FORCED").contains("1")
    val reps = sys.env.get("GRAFT_REPS").map(_.toInt).getOrElse(1)
    val names = if (args.nonEmpty) args.toSeq
      else Seq("dedup_jaccard", "dedup_cluster", "corpus_clean")
    // cpus, session AND the forced split-dir name all derive from the
    // SAME env Bench uses — a hardcoded 32 here built a 32-file copy
    // that did not match the bench forced-input shape on any other
    // host, silently profiling a different scan parallelism
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val inDir = if (!forced) sfDir else {
      val d = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
        s"/graft-bench-split-$cpus-" + java.lang.Integer.toHexString(sfDir.hashCode)
      if (!new java.io.File(d, "_SPLIT_OK").exists) {
        graft.sources.Tables.all.foreach { t =>
          spark.read.parquet(s"$sfDir/$t.parquet").repartition(cpus.toInt)
            .write.mode("overwrite").parquet(s"$d/$t.parquet")
        }
        new java.io.File(d, "_SPLIT_OK").createNewFile()
      }
      d
    }
    println(s"[heap] maxMemory=${Runtime.getRuntime.maxMemory() / (1 << 20)} MB " +
      s"gc=${ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getName).mkString("/")}")

    val stages = new ConcurrentHashMap[Int, Acc]()
    @volatile var collecting = false
    val acc = new Acc()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val m = sc.stageInfo.taskMetrics
          acc.synchronized {
            acc.runMs += m.executorRunTime
            acc.cpuMs += m.executorCpuTime / 1000000
            acc.gcMs += m.jvmGCTime
            acc.spillMem += m.memoryBytesSpilled
            acc.spillDisk += m.diskBytesSpilled
            acc.peakExec = math.max(acc.peakExec, m.peakExecutionMemory)
            acc.tasks += sc.stageInfo.numTasks
          }
        }
    })
    def gcSnapshot(): (Long, Long) = {
      val beans = ManagementFactory.getGarbageCollectorMXBeans.asScala
      (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
    }
    names.flatMap(n => Seq.fill(reps)(n)).foreach { name =>
      acc.synchronized { acc.runMs = 0; acc.cpuMs = 0; acc.gcMs = 0
        acc.spillMem = 0; acc.spillDisk = 0; acc.peakExec = 0; acc.tasks = 0 }
      val (gcC0, gcT0) = gcSnapshot()
      collecting = true
      val t0 = System.nanoTime()
      val n =
        if (forced) SparkEntry.queries(name)(spark, inDir).queryExecution.toRdd.count()
        else SparkEntry.queries(name)(spark, inDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      collecting = false
      Thread.sleep(300) // let the listener bus drain stage-completed events
      val (gcC1, gcT1) = gcSnapshot()
      println(f"[heapprof] $name%-16s rows=$n%-7d wall=$wall%6.2fs " +
        f"taskRun=${acc.runMs / 1000.0}%8.1fs taskCpu=${acc.cpuMs / 1000.0}%8.1fs " +
        f"taskGc=${acc.gcMs / 1000.0}%6.1fs procGc=${(gcT1 - gcT0) / 1000.0}%6.1fs " +
        f"gcN=${gcC1 - gcC0}%-5d spillMem=${acc.spillMem / (1 << 20)}%dMB " +
        f"spillDisk=${acc.spillDisk / (1 << 20)}%dMB peakExec=${acc.peakExec / (1 << 20)}%dMB " +
        f"tasks=${acc.tasks}%d")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
