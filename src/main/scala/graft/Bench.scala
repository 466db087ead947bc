package graft

import scala.jdk.CollectionConverters._

/** Round benchmark: every SparkEntry query timed at SPARK_GRAFT_SF_DIR,
  * one JSON line out.
  *
  * Credibility guard: BENCH_r01 was inflated ~7.4× by stray JVMs left
  * behind by backgrounded builds contending for CPU. Before timing
  * anything, this main samples the CPU use of every other JVM on the
  * machine (excluding its own ancestor chain — the sbt launcher) and
  * reports them in the JSON (`stray_jvms`, `clean_machine`) so a
  * contended run is visible in the artifact instead of silently wrong.
  */
object Bench {

  /** One query's measurements: the count-pruned and force-evaluated
    * wall times, a host-calibration stamp taken right after EACH (so
    * a mid-run host wave is attributable per series), STW GC-pause and
    * process-CPU deltas per series, and the persistent-RDD counts found
    * lingering after EACH series (Materialize.once residue — must be
    * freed between queries, not left to the async ContextCleaner):
    * `residBlocksCount` after the count execution, `residBlocks` after
    * the forced one. */
  final case class BenchRow(sec: Double, calib: Long, calibMt: Long,
    err: Option[String], secForced: Double, calibForced: Long,
    calibMtForced: Long, gcMsCount: Long, gcMsForced: Long,
    cpuMsCount: Long, cpuMsForced: Long, residBlocks: Int,
    residBlocksCount: Int)

  /** (pid, cores-of-CPU) for non-ancestor java processes busier than
    * `minCores` over a ~`sampleMs` window. */
  def strayJvms(sampleMs: Long = 500, minCores: Double = 0.05): Seq[(Long, Double)] = {
    val self = ProcessHandle.current()
    val ancestors = Iterator.iterate(Option(self))(_.flatMap(h =>
      if (h.parent().isPresent) Some(h.parent().get) else None))
      .takeWhile(_.isDefined).flatten.map(_.pid).toSet
    def cpuNs(h: ProcessHandle): Option[(Long, Long)] = {
      val info = h.info()
      val isJava = info.command().map[Boolean](_.contains("java")).orElse(false)
      if (!isJava || ancestors.contains(h.pid)) None
      else if (info.totalCpuDuration().isPresent)
        Some(h.pid -> info.totalCpuDuration().get.toNanos)
      else None
    }
    val t0 = ProcessHandle.allProcesses().iterator().asScala.flatMap(cpuNs).toMap
    Thread.sleep(sampleMs)
    val t1 = ProcessHandle.allProcesses().iterator().asScala.flatMap(cpuNs).toMap
    t1.flatMap { case (pid, ns1) =>
      t0.get(pid).map(ns0 => pid -> (ns1 - ns0).toDouble / (sampleMs * 1e6))
    }.filter(_._2 >= minCores).toSeq.sortBy(-_._2)
  }

  /** Single-thread CPU calibration: FNV-mix iterations per ms. A run
    * whose start/end calibration differs greatly from other runs (or
    * from each other) executed on a degraded/contended host — measured
    * host slowdowns of >10× have occurred with zero stray JVMs, so the
    * probe makes them visible inside the artifact. */
  def calibrate(): Double = {
    def loop(iters: Int): Double = {
      var h = 0x811c9dc5L
      var i = 0
      val t0 = System.nanoTime()
      while (i < iters) { h = (h ^ i) * 0x01000193L; i += 1 }
      val ms = (System.nanoTime() - t0) / 1e6
      if (h == 42) System.err.print("") // keep the loop live
      iters / ms
    }
    loop(1 << 22) // JIT warmup, discarded
    loop(1 << 24)
  }

  /** Multi-core calibration: aggregate iters/ms across `threads`
    * concurrent FNV loops. Catches host oversubscription that a
    * single-thread probe misses (observed: single-thread healthy while
    * 32-core throughput was ~5× down). */
  def calibrateMt(threads: Int = 8): Double = {
    val per = new java.util.concurrent.atomic.AtomicLong(0)
    def worker(): Thread = new Thread(() => {
      var h = 0x811c9dc5L
      var i = 0
      val iters = 1 << 24
      val t0 = System.nanoTime()
      while (i < iters) { h = (h ^ i) * 0x01000193L; i += 1 }
      val ms = (System.nanoTime() - t0) / 1e6
      if (h == 42) System.err.print("")
      per.addAndGet((iters / ms).toLong)
    })
    val ts = Seq.fill(threads)(worker())
    ts.foreach(_.start()); ts.foreach(_.join())
    per.get.toDouble / threads
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val calibStart = calibrate()
    val calibMtStart = calibrateMt()
    val stray = strayJvms()
    if (stray.nonEmpty)
      System.err.println(s"[bench] WARNING: busy JVMs contending for CPU: " +
        stray.map { case (p, c) => f"pid=$p%d ${c}%.2f cores" }.mkString(", "))
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // quick probes (~10ms and ~40ms) after each query: pair every
    // measurement with the host state at that moment, so a wave of host
    // degradation is attributable per query, not just per run. The
    // multi-thread probe matters separately: hosts have been observed
    // with a healthy single-thread probe while aggregate multi-core
    // throughput was down 25%+ — which non-linearly amplifies 32-way
    // stages (stragglers hold stage barriers).
    def quickCalib(): Long = {
      var h = 0x811c9dc5L
      var i = 0
      val iters = 1 << 22
      val t0 = System.nanoTime()
      while (i < iters) { h = (h ^ i) * 0x01000193L; i += 1 }
      val ms = (System.nanoTime() - t0) / 1e6
      if (h == 42) System.err.print("")
      (iters / ms).toLong
    }
    def quickCalibMt(threads: Int = 8): Long = {
      val per = new java.util.concurrent.atomic.AtomicLong(0)
      val ts = Seq.fill(threads)(new Thread(() => {
        var h = 0x811c9dc5L
        var i = 0
        val iters = 1 << 22
        val t0 = System.nanoTime()
        while (i < iters) { h = (h ^ i) * 0x01000193L; i += 1 }
        val ms = (System.nanoTime() - t0) / 1e6
        if (h == 42) System.err.print("")
        per.addAndGet((iters / ms).toLong)
      }))
      ts.foreach(_.start()); ts.foreach(_.join())
      per.get / threads
    }
    // uncounted session warmup: the first measured query otherwise pays
    // the generic engine/JIT start-up (~2s observed on whichever query
    // happens to iterate first — text_quality in the current map order)
    {
      import org.apache.spark.sql.functions._
      spark.range(1 << 20).select((col("id") * 2).as("x"))
        .groupBy(col("x") % 7).agg(sum(col("x"))).count()
      spark.catalog.clearCache(); System.gc()
    }
    // Forced-series input: the testdata tables are SINGLE-FILE,
    // SINGLE-ROW-GROUP parquet, and parquet scans split at row-group
    // granularity — so a narrow-map query's forced (full-plan) timing
    // ran its entire per-row work on ONE core (VERDICT r4 item 4;
    // lowering maxPartitionBytes cannot help with one row group).
    // Re-pack each table once into `cpus` files in tmp (row-identical;
    // write time is outside every timer) and run the forced series
    // against the split copy, making it a true local[N] wall-clock.
    // The count series stays on the original dir for cross-round
    // comparability.
    val splitDir = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      s"/graft-bench-split-$cpus-" +
      java.lang.Integer.toHexString(sfDir.hashCode)
    locally {
      val marker = new java.io.File(splitDir, "_SPLIT_OK")
      if (!marker.exists) {
        graft.sources.Tables.all.foreach { t =>
          spark.read.parquet(s"$sfDir/$t.parquet").repartition(cpus.toInt)
            .write.mode("overwrite").parquet(s"$splitDir/$t.parquet")
        }
        marker.createNewFile()
      }
      spark.catalog.clearCache(); System.gc()
    }
    // STW GC pause ms across all collector beans (concurrent G1 cycles
    // additionally steal CPU invisibly — the cpu_ratio field catches
    // that: measured work / wall below ~cores means starved workers)
    def gcMs(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def procCpuMs(): Long =
      ProcessHandle.current().info().totalCpuDuration()
        .map[Long](_.toMillis).orElse(0L)
    // Residue hygiene between executions. "gc" (historical): drop
    // cached plans and hope the ContextCleaner's weak-ref path frees
    // Materialize.once blocks after System.gc(). "unpersist" (default
    // since round 7): additionally unpersist every leftover persistent
    // RDD DETERMINISTICALLY (blocking) — between queries nothing may
    // legitimately stay persisted, and the async path leaves tens of
    // GB of localCheckpoint block residue alive at big heaps (the
    // BENCH_r04/r05 in-suite forced-series melt: residue keeps G1
    // concurrent cycles scanning a fat old gen DURING measured
    // queries; at 8g eviction pressure hid it).
    val hygiene = sys.env.getOrElse("SPARK_GRAFT_BENCH_HYGIENE", "unpersist")
    def cleanBetween(): Int = {
      spark.catalog.clearCache()
      val leftover = spark.sparkContext.getPersistentRDDs.size
      if (hygiene == "unpersist")
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      System.gc()
      leftover
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    // Per-stage wall/CPU/task attribution for the FORCED series, dumped
    // to bench_stages.json (VERDICT r7: graph_triangles' 9.2s forced
    // wall on 107.6s task CPU could not be adjudicated from the
    // artifact — an occupancy gap needs to name its straggler STAGE).
    // wall = stage submission→completion; a stage whose wall greatly
    // exceeds run/tasks-parallelism has a scheduling/skew problem, and
    // max_task_ms pins within-stage skew specifically.
    val stageTag = new java.util.concurrent.atomic.AtomicReference[String](null)
    val stageRecs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val maxTaskMs = new scala.collection.concurrent.TrieMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null)
          maxTaskMs.updateWith(e.stageId)(o =>
            Some(math.max(o.getOrElse(0L), e.taskInfo.duration)))
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val tag = stageTag.get
        if (tag != null) {
          val si = e.stageInfo
          val wall = (for { s <- si.submissionTime; c <- si.completionTime }
            yield c - s).getOrElse(-1L)
          stageRecs.add(s"""{"query":${jstr(tag)},"stage":${si.stageId},""" +
            s""""name":${jstr(si.name.takeWhile(_ != '\n').take(80))},""" +
            s""""wall_ms":$wall,"cpu_ms":${si.taskMetrics.executorCpuTime / 1000000},""" +
            s""""run_ms":${si.taskMetrics.executorRunTime},"tasks":${si.numTasks},""" +
            s""""max_task_ms":${maxTaskMs.getOrElse(si.stageId, -1L)}}""")
        }
      }
    })
    // a failed query must NOT contribute a meaningless wall time: its
    // timing is dropped and the failure is recorded per query in
    // "errors" (BENCH_r02-class regressions can't hide as fast timings)
    val results = SparkEntry.queries.map { case (name, fn) =>
      val gc0 = gcMs(); val cpu0 = procCpuMs()
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case t: Throwable =>
          Some(s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("").take(200)}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val gcCount = gcMs() - gc0; val cpuCount = procCpuMs() - cpu0
      val calibC = quickCalib(); val calibMtC = quickCalibMt()
      // between the two executions (outside both timers): the count
      // execution's Materialize blocks must not become the forced
      // execution's heap pressure
      val residCount = cleanBetween()
      // SECOND timing with every output column force-evaluated:
      // count() prunes projections, so a narrow-map query's count time
      // is its SCAN time, not its compute time (storm_enrich "0.25s"
      // never ran the enrichment expressions — found in round 4 when
      // the same expressions cost ~2.8s inside storm_dedup's grouping
      // key). toRdd executes the full physical plan per row. The
      // count-based series stays the headline for cross-round
      // comparability; this map is the honest per-row-work number.
      val gc1 = gcMs(); val cpu1 = procCpuMs()
      stageTag.set(name)
      val tf = System.nanoTime()
      val errF = try { fn(spark, splitDir).queryExecution.toRdd.count(); None } catch {
        case t: Throwable =>
          Some(s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("").take(200)}")
      }
      val secForced = (System.nanoTime() - tf) / 1e9
      Thread.sleep(50) // let async stage-completed events land on the tag
      stageTag.set(null)
      val gcForced = gcMs() - gc1; val cpuForced = procCpuMs() - cpu1
      // forced-series calibration stamps (VERDICT r5 #7): the forced
      // timing gets its OWN host probes, so a host wave during the
      // forced execution is attributable from the artifact alone
      val calibF = quickCalib(); val calibMtF = quickCalibMt()
      val resid = cleanBetween()
      name -> BenchRow(sec, calibC, calibMtC, err.orElse(errF), secForced,
        calibF, calibMtF, gcCount, gcForced, cpuCount, cpuForced, resid,
        residCount)
    }
    def qmap(f: BenchRow => Any, rs: Map[String, BenchRow] = results): String =
      rs.map { case (k, v) => jstr(k) + ":" + f(v) }.mkString("{", ",", "}")
    val ok = results.filter(_._2.err.isEmpty)
    val qs = qmap(_.sec, ok)
    val qsForced = qmap(_.secForced, ok)
    val totalForced = if (ok.nonEmpty) ok.values.map(_.secForced).sum else 0.0
    val qCalib = qmap(_.calib)
    val qCalibMt = qmap(_.calibMt)
    val qCalibF = qmap(_.calibForced)
    val qCalibMtF = qmap(_.calibMtForced)
    val qGc = qmap(_.gcMsCount)
    val qGcF = qmap(_.gcMsForced)
    val qCpu = qmap(_.cpuMsCount)
    val qCpuF = qmap(_.cpuMsForced)
    val qResid = qmap(_.residBlocks)
    val qResidCount = qmap(_.residBlocksCount)
    val errs = results.collect { case (k, r) if r.err.isDefined =>
      jstr(k) + ":" + jstr(r.err.get) }.mkString("{", ",", "}")
    val total = if (ok.nonEmpty) ok.values.map(_.sec).sum else 0.0
    val strayJson = stray.map { case (p, c) => s"""{"pid":$p,"cores":$c}""" }
      .mkString("[", ",", "]")
    val calibEnd = calibrate()
    val calibMtEnd = calibrateMt()
    // heap + GC attribution (VERDICT r4 item 2): BENCH_r04's 255.7s was
    // caused by an oversized driver heap (HEAPCHECK.md) and took a judge
    // re-run to attribute because the artifact didn't record -Xmx
    val heapMax = Runtime.getRuntime.maxMemory()
    // r8 VERDICT #4: record the heap DIAL, not just the resulting max,
    // so cross-round artifacts state their heap explicitly (build.sbt
    // forks with -Xmx$SPARK_DRIVER_MEM, default 8g — the committed
    // reference series runs at that default; HEAPCHECK holds the
    // count-parity evidence for enlarged heaps)
    val driverMemEnv = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g(default)")
    val gcNames = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(b => jstr(b.getName)).mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""queries_forced":$qsForced,"value_forced":$totalForced,""" +
      s""""errors":$errs,"n_queries":${results.size},"n_failed":${results.size - ok.size},""" +
      s""""sf":"$sfDir","clean_machine":${stray.isEmpty},"stray_jvms":$strayJson,""" +
      s""""forced_input":"$cpus-file split copy of sf dir (row-identical; single-file scans are one partition)",""" +
      s""""heap_max_bytes":$heapMax,"driver_mem_env":${jstr(driverMemEnv)},"gc_collectors":$gcNames,""" +
      s""""calib_iters_per_ms_start":${calibStart.round},"calib_iters_per_ms_end":${calibEnd.round},""" +
      s""""calib_mt_iters_per_ms_start":${calibMtStart.round},"calib_mt_iters_per_ms_end":${calibMtEnd.round},""" +
      s""""hygiene":${jstr(hygiene)},""" +
      // free-text measurement-context note (SPARK_GRAFT_BENCH_NOTE):
      // e.g. the apples-to-apples host-band statement the r17 verdict
      // asked to carry IN the artifact when the ≥850k calib bar is
      // unreachable in the session's windows
      s""""note":${jstr(sys.env.getOrElse("SPARK_GRAFT_BENCH_NOTE", ""))},""" +
      s""""query_calib":$qCalib,"query_calib_mt":$qCalibMt,""" +
      s""""query_calib_forced":$qCalibF,"query_calib_mt_forced":$qCalibMtF,""" +
      s""""query_gc_ms":$qGc,"query_gc_ms_forced":$qGcF,""" +
      s""""query_cpu_ms":$qCpu,"query_cpu_ms_forced":$qCpuF,""" +
      s""""query_resid_blocks":$qResid,"query_resid_blocks_count":$qResidCount}"""
    println(line)
    // stdout tails get truncated (BENCH_r03.json lost its per-query map
    // exactly that way) — persist the identical line to a file too
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_last.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case t: Throwable => System.err.println(s"[bench] file write failed: $t") }
    // ...and APPEND to a cumulative history so per-round per-query
    // series survive in git without archaeology (r8's map had to be
    // recovered from bench_last.json's git history for the r9 verdict;
    // BENCH_rN.json stdout tails truncate with "parsed": null).
    // Driver-SF runs only: the history documents the round-over-round
    // sf0.1 series, and quick sf0.001 iteration runs were polluting it
    if (sfDir.endsWith("sf0.1"))
      try java.nio.file.Files.write(java.nio.file.Paths.get("bench_history.jsonl"),
        (line + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      catch { case t: Throwable => System.err.println(s"[bench] history write failed: $t") }
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_stages.json"),
      (stageRecs.asScala.mkString("[\n", ",\n", "\n]") + "\n").getBytes("UTF-8"))
    catch { case t: Throwable => System.err.println(s"[bench] stages write failed: $t") }
    // ...and ALSO print a short totals-only line after the big one: a
    // 2000-char stdout tail always captures this, so the driver's
    // artifact carries parseable totals even when the full line's head
    // is truncated (the BENCH_r03/r04 "parsed: null" failure class)
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","value_forced":$totalForced,""" +
      s""""n_queries":${results.size},"n_failed":${results.size - ok.size},""" +
      s""""heap_max_bytes":$heapMax,"driver_mem_env":${jstr(driverMemEnv)},"clean_machine":${stray.isEmpty},"sf":"$sfDir","full_line":"bench_last.json"}""")
    spark.stop()
  }
}
