package graft

import org.apache.spark.sql.functions._

/** Round-18 optimization scratch profiler: stage-level timings for the
  * bench's heaviest families (pretrain pipeline, dedup_overlap's four
  * methods, BPE trainer) in ONE warm JVM at sf0.1 — the suite-like
  * measurement shape. Each probe is labeled for the UI and prints
  * wall + the process-CPU delta so host waves are attributable. */
object ProfileR18 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def procCpuMs(): Long =
      ProcessHandle.current().info().totalCpuDuration()
        .map[Long](_.toMillis).orElse(0L)
    def t(name: String)(f: => Long): Unit = {
      spark.sparkContext.setJobDescription(name)
      val c0 = procCpuMs(); val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      val cpu = (procCpuMs() - c0) / 1000.0
      println(f"[p18] $name%-36s ${sec}%7.2f s  cpu=${cpu}%7.1f s  rows=$n")
      spark.catalog.clearCache()
      System.gc()
    }
    // warmup
    spark.range(1 << 20).select((col("id") * 2).as("x"))
      .groupBy(col("x") % 7).agg(sum(col("x"))).count()

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"))
    val docsT = docs.select(col("doc_id"), col("text"))
    import graft.operators._

    val which = if (args.nonEmpty) args.toSet else Set("overlap", "pretrain", "bpe")

    if (which.exists(_.startsWith("q:"))) {
      // per-stage attribution for one query: q:<name>
      val recs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Int, String)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val wall = (for { s <- si.submissionTime; c <- si.completionTime }
            yield c - s).getOrElse(-1L)
          recs.add((si.stageId, wall, si.taskMetrics.executorCpuTime / 1000000,
            si.numTasks, si.name.takeWhile(_ != '\n').take(90)))
        }
      })
      which.filter(_.startsWith("q:")).map(_.drop(2)).foreach { name =>
        t(s"q:$name")(SparkEntry.queries(name)(spark, sfDir).count())
      }
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      recs.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (id, w, c, n, nm) =>
        println(f"[p18s] st$id%5d wall=${w / 1000.0}%6.2f cpu=${c / 1000.0}%6.2f tasks=$n%3d $nm")
      }
      spark.stop(); return
    }

    if (which("overlap")) {
      val src = docsT.unionAll(docsT.where(col("doc_id") <= 25)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      t("ov:exact fingerprint groups")(
        src.select(col("doc_id"), graft.functions.Text.fingerprint(col("text")).as("fp"))
          .groupBy(col("fp")).agg(count(lit(1))).count())
      t("ov:minhashPairs")(Materialize.scoped {
        Dedup.minhashPairs(src, k = 3, bands = 8, rowsPerBand = 4, threshold = 0.2).count() })
      t("ov:simhashPairs")(Materialize.scoped {
        Dedup.simhashPairs(src, maxHamming = 3).count() })
      t("ov:jaccardPairs")(Materialize.scoped {
        Dedup.jaccardPairs(src, k = 3, threshold = 0.5).count() })
    }

    if (which("pretrain")) {
      t("pt:prepText (stages 1-4)")(Materialize.scoped {
        Pretrain.prepText(docsT).count() })
      val pared = Materialize.once(Pretrain.prepText(docsT))
      t("pt:jaccardPairs(pared)")(Materialize.scoped {
        Dedup.jaccardPairs(pared, k = 3, threshold = 0.5).count() })
      t("pt:clusters(pairs)")(Materialize.scoped {
        Dedup.clusters(Dedup.jaccardPairs(pared, k = 3, threshold = 0.5)).count() })
      val clu = Materialize.once(
        Dedup.clusters(Dedup.jaccardPairs(pared, k = 3, threshold = 0.5)))
      val canon = Materialize.once(
        pared.join(clu, Seq("doc_id"), "left")
          .where(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
          .select(col("doc_id"), col("text")))
      t("pt:Classify.scores(canon)")(Materialize.scoped {
        Classify.scores(canon).count() })
      val scored = Materialize.once(Classify.scores(canon)
        .select(col("doc_id"), col("score")))
      val gated = Sampling.topFraction(scored, col("score"), col("doc_id"),
        num = 3L, den = 10L, salt = "pretrain").join(canon, Seq("doc_id"))
      val bench = docsT.where(col("doc_id") % 20 === 7)
      t("pt:Decontaminate.clean(gated)")(Materialize.scoped {
        Decontaminate.clean(gated, bench, k = 8).count() })
      val kept = Materialize.once(Decontaminate.clean(gated, bench, k = 8))
      val langd = Materialize.once(
        kept.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
          .withColumn("n_chars", length(col("text")).cast("long")))
      t("pt:temperatureSample")(Materialize.scoped {
        Sampling.temperatureSample(langd, col("doc_id"), col("lang"),
          col("n_chars"), tau = 2.0, budgetFrac = 0.5).count() })
    }

    if (which("bpe")) {
      t("bpe:bpeSegmentsOf(8 rounds)")(Materialize.scoped {
        PipelineQueries.bpeSegmentsOf(docsT, 8).count() })
      t("bpe:examples(chunk+pack only)")(Materialize.scoped {
        Pretrain.examples(docs, docsT.where(col("doc_id") % 20 === 7)).count() })
    }

    spark.stop()
  }
}
