package graft

import org.apache.spark.sql.DataFrame

/** Single policy point for materializing a multi-consumer subtree
  * exactly once.
  *
  * Why materialize at all: exchange reuse does NOT fire across
  * union/join consumer branches, so a DataFrame referenced k times
  * re-executes its whole subtree k times (measured: graph_triangles 3×,
  * text_tfidf 8 parquet scans, dedup_semantic 12 — see SURVEY §5).
  * Every shared subtree in the library funnels through [[once]], and
  * PlanSpec's scan-budget test guards the class.
  *
  * Why a policy point: `localCheckpoint` stores blocks executor-locally
  * with NO lineage fallback — correct and fastest on a single machine,
  * but at 1000 executors the loss of any one executor kills the query
  * mid-flight (executor churn is routine at that scale). Cluster
  * deployments set `spark.graft.materialize=reliable` on the session and
  * every operator switches to `Dataset.checkpoint()` into a replicated
  * checkpoint directory (`spark.graft.checkpointDir`, e.g. an HDFS/S3
  * path) — same eager semantics, same lineage truncation, survives
  * executor loss.
  *
  * Both modes are EAGER: the subtree executes at call time (queries
  * that build on the result would execute it anyway; eagerness is what
  * lets iterative callers free the previous round deterministically).
  * Neither mode accepts streaming inputs — materialization of a shared
  * subtree is a batch concept; streaming pipelines restructure around
  * foreachBatch instead (CorpusStream does).
  */
object Materialize {
  /** Session conf: `local` (default, executor-local blocks) or
    * `reliable` (replicated checkpoint dir, executor-loss-safe). */
  val ModeKey = "spark.graft.materialize"

  private val tracker =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[DataFrame]]

  /** Run `body` collecting EVERY frame [[once]] materializes on this
    * thread — including frames operators materialize internally and
    * never hand back (incrementalClusters' batch, the lake probe's
    * freshSets/freshPrefix, clusters()' final labels) — and return
    * them alongside the result for the caller to [[free]] when it
    * chooses. Callers that simply want everything freed at the scope
    * boundary (every streaming micro-batch) use [[scoped]] instead.
    * Freeing a frame an operator already freed is a no-op (unpersist
    * is idempotent). Scopes nest: an inner scope ALSO reports its
    * frames to the enclosing scope — success or failure — so an outer
    * boundary frees everything even if a nested helper opened its own
    * scope and threw. Thread-local, so safe under concurrent streams
    * (each foreachBatch body runs on its own thread). */
  def tracking[A](body: => A): (A, Seq[DataFrame]) = {
    val buf = new scala.collection.mutable.ArrayBuffer[DataFrame]
    val prev = tracker.get()
    tracker.set(buf)
    try (body, buf.toSeq)
    finally {
      // propagate in the finally, not the success path: frames an
      // inner scope materialized before `body` threw must still reach
      // the enclosing scope, or the outer micro-batch boundary would
      // free everything EXCEPT exactly the frames of failed batches —
      // the ones a retry loop re-creates every attempt.
      if (prev != null) prev ++= buf
      tracker.set(prev)
    }
  }

  /** Run `body` as a self-contained materialization scope: every frame
    * [[once]] materializes inside is freed when the scope exits —
    * success OR failure (a failed micro-batch's intermediates are dead
    * either way, and the source replays the batch, so freeing them is
    * what keeps a retry loop from stranding one frame set per
    * attempt). THE per-micro-batch boundary: each foreachBatch body in
    * CorpusStream wraps its operator composition + sink write in this,
    * so operators may materialize internal multi-consumer subtrees
    * (the lake probe's freshSets/freshPrefix, incrementalClusters'
    * batch, clusters()' final labels) without per-call-site free
    * bookkeeping, and block-manager residue across a 24/7 stream stays
    * ZERO-growth (CorpusStreamSpec pins it across ≥3 micro-batches).
    * Nothing materialized inside may escape the scope un-consumed —
    * the body must finish its terminal action (the sink write) before
    * returning. Frames the body already freed are re-freed harmlessly
    * (unpersist is idempotent); frames are NOT reported to an
    * enclosing [[tracking]] scope (this scope owns and frees them). */
  def scoped[A](body: => A): A = {
    val buf = new scala.collection.mutable.ArrayBuffer[DataFrame]
    val prev = tracker.get()
    tracker.set(buf)
    try body
    finally {
      tracker.set(prev)
      buf.foreach(free)
    }
  }
  /** Session conf: directory for `reliable` mode. Defaults to a
    * tmp-dir path — fine for tests; production sets a replicated
    * filesystem path. */
  val DirKey = "spark.graft.checkpointDir"

  def mode(df: DataFrame): String =
    df.sparkSession.conf.get(ModeKey, "local")

  /** Materialize `df` once, per the session's configured policy.
    *
    * The result passes through [[org.apache.spark.sql.GraftStatsBridge
    * .clampStats]]: checkpointing truncates lineage but INHERITS the
    * source plan's statistics, and in an iterative operator (clusters,
    * pagerank) round r's inherited sizeInBytes is a polynomial of
    * round r−1's — repeated squaring that makes per-round ANALYSIS
    * cost grow exponentially and finally overflows Catalyst's BigInt
    * stats on long-diameter graphs (found live: the √n-cell
    * mutual-kNN clusters probe; see GraftStatsBridge's scaladoc).
    * Stats below the 2⁶⁰ cap are untouched, so small materialized
    * frames keep exact sizes and auto-broadcast exactly as before. */
  def once(df: DataFrame): DataFrame = {
    // attribute the checkpoint job to the OPERATOR call site, not this
    // file: every materialization otherwise shows up in the UI and the
    // bench_stages artifact as "localCheckpoint at Materialize.scala",
    // which made the r18-opt straggler hunt re-derive callers by hand
    val caller = new Throwable().getStackTrace
      .find(f => !f.getClassName.startsWith("graft.Materialize") &&
        !f.getClassName.startsWith("java."))
      .map(f => s"Materialize.once at ${f.getFileName}:${f.getLineNumber}")
      .getOrElse("Materialize.once")
    val sc = df.sparkSession.sparkContext
    sc.setCallSite(caller)
    try onceInner(df)
    finally sc.clearCallSite()
  }

  private def onceInner(df: DataFrame): DataFrame = {
    val out = mode(df) match {
      case "local" =>
        org.apache.spark.sql.GraftStatsBridge.clampStats(df.localCheckpoint())
      case "reliable" =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          val dir = df.sparkSession.conf.get(DirKey,
            sys.props.getOrElse("java.io.tmpdir", "/tmp") +
              s"/graft-checkpoints-${sc.applicationId}")
          sc.setCheckpointDir(dir)
        }
        org.apache.spark.sql.GraftStatsBridge.clampStats(df.checkpoint())
      case other =>
        throw new IllegalArgumentException(
          s"$ModeKey must be 'local' or 'reliable', got '$other'")
    }
    val t = tracker.get()
    if (t != null) t += out
    out
  }

  /** Free the executor-local blocks of a [[once]]-materialized frame
    * the moment a successor is materialized — iterative operators
    * (Dedup.clusters) otherwise pile up per-round blocks in the block
    * manager for the lifetime of the session (measured: the same
    * composite query 5.9s early in a 51-query JVM, 54s late). A no-op
    * for `reliable` mode: checkpoint files are on disk, not in
    * execution-adjacent memory, and are reclaimed with the context. */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
