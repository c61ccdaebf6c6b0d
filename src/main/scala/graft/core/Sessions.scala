package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Mirrors the reference's fixed-parallelism in-memory session
  * (reference: services/data-cleaning-agent/datagrunt_agent/core/duckdb_session.py:47-48,
  * `duckdb.connect(":memory:", threads=16)`) but Spark-native: AQE on, shuffle
  * partitions sized to local cores (on a real cluster this would be ~2-3x total
  * executor cores; AQE coalesces down at runtime either way).
  */
object Sessions {

  // Hold strong references to recent queries' METRIC ACCUMULATORS: Spark
  // registers them WEAKLY (AccumulatorContext), so when a query's Dataset
  // goes out of scope while an orphaned side job it spawned (an
  // AQE-abandoned broadcast/subquery stage) is still finishing, a GC can
  // collect the metrics and every late task completion then logs an
  // ERROR-level DAGScheduler stack per accumulator ("Failed to update
  // accumulator ... non-existent") — benign, but noise that would mask a
  // real scheduler failure (93 stacks in the r12 full-test log). Pinning
  // keeps the accumulators alive across the straggler window. Deliberately
  // NOT the whole QueryExecution: that would also pin the plan's
  // localCheckpointed RDDs and the ContextCleaner could never drain their
  // storage blocks (measured — ScaleSpec's 25x-repeat leak case fails).
  private val recentMetrics =
    new java.util.concurrent.ConcurrentLinkedDeque[Seq[AnyRef]]()
  private val pinnedSessions = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  private def metricsOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[AnyRef] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val buf = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    def walk(n: org.apache.spark.sql.execution.SparkPlan): Unit = {
      buf ++= n.metrics.values
      n match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => walk(r.child)
        case _ =>
      }
      n.children.foreach(walk)
      n.subqueries.foreach(walk)
    }
    walk(p)
    buf.toSeq
  }

  /** Install the accumulator pin on a session built elsewhere (Bench,
    * Verify): the ERROR-spam class lives wherever long query streams run,
    * not only under tests. Idempotent per session. */
  def instrument(spark: SparkSession): Unit = pinExecutions(spark)

  private def pinExecutions(spark: SparkSession): Unit =
    pinnedSessions.synchronized {
      if (pinnedSessions.add(spark))
        spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
          private def keep(qe: org.apache.spark.sql.execution.QueryExecution): Unit = {
            val ms = scala.util.Try(metricsOf(qe.executedPlan)).getOrElse(Seq.empty)
            recentMetrics.addLast(ms)
            while (recentMetrics.size > 256) recentMetrics.pollFirst()
          }
          override def onSuccess(fn: String,
              qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit = keep(qe)
          override def onFailure(fn: String,
              qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = keep(qe)
        })
    }

  /** Local session for tests and ad-hoc runs. */
  def local(cores: Int = 4, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // interrupt tasks of CANCELLED jobs (unneeded broadcast stages, take/
      // isEmpty leftovers) instead of letting them run to completion: a
      // straggler that completes after its query's metric accumulators are
      // GC'd makes the DAGScheduler log an ERROR stack per accumulator
      // ("Failed to update accumulator ... non-existent") — benign, but
      // ERROR-level noise that would mask a real scheduler failure. Killed
      // tasks never report accumulators, so the noise class is closed.
      .config("spark.sql.execution.interruptOnCancel", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    pinExecutions(spark)
    spark
  }

  /** Builder pre-configured for a real cluster run of this library — the
    * settings that matter at 100 TB, applied on top of whatever master /
    * resource configuration the deployment supplies:
    *
    *  - graft's native expressions registered via the extensions mechanism
    *    (SQL users get graft_dot/graft_phash/graft_minhash/... without code);
    *  - AQE on with skew-join splitting (fact-fact joins self-correct when a
    *    key runs hot; [[graft.operators.Scale]] covers aggregation skew);
    *  - shuffle partitions sized ~2-3x total executor cores — AQE coalesces
    *    down, it cannot split a too-coarse shuffle up;
    *  - 128 MiB scan partitions (one parquet row-group-ish per task) and
    *    a 64 MiB broadcast ceiling for star-schema dimension joins.
    */
  def clusterBuilder(totalExecutorCores: Int): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", (totalExecutorCores * 3).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
      // a long-lived session running this library's whole query surface
      // churns far more than the default 100 generated-class cache entries;
      // eviction silently re-compiles hot plans every execution
      .config("spark.sql.codegen.cache.maxEntries", "5000")
}
