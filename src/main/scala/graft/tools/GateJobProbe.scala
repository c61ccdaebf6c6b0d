package graft.tools

import graft.core.Sessions
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Builder tool: per-JOB wall timing of any named SparkEntry gate — the
  * generalized [[E2eJobProbe]]. One warm run compiles the plan shapes, then
  * `GATE_REPS` timed runs; the last rep prints the job timeline (driver
  * gaps included) and a per-callsite stage rollup so the time is attributed
  * to operators, not guessed at. Steal jiffies bracket every rep so a
  * contended window is visible in the output.
  *
  * Usage: runMain graft.tools.GateJobProbe <query> [<query2> ...] */
object GateJobProbe {
  def stealJiffies(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().find(_.startsWith("cpu "))
        .map(_.trim.split("\\s+").drop(1).lift(7).map(_.toLong).getOrElse(0L))
        .getOrElse(0L)
      finally src.close()
    } catch { case _: Exception => 0L }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GateJobProbe <query> [<query>...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus, "graft-gatejobprobe")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var log = List.empty[(Int, Double, Double, String)]
    @volatile var stages = List.empty[(Int, Double, Double, String)]
    @volatile var epoch = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.sortBy(_.stageId).lastOption.map(_.name).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          log ::= ((je.jobId, (t0 - epoch) / 1e9, (System.nanoTime() - t0) / 1e9, site))
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for (a <- si.completionTime; b <- si.submissionTime)
          yield (a - b) / 1e3).getOrElse(-1.0)
        val cpu = si.taskMetrics.executorRunTime / 1e3
        val frame = si.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("graft.tools"))
          .getOrElse(si.name).trim
        stages ::= ((si.stageId, wall, cpu, frame))
      }
    })
    val reps = sys.env.getOrElse("GATE_REPS", "6").toInt
    args.foreach { gate =>
      val fn = graft.SparkEntry.queries(gate)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        w
      }
      once() // warm
      val s0 = stealJiffies()
      val walls = (1 to reps).map { i =>
        starts.clear(); log = Nil; stages = Nil
        epoch = System.nanoTime()
        once()
      }
      val stolen = stealJiffies() - s0
      println(f"GATEPROBE $gate reps ${walls.map(w => f"$w%.2f").mkString(",")} " +
        f"min ${walls.min}%.2f steal $stolen")
      val jobs = log.sortBy(_._2)
      var prevEnd = 0.0
      jobs.foreach { case (id, off, dur, site) =>
        val gap = off - prevEnd
        println(f"GATEPROBE   job $id%3d @$off%6.2f dur $dur%5.2f gap $gap%5.2f ${site.take(60)}")
        prevEnd = math.max(prevEnd, off + dur)
      }
      println(f"GATEPROBE   jobsum ${jobs.map(_._3).sum}%.2f jobs ${jobs.size} stages ${stages.size}")
      stages.groupBy(_._4).map { case (name, ss) =>
        (ss.map(_._2).sum, ss.map(_._3).sum, ss.length, name)
      }.toSeq.sortBy(-_._1).take(15).foreach { case (w, c, n, name) =>
        println(f"GATEPROBE   stage $w%6.2f wall $c%6.2f task x$n%-3d ${name.take(70)}")
      }
    }
    spark.stop()
  }
}
