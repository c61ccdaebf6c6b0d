package graft.tools

import graft.core.{Sessions, Tables}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Builder tool: per-JOB wall timing of one warm curation-e2e run — names
  * every driver-blocking action (eager checkpoints, probes, broadcast
  * subqueries) the chain pays, so the trims target real latency. */
object E2eJobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(32, "graft-e2ejobprobe")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var log = List.empty[(Int, Double, Double, String)] // (id, startOff, dur, site)
    @volatile var stages = List.empty[(Int, Double, Double, String)]
    @volatile var epoch = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // the final stage's name carries the action callsite (File.scala:line)
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
        // first graft frame in the callsite stack names the operator
        val frame = si.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("graft.tools"))
          .getOrElse(si.name).trim
        stages ::= ((si.stageId, wall, cpu, frame))
      }
    })
    def run(label: String): Unit = {
      log = Nil
      stages = Nil
      val t0 = System.nanoTime()
      val df = graft.operators.TextOps.curationPipeline(
        Tables.documents(spark, sfDir), Seq("web"))
      val tc = (System.nanoTime() - t0) / 1e9
      df.write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"JOBPROBE $label construct $tc%.2f s action ${total - tc}%.2f s")
      println(f"JOBPROBE $label total $total%.2f s, ${log.size} jobs, ${stages.size} stages")
      // per-callsite rollup: submission-to-completion wall + summed task time
      stages.groupBy(_._4).map { case (name, ss) =>
        (ss.map(_._2).sum, ss.map(_._3).sum, ss.length, name)
      }.toSeq.sortBy(-_._1).take(20).foreach { case (w, c, n, name) =>
        println(f"JOBPROBE   stage $w%6.2f s wall $c%6.2f s task x$n%-3d ${name.take(70)}")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    run("cold")
    val n = sys.env.getOrElse("E2E_REPS", "6").toInt
    val walls = (1 to n).map { i =>
      // clear straggler entries too: an AQE-abandoned side job started in
      // the previous rep would otherwise log a negative offset this rep
      starts.clear()
      log = Nil; stages = Nil
      epoch = System.nanoTime()
      val t0 = System.nanoTime()
      graft.operators.TextOps.curationPipeline(
          Tables.documents(spark, sfDir), Seq("web"))
        .write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      if (i == n) {
        // warm-run job TIMELINE: start offset, duration, gap since the
        // previous job's end (driver-side planning/analysis time), site
        val jobs = log.sortBy(_._2)
        var prevEnd = 0.0
        jobs.foreach { case (id, off, dur, site) =>
          val gap = off - prevEnd
          println(f"JOBPROBE warm job $id%3d @$off%6.2f dur $dur%5.2f gap $gap%5.2f ${site.take(60)}")
          prevEnd = math.max(prevEnd, off + dur)
        }
        println(f"JOBPROBE warm jobsum ${jobs.map(_._3).sum}%.2f wall $w%.2f")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      w
    }
    println(f"JOBPROBE reps ${walls.map(w => f"$w%.2f").mkString(",")} min ${walls.min}%.2f")
    spark.stop()
  }
}
