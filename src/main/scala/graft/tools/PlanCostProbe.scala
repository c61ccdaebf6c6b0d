package graft.tools

import graft.core.Sessions

/** Builder probe: how much of a gate's warm wall time is DRIVER-side plan
  * work (analysis + optimization + physical planning, no job submitted)?
  * Forces `queryExecution.executedPlan` on a fresh DataFrame N times. */
object PlanCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus, "graft-plancost")
    args.foreach { gate =>
      val fn = graft.SparkEntry.queries(gate)
      // warm: one full execution so lazy statics/codegen caches are hot
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val times = (1 to 6).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // analysis+opt+physical, no execution
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val c = times.map(_._1).min; val p = times.map(_._2).min
      println(f"PLANCOST $gate%-28s construct $c%.3f plan $p%.3f " +
        f"(runs ${times.map(t => f"${t._1 + t._2}%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
