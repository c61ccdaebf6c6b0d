package graft.tools

import graft.core.Sessions

/** Builder tool: enumerate every Window node in every gate plan with its
  * windowspecdefinition partition signature — the raw data behind the
  * PlanSpec window-inventory pin. */
object WindowInventory {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Sessions.local(8, "graft-wininv")
    val nodeRe = "(?m)^[\\s:+\\-*()0-9]*(Window(?:GroupLimit)?)\\s".r
    val specRe = "windowspecdefinition\\(([^)]*?)(?:, \\w+#\\d+[A-Za-z]* (?:ASC|DESC))".r
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        val nodes = nodeRe.findAllIn(p).size
        if (nodes > 0) {
          val specs = specRe.findAllMatchIn(p).map(_.group(1)).toSeq.distinct
          println(s"WININV $name nodes=$nodes parts=${specs.mkString(" | ")}")
        }
      } catch {
        case e: Throwable => println(s"WININV $name ERROR ${e.getMessage}")
      } finally {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      }
    }
    spark.stop()
  }
}
