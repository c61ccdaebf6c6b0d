package graft.tools

import graft.core.Sessions

/** Builder tool: write each named query's `.explain("formatted")` output to
  * `plans/<round>/<query>_<suffix>.txt` — the committed before/after plan
  * evidence the optimization rounds are judged on.
  *
  * Usage: runMain graft.tools.PlanDump <round> <suffix> <query...|all>
  * (SPARK_GRAFT_SF_DIR selects the data dir, default sf0.1 like Bench). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <round> <suffix> <query...|all>")
    val (round, suffix) = (args(0), args(1))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args(2) == "all") graft.SparkEntry.queries.keySet.toSeq.sorted
      else args.drop(2).toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-plandump")
    val dir = java.nio.file.Paths.get(s"plans/$round")
    java.nio.file.Files.createDirectories(dir)
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      // queryExecution.explainString is what explain("formatted") prints
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(dir.resolve(s"${n}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote plans/$round/${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
