package graft.tools

import graft.core.Sessions

/** Builder tool: repeated timing of selected queries in one JVM. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(16, "graft-qprobe")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("gold_q1_pricing_summary", "events_json_props")
    (1 to 3).foreach { round =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"QPROBE r$round $n%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
