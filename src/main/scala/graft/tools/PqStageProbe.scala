package graft.operators

import graft.core.{Sessions, Tables}
import graft.plans.GraftFunctions
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Builder tool: job-level timing census of the pq/sq8 queries. */
object PqStageProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local(32, "graft-pqstage")
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf)

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse("?").take(60)))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(je.jobId, (0L, "?"))
        lines.add(f"  job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.3f s  $desc")
      }
    })
    def time[T](label: String)(f: => T): T = {
      lines.clear()
      val t0 = System.nanoTime(); val r = f
      println(f"PQSTAGE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      Thread.sleep(200)
      lines.forEach(println(_))
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    for (round <- 1 to 3) {
      time(s"r$round pq_full") { noop(Similarity.pqAnnTopK(emb, 20, 10)) }
      clear()
      time(s"r$round sq8_full") { noop(Similarity.sq8AnnTopK(emb, 20, 10)) }
      clear()
    }
    spark.stop()
  }
}
