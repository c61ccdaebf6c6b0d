package graft.tools

import graft.core.{Sessions, Tables}
import graft.operators.{Retrieval, Similarity, TextOps}
import org.apache.spark.sql.functions._

/** Builder tool: leg-by-leg timing of the served hybrid RRF gate. */
object RrfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(32, "graft-rrfprobe")
    def t(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"RRFPROBE $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    (1 to 3).foreach { round =>
      println(s"--- round $round")
      t("full_gate") { graft.SparkEntry.queries("retrieval_hybrid_rrf_index")(spark, sfDir) }
      t("bm25_leg") { TextOps.bm25Search(Tables.documents(spark, sfDir),
        Seq("hash", "join", "stream"), topK = 50) }
      t("ivf_serve_leg") { graft.SparkEntry.queries("ann_ivf_index_topk")(spark, sfDir) }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
