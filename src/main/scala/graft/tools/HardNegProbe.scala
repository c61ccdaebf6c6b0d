package graft.tools

import graft.core.Sessions
import org.apache.spark.sql.functions._

/** Builder probe: decompose retrieval_hard_negatives' wall time into its
  * legs — anchored near-dup pair generation, md5 exact-twin leg, the
  * exclusion distinct, and the brute-force scoring fold — each timed
  * min-of-N with the noop sink (the bench methodology). */
object HardNegProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus, "graft-hardneg-probe")
    graft.plans.GraftFunctions.register(spark)
    import graft.operators.{Dedup, Retrieval, Scale}
    val reps = 4

    def timed(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"HN $name%-28s min ${runs.min}%.2f  runs ${runs.map(r => f"$r%.2f").mkString(",")}")
    }

    val docs = graft.core.Tables.documents(spark, sfDir)
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val nQueries = 20; val k = 10; val tauJ = 0.5

    timed("full_gate") { Retrieval.hardNegatives(docs, emb, nQueries, k, tauJ) }
    // production serve shape (r17, the r16-VERDICT-requested number): the
    // dedup stage's verified pairs are INJECTED via the `pairs` parameter,
    // so the corpus signature pass is paid once by the dedup job, not per
    // hardNegatives call. The pair table is materialized to parquet OUTSIDE
    // the timed region, exactly as a pipeline hands it over.
    val pairDir = java.nio.file.Files.createTempDirectory("graft-hn-pairs").toString
    Dedup.minhashAnchoredPairs(docs, col("doc_id") < nQueries, 3, 42, 3, tauJ)
      .write.mode("overwrite").parquet(pairDir)
    timed("full_gate_injected") {
      Retrieval.hardNegatives(docs, emb, nQueries, k, tauJ,
        pairs = Some(spark.read.parquet(pairDir)))
    }
    timed("anchored_pairs") {
      Dedup.minhashAnchoredPairs(docs, col("doc_id") < nQueries, 3, 42, 3, tauJ) }
    timed("exact_twin_leg") {
      val keys = docs.select(col("doc_id"), md5(col("text")).as("kk"))
      keys.filter(col("doc_id") < nQueries)
        .select(col("doc_id").as("query_id"), col("kk"))
        .join(keys.select(col("doc_id").as("neighbor_id"), col("kk")), "kk")
        .filter(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id")
    }
    timed("scoring_only") {
      def nrm = sqrt(expr("graft_dot(embedding, embedding)"))
      val q = Scale.fanOutScan(emb).filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("emb_q"), nrm.as("norm_q"))
      val v = Scale.fanOutScan(emb)
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("emb_v"), nrm.as("norm_v"))
      val scored = v.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine",
          expr("graft_dot(emb_q, emb_v)") / (col("norm_q") * col("norm_v")))
      Scale.topKPerKey(scored.select("query_id", "neighbor_id", "cosine"),
        Seq("query_id"), Seq(("cosine", true), ("neighbor_id", false)), k, Seq.empty)
    }
    spark.stop()
  }
}
