package graft.tools

import graft.core.{Sessions, Tables}
import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Builder tool: SUB-stage timing inside the two hot curation e2e stages
  * (dedupLines+excise, familyDecisions) — names the stage to attack before
  * optimizing blind. Forces evaluation with a value-reading bit_xor(hash)
  * aggregate (CLAUDE.md timing trap: count over non-nullable exprs lets
  * codegen dead-code-eliminate the chain). */
object E2eProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(16, "graft-e2eprobe2")
    def force(df: DataFrame): Unit = {
      val h = df.select(hash(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      h.length
    }
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"E2E2 $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val docs = Tables.documents(spark, sfDir)
      // stage 1+2 sub-parts
      val d1 = t("s1 dedupLines") {
        val d = TextOps.dedupLines(docs, 5, carry = Seq("source", "lang"))
          .select(col("doc_id"), col("source"), col("lang"), col("clean_text").as("text"))
          .localCheckpoint(false)
        force(d); d
      }
      val d2 = t("s2 excise") {
        val d = Dedup.exactSubstrExcise(d1, 8, carry = Seq("source", "lang"))
          .select(col("doc_id"), col("source"), col("lang"), col("clean_text").as("text"))
          .localCheckpoint(false)
        force(d); d
      }
      val sel = TextOps.dsirScores(d2, col("source").isin("web"), 512, 0.75)
        .filter(col("selected")).select("doc_id")
      val d3 = t("s3 dsir+join") {
        val d = d2.join(sel, "doc_id").localCheckpoint(false)
        force(d); d
      }
      // familyDecisions sub-parts, each independently on the materialized d3
      t("s4a quality proj") { force(TextOps.qualityScore(d3)) }
      t("s4b languageId") { force(TextOps.languageId(d3)) }
      t("s4c repetition") { force(TextOps.repetitionScore(d3)) }
      // minhashLshPairs micro-breakdown
      graft.plans.GraftFunctions.register(spark)
      t("s4d1 shingle hashes") {
        force(graft.operators.Scale.fanOutScan(d3).select(col("doc_id"),
          expr("graft_shingle_hashes(text, 3)").as("sh")))
      }
      t("s4d2 minhash sig") {
        force(graft.operators.Scale.fanOutScan(d3).select(col("doc_id"),
          expr("graft_minhash(graft_shingle_hashes(text, 3), 126)").as("sig")))
      }
      val bt = t("s4d3 band table") {
        val b = Dedup.minhashBandTable(d3, 3, 42, 3).localCheckpoint(false)
        force(b); b
      }
      t("s4d4 bucket agg+pairs") {
        force(bt.groupBy("band", "bh")
          .agg(expr("graft_top_k(struct(doc_id), 1001, 'A')").as("ids"))
          .filter(size(col("ids")).between(2, 1000))
          .select(col("ids"), explode(col("ids")).as("ra"))
          .select(col("ra.doc_id").as("doc_a"), explode(col("ids")).as("rb"))
          .select(col("doc_a"), col("rb.doc_id").as("doc_b"))
          .filter(col("doc_a") < col("doc_b")).distinct())
      }
      val pairs = t("s4d minhashLshPairs full") {
        val p = Dedup.minhashLshPairs(d3, 3, tau = 0.5).localCheckpoint(false)
        force(p); p
      }
      t("s4e components") { force(Dedup.connectedComponents(pairs.select("doc_a", "doc_b"))) }
      t("s4g familyDecisions full") {
        force(TextOps.curationDecisionsFamilies(d3, Seq("en"), 2.0, 3, 0.5, 42, 3))
      }
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
