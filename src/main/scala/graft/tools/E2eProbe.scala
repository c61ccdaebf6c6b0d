package graft.tools

import graft.core.{Sessions, Tables}
import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.functions._

/** Builder tool: stage-by-stage timing of the curation e2e chain, to see
  * where the gate's seconds actually go before optimizing blind. */
object E2eProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(16, "graft-e2eprobe")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"E2E $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val docs = Tables.documents(spark, sfDir)
      val d1 = TextOps.dedupLines(docs, 5, carry = Seq("source", "lang"))
        .select(col("doc_id"), col("source"), col("lang"), col("clean_text").as("text"))
      val d2 = t("dedupLines+excise") {
        val d = Dedup.exactSubstrExcise(d1, 8, carry = Seq("source", "lang"))
          .select(col("doc_id"), col("source"), col("lang"), col("clean_text").as("text"))
          .localCheckpoint(false)
        d.count(); d
      }
      val sel = TextOps.dsirScores(d2, col("source").isin("web"), 512, 0.75)
        .filter(col("selected")).select("doc_id")
      val d3 = t("dsir+join") {
        val d = d2.join(sel, "doc_id").localCheckpoint(false)
        d.count(); d
      }
      val keep = t("familyDecisions") {
        val k = TextOps.curationDecisionsFamilies(d3, Seq("en"), 2.0, 3, 0.5, 42, 3)
          .filter(col("keep")).select("doc_id").localCheckpoint(false)
        k.count(); k
      }
      val d4 = t("d4 checkpoint") {
        val d = d3.join(keep, "doc_id").localCheckpoint(false)
        d.count(); d
      }
      t("budget+pack+shards") {
        val tb = TextOps.tokenBudgetSample(d4, 1000L)
        val d5 = d4.join(tb.select("doc_id"), "doc_id")
        val pk = TextOps.packSequences(d5, 2048, 16)
        val sh = TextOps.shuffleShards(d5, 16)
        pk.select(col("doc_id"), col("lang"), col("n_tokens"),
            col("shard").as("pack_shard"), col("tok_offset"),
            col("first_pack"), col("last_pack"))
          .join(tb.select("doc_id", "source", "cum_tokens"), "doc_id")
          .join(sh, "doc_id")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
