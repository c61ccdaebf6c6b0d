package graft.tools

import graft.core.{Sessions, Tables}
import graft.operators.Graph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Builder tool: A/B of the pageRank regimes on the text_domain_pagerank
  * gate shape — the distributed round-loop (dangling aggregate +
  * contribution join + checkpoint per round) vs the small-graph fold
  * (weighted-edge contraction once, rounds in one task). Min-of-6; the
  * regimes must hash-agree. */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(32, "graft-pagerank-probe")
    graft.plans.GraftFunctions.register(spark)

    def force(df: DataFrame): Long = {
      val r = df.select(xxhash64(df.columns.map(col): _*).as("__h"))
        .agg(bit_xor(col("__h"))).head.getLong(0)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      r
    }
    def gate(fold: Boolean): DataFrame = {
      val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"))
      val tot = docs.agg(count(lit(1)).cast("bigint").as("tot"))
      val edges = docs.filter(expr("doc_id % 20 < 17")).as("a")
        .crossJoin(broadcast(tot))
        .join(docs.select(col("doc_id").as("b_id"), col("source").as("dst")).as("b"),
          expr("(a.doc_id * a.doc_id + 3) % tot") === col("b_id"))
        .select(col("a.source").as("src"), col("dst"))
      Graph.pageRankImpl(edges, 5, 85L, 100L, 1000000000000L, Some(fold))
        .select(col("node").as("domain"), col("rank"))
    }
    def minOf6(name: String)(mk: => DataFrame): Long = {
      var best = Double.MaxValue
      var h = 0L
      (1 to 6).foreach { _ =>
        val t0 = System.nanoTime()
        h = force(mk)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"PRPROBE $name%-14s min $best%.3f s  hash $h%x")
      h
    }
    force(gate(fold = true)) // warm shared infra
    val hLoop = minOf6("loop")(gate(fold = false))
    val hFold = minOf6("fold")(gate(fold = true))
    assert(hLoop == hFold, s"regimes disagree: $hLoop vs $hFold")
    println("PRPROBE regimes bitwise-identical")
    spark.stop()
  }
}
