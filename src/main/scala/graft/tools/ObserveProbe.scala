package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pins down whether Dataset.observe metrics survive (a) a plain action,
  * (b) AQE empty-relation propagation, (c) a persist boundary. */
object ObserveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    @volatile var seen = Map.empty[String, Long]
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach { case (n, r) => seen += (n -> r.getLong(0)) }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })
    def drain(tag: String): Unit = {
      Thread.sleep(2000)
      println(s"[obs] $tag -> $seen")
      seen = Map.empty
    }

    val df = (1 to 100).toDF("x")
    // (a) plain
    df.observe("m_plain", count(when($"x" > 50, 1)).as("n")).filter($"x" > 200).collect()
    drain("plain, empty result")
    // (b) through agg + empty filter downstream join
    val g = (1 to 100).map(i => (i % 5, i)).toDF("k", "v")
      .groupBy("k").agg(collect_list($"v").as("ids"))
      .observe("m_agg", count(when(size($"ids") > 10, 1)).as("n"))
      .filter(size($"ids") <= 10)
    val cand = g.select(explode($"ids").as("a")).distinct().persist()
    val out = df.join(broadcast(cand.select($"a".as("x"))), "x")
    out.collect()
    drain("agg + persist + join, nonempty")
    // (c) same but filter keeps NOTHING (all groups size 20)
    val g2 = (1 to 100).map(i => (i % 5, i)).toDF("k", "v")
      .groupBy("k").agg(collect_list($"v").as("ids"))
      .observe("m_agg_empty", count(when(size($"ids") > 10, 1)).as("n"))
      .filter(size($"ids") <= 10)
    val cand2 = g2.select(explode($"ids").as("a")).distinct().persist()
    val out2 = df.join(broadcast(cand2.select($"a".as("x"))), "x")
    println("[obs] rows(c) = " + out2.count())
    drain("agg + persist + join, EMPTY")
    spark.stop()
  }
}
