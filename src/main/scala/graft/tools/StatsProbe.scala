package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}

/** Builder tool: compare the one-scan multi-distinct profile (Expand plan)
  * against a split formulation (separate distinct aggs + crossJoin). */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(16, "graft-stats")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"PROBE $label r$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val li = Tables.lineitem(spark, dir).withColumn("l_shipdate", to_date(col("l_shipdate")))
    time("expand (current)") {
      graft.queries.Profile.lineitemStats(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("split + crossJoin") {
      val base = li.agg(
        count(lit(1)).as("total_rows"),
        min("l_quantity").as("min_l_quantity"), max("l_quantity").as("max_l_quantity"),
        min("l_extendedprice").as("min_l_extendedprice"), max("l_extendedprice").as("max_l_extendedprice"),
        min("l_discount").as("min_l_discount"), max("l_discount").as("max_l_discount"),
        min("l_tax").as("min_l_tax"), max("l_tax").as("max_l_tax"),
        min("l_returnflag").as("min_l_returnflag"), max("l_returnflag").as("max_l_returnflag"),
        min("l_linestatus").as("min_l_linestatus"), max("l_linestatus").as("max_l_linestatus"))
      val n1 = li.select("l_orderkey").distinct().agg(count(lit(1)).as("ndv_l_orderkey"))
      val n2 = li.select("l_partkey").distinct().agg(count(lit(1)).as("ndv_l_partkey"))
      val n3 = li.select("l_suppkey").distinct().agg(count(lit(1)).as("ndv_l_suppkey"))
      base.crossJoin(n1).crossJoin(n2).crossJoin(n3)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
