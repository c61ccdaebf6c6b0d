package graft.tools

import org.apache.spark.sql.functions._

/** Builder tool: decomposes gold_q1_pricing_summary's cost into (full gate,
  * plain double-sum agg, decimal-exact agg) at sf0.1 — the measurement
  * behind BASELINE.md's note that the graft-vs-DuckDB gap on the gold/silver
  * families is the price of decimal-exact bitwise oracle parity (double sums
  * are ~2x faster but not hash-checkable; long-cents sums cross 2^53 at
  * larger SFs). */
object Q1Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32, "graft-q1probe")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val q = graft.SparkEntry.queries("gold_q1_pricing_summary")
    // warm
    q(spark, dir).write.format("noop").mode("overwrite").save()
    (1 to 3).foreach(i => time(s"q1 full $i")(q(spark, dir).write.format("noop").mode("overwrite").save()))
    val li = graft.core.Tables.lineitem(spark, dir)
    li.count()
    (1 to 2).foreach(i => time(s"plain double sum $i") {
      li.filter(col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")), avg(col("l_discount")), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    })
    (1 to 2).foreach(i => time(s"decimal sum $i") {
      li.filter(col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")), sum(col("l_extendedprice").cast("decimal(18,2)")),
          sum(col("l_discount").cast("decimal(18,2)")), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    })
    spark.stop()
  }
}
