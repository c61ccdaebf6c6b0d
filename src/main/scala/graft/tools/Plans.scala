package graft.tools

import graft.core.Sessions

/** Builder tool: dump formatted physical plans for representative queries so
  * plan regressions (lost pushdown, missed broadcast, codegen gaps) are
  * visible. Not part of the library API. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4, "graft-plans")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "gold_q1_pricing_summary", "gold_regional_revenue",
      "gold_top_parts_by_revenue", "events_dedup_latest",
      "ann_brute_force_topk", "profile_lineitem_nulls")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
