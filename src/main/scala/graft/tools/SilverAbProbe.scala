package graft.tools

import graft.core.Sessions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Builder tool: interleaved same-window A/B of the two dedup-keep-latest
  * shapes on the real bronze lineitem input (the CLAUDE.md drift playbook —
  * alternating runs in ONE window so host-baseline movement hits both arms
  * equally), with a bit-identity assert between the arms.
  *
  *  - arm OLD: groupBy(pk).agg(max_by(row-struct, processed_at)) — plans as
  *    SortAggregate (immutable string-carrying buffer): two corpus-width
  *    sorts.
  *  - arm NEW: [[graft.operators.Scale.topKPerKey]] k=1 — ObjectHashAggregate
  *    over the graft_top_k TypedImperativeAggregate: no sorts.
  */
object SilverAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(32, "graft-silverabprobe")
    spark.sparkContext.setLogLevel("WARN")

    def stealJiffies(): Long =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try src.getLines().find(_.startsWith("cpu "))
          .map(_.trim.split("\\s+").drop(1).lift(7).map(_.toLong).getOrElse(0L))
          .getOrElse(0L)
        finally src.close()
      } catch { case _: Exception => 0L }

    val bronze = graft.queries.Silver.probeBronzeInventory(spark, sfDir)
    val cols = bronze.columns

    def oldShape(): DataFrame =
      bronze.filter(!col("is_duplicate_in_file"))
        .groupBy(expr("try_cast(id as bigint)").as("__pk"))
        .agg(max_by(struct(cols.map(col).toIndexedSeq: _*), col("processed_at")).as("__row"))
        .select(cols.map(c => col(s"__row.`$c`").as(c)).toIndexedSeq: _*)
    // the topKPerKey(k=1) shape INLINED (r16 ADVICE: delegating to
    // dedupLatest — which kept max_by after this probe's verdict — made the
    // committed probe A/B max_by against itself): keep-latest = top-1 by
    // processed_at DESC, payload = every bronze column
    def newShape(): DataFrame =
      graft.operators.Scale.topKPerKey(
          bronze.filter(!col("is_duplicate_in_file"))
            .withColumn("__pk", expr("try_cast(id as bigint)")),
          keys = Seq("__pk"), order = Seq(("processed_at", true)), k = 1,
          payload = cols.toSeq)
        .select(cols.map(c => col(s"`$c`")).toIndexedSeq: _*)

    // bit-identity: same surviving rows (order-insensitive)
    val a = oldShape().orderBy("id", "product_id").collect().toSeq
    val b = newShape().orderBy("id", "product_id").collect().toSeq
    require(a.size == b.size && a == b, s"arms disagree: ${a.size} vs ${b.size}")
    println(s"SILVAB bit-identical: ${a.size} rows")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(oldShape()); noop(newShape()) // warm both plans
    val n = 8
    val times = Array.fill(2)(List.empty[Double]).toBuffer
    val s0 = stealJiffies()
    for (_ <- 1 to n; arm <- 0 to 1) {
      val t0 = System.nanoTime()
      noop(if (arm == 0) oldShape() else newShape())
      times(arm) = ((System.nanoTime() - t0) / 1e9) :: times(arm)
    }
    val steal = stealJiffies() - s0
    Seq("OLD max_by/SortAgg", "NEW topK/ObjHashAgg").zipWithIndex.foreach {
      case (l, i) =>
        val ts = times(i).sorted
        println(f"SILVAB $l%-22s min ${ts.head}%.3f med ${ts(ts.size / 2)}%.3f " +
          f"all ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    println(s"SILVAB steal $steal")
    spark.stop()
  }
}
