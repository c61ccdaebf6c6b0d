package graft.tools

import graft.core.{Sessions, Tables}
import graft.operators.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Builder tool: A/B of the domainMixtureWeights round regimes — the
  * distributed round-loop (iters x (2 one-row aggregates + join + lazy
  * checkpoint)) vs the one-pass mapPartitions trajectory fold — on the two
  * bench gate shapes. Min-of-6 per variant; results must be
  * bitwise-identical (asserted here via the value-reading hash fold). */
object MixtureProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(32, "graft-mixture-probe")
    graft.plans.GraftFunctions.register(spark)
    val iters = 5

    def force(df: DataFrame): Long = {
      val r = df.select(xxhash64(df.columns.map(col): _*).as("__h"))
        .agg(bit_xor(col("__h"))).head.getLong(0)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      r
    }
    def traj(fold: Boolean): DataFrame = {
      val docs = Tables.documents(spark, sfDir)
      val loss = TextOps.mixtureLoss(docs, "source")
      val nDom = loss.count()
      val mass = nDom * TextOps.MixtureW
      if (fold) TextOps.mixtureRoundsFolded(loss, iters, 8L, 1L, TextOps.MixtureW, mass)
      else TextOps.mixtureRoundsLoop(loss, iters, 8L, 1L, TextOps.MixtureW, mass)
    }
    def learned(fold: Boolean): DataFrame =
      TextOps.mixtureSampleByWeights(Tables.documents(spark, sfDir),
        traj(fold).filter(col("round") === iters).select("source", "weight"))

    def minOf6(name: String)(mk: => DataFrame): Long = {
      var best = Double.MaxValue
      var h = 0L
      (1 to 6).foreach { _ =>
        val t0 = System.nanoTime()
        h = force(mk)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"MPROBE $name%-22s min $best%.3f s  hash $h%x")
      h
    }
    // warm the shared infra once
    force(traj(fold = true))
    val hLoopT = minOf6("traj-loop")(traj(fold = false))
    val hFoldT = minOf6("traj-fold")(traj(fold = true))
    val hLoopL = minOf6("learned-loop")(learned(fold = false))
    val hFoldL = minOf6("learned-fold")(learned(fold = true))
    assert(hLoopT == hFoldT, s"trajectory regimes disagree: $hLoopT vs $hFoldT")
    assert(hLoopL == hFoldL, s"learned regimes disagree: $hLoopL vs $hFoldL")
    println("MPROBE regimes bitwise-identical")
    spark.stop()
  }
}
