package graft.tools

import graft.core.Sessions
import org.apache.spark.sql.functions._

/** Builder probe: what does one AQE stage job COST at bench scale, and do
  * any runtime-settable configs shrink it? A k-shuffle chain (groupBy sum
  * re-keyed k times) over a tiny in-memory frame isolates pure scheduling/
  * AQE-materialization floor from real compute; per-config timings are
  * min-of-N in one JVM, interleaved against the baseline config. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus, "graft-floorprobe")
    import spark.implicits._
    val base = (0L until 5000L).toDF("id").localCheckpoint(true)

    def chain(k: Int) = {
      var df = base
      (1 to k).foreach { i =>
        df = df.groupBy((col("id") * i % 97).as("id")).agg(sum("id").as("s"))
          .select((col("id") + col("s") % 3).as("id"))
      }
      df
    }
    def time(k: Int): Double = {
      val t0 = System.nanoTime()
      chain(k).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm
    time(1); time(8)
    def minOf(n: Int, k: Int): Double = (1 to n).map(_ => time(k)).min

    val configs: Seq[(String, () => Unit)] = Seq(
      ("baseline", () => ()),
      ("no-parallelismFirst", () =>
        spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")),
      ("advisory8m", () =>
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")),
      ("aqe-off", () =>
        spark.conf.set("spark.sql.adaptive.enabled", "false")),
      ("baseline2", () => {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "67108864")
      })
    )
    configs.foreach { case (name, set) =>
      set()
      time(8) // re-warm under this config
      val t1 = minOf(5, 1); val t8 = minOf(5, 8); val t16 = minOf(5, 16)
      println(f"FLOOR $name%-22s k=1 $t1%.3f  k=8 $t8%.3f  k=16 $t16%.3f  per-stage ${(t16 - t8) / 8}%.4f")
    }
    spark.stop()
  }
}
