package graft.tools

import graft.core.{Sessions, Tables}
import graft.functions.Portable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Builder probe: INTERLEAVED A/B of the two band-key formulations inside a
  * replica of minhashLshPairs' candidate stage — (A) the 42-wide
  * `array(bandKeyCols…)` expression tree, (B) the native
  * `graft_band_keys` single node — timing construct and end-to-end wall
  * separately, plus a bit-identity assert on the verified pair sets. */
object BandAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus, "graft-bandab")
    graft.plans.GraftFunctions.register(spark)
    import graft.operators.{Dedup, Scale}
    val docs = Tables.documents(spark, sfDir)
    val (bands, rowsPerBand, n) = (42, 3, 3)
    val k = bands * rowsPerBand

    def oldKeys: Seq[Column] = Dedup.bandKeyCols(bands, rowsPerBand)
    def sig() = Scale.fanOutScan(docs).select(col("doc_id"),
        expr(s"graft_minhash(graft_shingle_hashes(text, $n), $k)").as("sig"))
      .filter(size(col("sig")) > 0 && expr("sig[0]") =!= Long.MaxValue)
    def candStage(native: Boolean): DataFrame = {
      val b0 = sig().select(col("doc_id"),
        posexplode(
          if (native) expr(s"graft_band_keys(sig, $bands, $rowsPerBand)")
          else array(oldKeys: _*)).as(Seq("band", "bh")))
      b0.groupBy("band", "bh")
        .agg(expr(s"graft_top_k(struct(doc_id), 1001, 'A')").as("ids"))
        .filter(size(col("ids")) >= 2 && size(col("ids")) <= 1000)
        .select(col("ids"), explode(col("ids")).as("ra"))
        .select(col("ra.doc_id").as("doc_a"), explode(col("ids")).as("rb"))
        .select(col("doc_a"), col("rb.doc_id").as("doc_b"))
        .filter(col("doc_a") < col("doc_b"))
        .distinct()
    }
    // identity
    val pa = candStage(false).orderBy("doc_a", "doc_b").collect().toSeq
    val pb = candStage(true).orderBy("doc_a", "doc_b").collect().toSeq
    require(pa == pb, s"band-key MISMATCH: ${pa.size} vs ${pb.size}")
    println(s"BANDAB identical: ${pa.size} candidate pairs")

    def once(native: Boolean): (Double, Double) = {
      val t0 = System.nanoTime()
      val df = candStage(native)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      ((t1 - t0) / 1e9, (t2 - t0) / 1e9)
    }
    once(false); once(true) // warm both
    val as = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    val bs = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    (1 to sys.env.getOrElse("AB_REPS", "8").toInt).foreach { _ =>
      as += once(false); bs += once(true)
    }
    def fmt(x: Seq[(Double, Double)]) =
      f"construct min ${x.map(_._1).min}%.3f wall min ${x.map(_._2).min}%.3f " +
        f"walls ${x.map(t => f"${t._2}%.2f").mkString(",")}"
    println(s"BANDAB A(42-wide tree) ${fmt(as.toSeq)}")
    println(s"BANDAB B(native node)  ${fmt(bs.toSeq)}")
    spark.stop()
  }
}
