package graft.tools

import graft.core.{Sessions, Tables}
import graft.functions.Portable
import org.apache.spark.sql.functions._

/** Builder probe: INTERLEAVED A/B of the two text_shard_provenance wirings
  * in one window — (A) the r15 shape: kept = docs⋈dec, shards =
  * shuffleShards(kept) (window + join); (B) the r16 shape: shard computed
  * as the per-row key function over dec's keep rows (the oracle's `sh` CTE
  * shape). Alternating runs make host drift hit both sides equally; also
  * asserts the two results are bit-identical via sorted-collect compare. */
object ProvAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus, "graft-provab")
    graft.plans.GraftFunctions.register(spark)
    import graft.operators.TextOps
    val docs = Tables.documents(spark, sfDir)

    def mkA() = {
      val dec = TextOps.curationDecisionsFamilies(docs, tau = 0.5,
        decontamPctTrain = 90).localCheckpoint(false)
      val kept = docs.join(dec.filter(col("keep")).select("doc_id"), "doc_id")
      TextOps.shardProvenance(docs, dec, TextOps.shuffleShards(kept))
    }
    def mkB() = {
      val dec = TextOps.curationDecisionsFamilies(docs, tau = 0.5,
        decontamPctTrain = 90).localCheckpoint(false)
      val shards = dec.filter(col("keep")).select(col("doc_id"),
        expr(s"cast(${Portable.shuffleKeySpark("doc_id")} % 16 as int)").as("shard"))
      TextOps.shardProvenance(docs, dec, shards)
    }

    // bit-identity first (sorted rows, full compare)
    val ra = mkA().orderBy("shard", "source", "lang", "stage").collect().toSeq
    val rb = mkB().orderBy("shard", "source", "lang", "stage").collect().toSeq
    require(ra == rb, s"A/B MISMATCH: ${ra.size} vs ${rb.size} rows")
    println(s"PROVAB identical: ${ra.size} rows")
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

    def once(mk: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      w
    }
    once(mkA _); once(mkB _) // warm both shapes
    val s0 = GateJobProbe.stealJiffies()
    val as = scala.collection.mutable.ArrayBuffer.empty[Double]
    val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to sys.env.getOrElse("AB_REPS", "6").toInt).foreach { _ =>
      as += once(mkA _); bs += once(mkB _)
    }
    val stolen = GateJobProbe.stealJiffies() - s0
    println(f"PROVAB A(old) min ${as.min}%.2f runs ${as.map(x => f"$x%.2f").mkString(",")}")
    println(f"PROVAB B(new) min ${bs.min}%.2f runs ${bs.map(x => f"$x%.2f").mkString(",")}")
    println(s"PROVAB steal $stolen")
    spark.stop()
  }
}
