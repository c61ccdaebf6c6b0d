package graft.tools

import graft.core.{Sessions, Tables}
import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Builder tool: where does text_quality_classifier spend its time —
  * label distillation, feature build, or the epoch loop? A/B of three
  * epoch shapes (broadcast-join weights / literal-array weights /
  * doc-level array one-scan fuse). */
object ClassifierProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(16, "graft-classifier-probe")
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CPROBE $name%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 3).foreach { round =>
      println(s"--- round $round")
      val docs = Tables.documents(spark, sfDir)
      val y = TextOps.qualityScore(docs)
        .select(col("doc_id"),
          when(col("quality_score") >= 2.0, lit(1L)).otherwise(lit(-1L)).as("y"))
      val labeled = docs.select("doc_id", "text").join(y, "doc_id")
      val fx = t("features") {
        val d = graft.operators.Scale.fanOutScan(labeled)
          .select(col("doc_id"), col("y"), explode(expr("graft_tokens(text)")).as("tok"))
          .select(col("doc_id"), col("y"),
            pmod(expr("graft_phash(tok)"), lit(64L)).as("b"))
          .groupBy("doc_id", "y", "b")
          .agg(count(lit(1)).cast("bigint").as("x"))
          .repartition(col("doc_id"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        d.count(); d
      }
      // A: current shape — broadcast weight join, two fx reads per epoch
      val wA = Array.fill(64)(0L)
      (1 to 3).foreach { e =>
        t(s"A-epoch$e") {
          val wDf = wA.zipWithIndex.map { case (v, b) => (b.toLong, v) }
            .toSeq.toDF("b", "w")
          val margins = fx.join(broadcast(wDf), Seq("b"), "left")
            .groupBy("doc_id", "y")
            .agg(sum(col("x") * coalesce(col("w"), lit(0L))).as("m"))
          val mis = margins.filter(col("y") * col("m") <= 0).select("doc_id")
          fx.join(mis, "doc_id")
            .groupBy("b").agg(sum(col("y") * col("x")).as("dw"))
            .collect().foreach(r => wA(r.getLong(0).toInt) += r.getLong(1))
        }
      }
      // B: literal-array weights (codegen element_at), still two-phase
      val wB = Array.fill(64)(0L)
      (1 to 3).foreach { e =>
        t(s"B-epoch$e") {
          val wlit = array(wB.map(lit(_)): _*)
          val margins = fx
            .withColumn("w", element_at(wlit, col("b").cast("int") + 1))
            .groupBy("doc_id", "y")
            .agg(sum(col("x") * col("w")).as("m"))
          val mis = margins.filter(col("y") * col("m") <= 0).select("doc_id")
          fx.join(mis, "doc_id")
            .groupBy("b").agg(sum(col("y") * col("x")).as("dw"))
            .collect().foreach(r => wB(r.getLong(0).toInt) += r.getLong(1))
        }
      }
      // C: doc-level arrays, one cache scan per epoch (margin via HOF fold,
      // then explode only misclassified docs' features)
      val fd = t("docarrays") {
        val d = fx.groupBy("doc_id", "y")
          .agg(collect_list(struct(col("b"), col("x"))).as("feats"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        d.count(); d
      }
      val wC = Array.fill(64)(0L)
      (1 to 3).foreach { e =>
        t(s"C-epoch$e") {
          val wlit = array(wC.map(lit(_)): _*)
          fd.withColumn("m", aggregate(col("feats"), lit(0L),
              (acc, f) => acc + f.getField("x") * element_at(wlit, f.getField("b").cast("int") + 1)))
            .filter(col("y") * col("m") <= 0)
            .select(col("y"), explode(col("feats")).as("f"))
            .groupBy(col("f.b").as("b")).agg(sum(col("y") * col("f.x")).as("dw"))
            .collect().foreach(r => wC(r.getLong(0).toInt) += r.getLong(1))
        }
      }
      // D: r15 shape — zero-shuffle feature build (native graft_bucket_counts
      // projection, no explode aggregate, no collect_list exchange), same
      // one-scan epochs as C
      val fdD = t("D-featproj") {
        val d = graft.operators.Scale.fanOutScan(labeled)
          .withColumn("toks", expr("graft_tokens(text)"))
          .withColumn("feats", expr("graft_bucket_counts(toks, 64)"))
          .select("doc_id", "y", "feats")
          .filter(size(col("feats")) > 0)
          .persist(StorageLevel.MEMORY_AND_DISK)
        d.count(); d
      }
      val wD = Array.fill(64)(0L)
      (1 to 3).foreach { e =>
        t(s"D-epoch$e") {
          val wlit = array(wD.map(lit(_)): _*)
          fdD.withColumn("m", aggregate(col("feats"), lit(0L),
              (acc, f) => acc + f.getField("x") * element_at(wlit, f.getField("b").cast("int") + 1)))
            .filter(col("y") * col("m") <= 0)
            .select(col("y"), explode(col("feats")).as("f"))
            .groupBy(col("f.b").as("b")).agg(sum(col("y") * col("f.x")).as("dw"))
            .collect().foreach(r => wD(r.getLong(0).toInt) += r.getLong(1))
        }
      }
      // the shipped operator end to end (labels distilled inline)
      t("full-gate") {
        graft.operators.Classifier.qualityPerceptron(docs).collect()
      }
      println("CPROBE parity A==B " + wA.sameElements(wB) + " A==C " + wA.sameElements(wC)
        + " A==D " + wA.sameElements(wD))
      fx.unpersist(); fd.unpersist(); fdD.unpersist()
    }
    spark.stop()
  }
}
