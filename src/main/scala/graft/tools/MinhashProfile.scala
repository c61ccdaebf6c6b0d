package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}
import graft.functions.Portable
import graft.operators.Dedup

/** Builder tool: stage-by-stage timing of the MinHash pipeline. */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(16, "graft-mh")
    graft.plans.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup
    docs.count()

    val sets = time("shingleSets")(
      { val s = Dedup.shingleSets(docs, 3); s.write.format("noop").mode("overwrite").save(); s })
    val sh = sets.select(col("doc_id"), explode(col("shingles")).as("s"))
      .withColumn("ph", expr("graft_phash(s)"))
    time("explode+phash")(sh.write.format("noop").mode("overwrite").save())
    val fam = Portable.hashFamily(126)
    val sigCols = fam.zipWithIndex.map { case ((a, b), i) =>
      min(expr(Portable.affineHash("ph", a, b))).as(s"m$i") }
    val sig = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    time("signature agg")(sig.write.format("noop").mode("overwrite").save())
    val bandCols = (0 until 42).map { j =>
      val rows = (0 until 3).map(r => s"m${j * 3 + r}")
      expr(rows.reduceLeft((acc, m) => s"(($acc * 131 + $m) % 1000000007)")) }
    val sigP = sig.persist(); sigP.count()
    val bandsDf = sigP.select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band", "bh")))
    val cand = bandsDf.as("x").join(bandsDf.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    val nCand = time("bands+join+distinct")(cand.count())
    println(s"CANDIDATES $nCand")
    // decompose the new operator structure
    val sh2 = docs.select(col("doc_id"),
      explode(expr("graft_shingle_hashes(text, 3)")).as("ph"))
    time("native shingle+explode")(sh2.write.format("noop").mode("overwrite").save())
    val sig2 = sh2.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    time("native signature agg")(sig2.write.format("noop").mode("overwrite").save())
    // inline the operator with per-phase timing
    import org.apache.spark.storage.StorageLevel
    val sig3 = sig2.persist(StorageLevel.MEMORY_AND_DISK)
    time("sig3 materialize")(sig3.count())
    val bandsDf3 = sig3.select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band", "bh")))
    val cand3 = bandsDf3.as("x").join(bandsDf3.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("cand3 materialize")(cand3.count())
    val candDocs3 = cand3.select(col("doc_a").as("doc_id"))
      .union(cand3.select(col("doc_b").as("doc_id"))).distinct()
    time("candDocs3")(candDocs3.count())
    val sets3 = Dedup.shingleSets(docs.join(candDocs3, "doc_id"), 3)
    time("sets3")(sets3.write.format("noop").mode("overwrite").save())
    val a3 = sets3.select(col("doc_id").as("doc_a"), col("shingles").as("sa"), col("n_shingles").as("na"))
    val b3 = sets3.select(col("doc_id").as("doc_b"), col("shingles").as("sb"), col("n_shingles").as("nb"))
    val ver = cand3.join(a3, "doc_a").join(b3, "doc_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard")
    time("verify join")(ver.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
