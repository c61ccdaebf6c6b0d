package graft.tools

import graft.core.{Sessions, Tables}
import graft.operators.Similarity

/** Builder tool: PQ recall grid over (ksub, refine). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(16, "graft-pqprobe")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    }
    val exact = (0L until 10L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq.sortBy(v => (l2(vecs(q), vecs(v)), v)).take(10).map(v => (q, v))
    }.toSet
    for (ksub <- Seq(16, 32, 64); refine <- Seq(50, 100)) {
      val approx = Similarity.pqAnnTopK(emb, 10, 10, 8, ksub, refine).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"PQPROBE ksub=$ksub%2d refine=$refine%3d recall=${(exact & approx).size.toDouble / exact.size}%.2f")
    }
    spark.stop()
  }
}
