package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Clustering

class ClusteringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  def emb = Tables.embeddings(spark, TestSpark.sfDir)

  test("kmeans result matches a local Lloyd replay on the integer grid") {
    val k = 4; val iters = 2
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1024 + 0.5).toLong).toArray)
      .sortBy(_._1)
    val n = vecs.length
    val stride = math.max(n / k, 1)
    var cent: Map[Long, Array[Long]] = vecs
      .filter { case (id, _) => id % stride == 0 && id / stride < k }
      .map { case (id, q) => (id / stride) -> q }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def nearest(q: Array[Long]): (Long, Long) =
      cent.toSeq.map { case (c, cv) => (c, d2(q, cv)) }
        .minBy { case (c, d) => (d, c) }
    for (_ <- 1 to iters) {
      val assigned = vecs.map { case (id, q) => (nearest(q)._1, q) }
      cent = assigned.groupBy(_._1).map { case (c, members) =>
        val qs = members.map(_._2)
        c -> Array.tabulate(64) { j =>
          val sx = qs.map(_(j)).sum
          math.floor(sx.toDouble / qs.length.toDouble + 0.5).toLong
        }
      }
    }
    val expected = vecs.map { case (id, q) =>
      val (c, d) = nearest(q); (id, c, d)
    }
    val sizes = expected.groupBy(_._2).map { case (c, m) => c -> m.length.toLong }
    val got = Clustering.kmeans(emb, k, iters).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.length == n)
    got.zip(expected).foreach { case ((gid, gc, gd, gs), (eid, ec, ed)) =>
      assert(gid == eid)
      assert(gc == ec, s"vec $gid assigned to $gc, replay says $ec")
      assert(gd == ed)
      assert(gs == sizes(ec))
    }
  }

  test("kmeans is deterministic and cluster sizes partition the corpus") {
    val a = Clustering.kmeans(emb, 8, 2).collect().map(_.toSeq).sortBy(_.toString)
    val b = Clustering.kmeans(emb, 8, 2).collect().map(_.toSeq).sortBy(_.toString)
    assert(a.sameElements(b))
    val n = emb.count()
    val bySize = a.map(r => (r(1).asInstanceOf[Long], r(3).asInstanceOf[Long]))
      .distinct
    assert(bySize.map(_._2).sum == n, "cluster sizes must partition the corpus")
    assert(bySize.length > 1, "more than one non-empty cluster expected")
  }

  test("iterations improve (never worsen) total within-cluster distance") {
    def cost(iters: Int): Long =
      Clustering.kmeans(emb, 8, iters).agg(sum("dist")).collect()(0).getLong(0)
    val c1 = cost(1); val c3 = cost(3)
    assert(c3 <= c1, s"Lloyd cost went up: iters=1 -> $c1, iters=3 -> $c3")
  }

  test("prototypePrune: exact cut arithmetic, total-order ties, keepers only") {
    import spark.implicits._
    // hand clustering: cluster 0 has 8 members (dists 10,10,20,30,...,70 —
    // a TIE at the cut), cluster 1 has 3 (cut = 3*1 div 4 = 0: keep all)
    val c0 = Seq(10L, 10L, 20L, 30L, 40L, 50L, 60L, 70L).zipWithIndex
      .map { case (dist, i) => (100L + i, 0L, dist, 8L) }
    val c1 = Seq((200L, 1L, 5L, 3L), (201L, 1L, 6L, 3L), (202L, 1L, 7L, 3L))
    val clustered = (c0 ++ c1).toDF("vec_id", "cluster", "dist", "cluster_size")
    val kept = Clustering.prototypePrune(clustered, 1L, 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // cluster 0: drop 8*1 div 4 = 2 closest — the dist-10 pair, tie broken
    // by vec_id, so 100 and 101 go, 102..107 stay; cluster 1: all stay
    assert(kept.map(_._1).toSeq ==
      Seq(102L, 103L, 104L, 105L, 106L, 107L, 200L, 201L, 202L))
    // dropping everything (dropNum = dropDen) keeps nothing
    assert(Clustering.prototypePrune(clustered, 1L, 1L).count() == 0L)
    // guard
    intercept[IllegalArgumentException](Clustering.prototypePrune(clustered, 5L, 4L))
  }
}
