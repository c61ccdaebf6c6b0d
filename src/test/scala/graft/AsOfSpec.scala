package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // left: (id, key, t) — right: (key, t, payload v, tiebreak tb)
  private def left = Seq(
    (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L),
    (4L, "b", 100L), (5L, "c", 50L)
  ).toDF("id", "k", "t")

  private def right = Seq(
    ("a", 10L, "a@10-lo", 1L), ("a", 10L, "a@10-hi", 2L), // dup ts, tiebreak
    ("a", 15L, "a@15", 1L),
    ("b", 90L, "b@90", 1L), ("b", 101L, "b@101", 1L)
  ).toDF("k", "t", "v", "tb")

  private def backward: Map[Long, String] =
    AsOf.joinAsOf(left, right, "k", "k", "t", "t", Seq("v"), "tb")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) null else r.getString(3)))
      .toMap

  test("backward as-of: latest right at or before left ts, inclusive at equality") {
    val m = backward
    assert(m(1L) == "a@10-hi") // equal ts included, max-tiebreak payload wins
    assert(m(2L) == "a@15")    // latest prior, not just any prior
    assert(m(4L) == "b@90")    // 101 is in the future, must not match
  }

  test("backward as-of: no prior right row yields NULL payload (left join)") {
    val m = backward
    assert(m(3L) == null) // t=5 precedes every 'a' right row
    assert(m(5L) == null) // key 'c' absent from right entirely
    assert(m.size == 5)   // every left row survives exactly once
  }

  test("forward as-of: earliest right at or after left ts") {
    val m = AsOf.joinAsOfForward(left, right, "k", "k", "t", "t", Seq("v"), "tb")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) null else r.getString(3)))
      .toMap
    assert(m(3L) == "a@10-lo") // t=5 -> earliest following is t=10; min-tiebreak wins
    assert(m(1L) == "a@10-lo") // equal ts included
    assert(m(2L) == null)      // t=20 is after every 'a' right row
    assert(m(4L) == "b@101")
    assert(m(5L) == null)
  }

  test("as-of carries multiple payload columns and preserves left columns") {
    val r2 = Seq(("a", 1L, "x", 7L, 1L)).toDF("k", "t", "v", "w", "tb")
    val out = AsOf.joinAsOf(left, r2, "k", "k", "t", "t", Seq("v", "w"), "tb")
    assert(out.columns.toSeq == Seq("id", "k", "t", "v", "w"))
    val row = out.filter($"id" === 1L).collect().head
    assert(row == Row(1L, "a", 10L, "x", 7L))
  }

  test("as-of rejects payload columns that collide with left columns") {
    val r2 = Seq(("a", 1L, "x", 1L)).toDF("k", "t", "v", "tb")
    val e = intercept[IllegalArgumentException] {
      AsOf.joinAsOf(left, r2, "k", "k", "t", "t", Seq("t"), "tb")
    }
    assert(e.getMessage.contains("collide"))
    val e2 = intercept[IllegalArgumentException] {
      AsOf.joinAsOfForward(left, r2, "k", "k", "t", "t", Seq("t"), "tb")
    }
    assert(e2.getMessage.contains("collide"))
  }

  /** 120 randomized corpora against a driver-side brute-force reference, run
    * as ONE Spark job: corpus c gets key prefix "c<c>-", so independence is
    * free and the property costs one window instead of 120 jobs. Corpora are
    * drawn to hit the edge shapes: duplicate right timestamps (ts pool of 8),
    * EMPTY right sides (every 5th corpus), and all-late lefts (every 7th
    * corpus shifts left ts below every right ts). */
  test("property: as-of equals brute force over 120 randomized corpora") {
    val rng = new scala.util.Random(4242)
    var tb = 0L
    val lefts = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    val rights = scala.collection.mutable.ArrayBuffer[(String, Long, String, Long)]()
    for (c <- 0 until 120) {
      val keys = (0 until 1 + rng.nextInt(3)).map(j => s"c$c-k$j")
      val allLate = c % 7 == 0
      val emptyRight = c % 5 == 0
      for (_ <- 0 until 1 + rng.nextInt(6)) {
        val k = keys(rng.nextInt(keys.length))
        val t = if (allLate) rng.nextInt(3).toLong else 10L + rng.nextInt(8)
        lefts += ((lefts.length.toLong, k, t))
      }
      if (!emptyRight) for (_ <- 0 until rng.nextInt(8)) {
        val k = keys(rng.nextInt(keys.length))
        val t = 10L + rng.nextInt(8) // small pool -> frequent duplicate ts
        tb += 1
        rights += ((k, t, s"v$tb", tb))
      }
    }
    val l = lefts.toSeq.toDF("id", "k", "t")
    val r = rights.toSeq.toDF("k", "t", "v", "tb")

    def expect(cmp: (Long, Long) => Boolean, pick: Seq[(String, Long, String, Long)] => String)
        : Map[Long, String] =
      lefts.map { case (id, k, t) =>
        val m = rights.filter(x => x._1 == k && cmp(x._2, t))
        id -> (if (m.isEmpty) null else pick(m.toSeq))
      }.toMap

    val expBack = expect(_ <= _, m => m.filter(_._2 == m.map(_._2).max).maxBy(_._4)._3)
    val gotBack = AsOf.joinAsOf(l, r, "k", "k", "t", "t", Seq("v"), "tb")
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(3)) null else x.getString(3))).toMap
    assert(gotBack == expBack)

    val expFwd = expect(_ >= _, m => m.filter(_._2 == m.map(_._2).min).minBy(_._4)._3)
    val gotFwd = AsOf.joinAsOfForward(l, r, "k", "k", "t", "t", Seq("v"), "tb")
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(3)) null else x.getString(3))).toMap
    assert(gotFwd == expFwd)

    // the drawn corpora actually exercised the edges
    assert(rights.groupBy(x => (x._1, x._2)).exists(_._2.size > 1), "duplicate ts present")
    assert(expBack.values.exists(_ == null) && expBack.values.exists(_ != null))
  }
}
