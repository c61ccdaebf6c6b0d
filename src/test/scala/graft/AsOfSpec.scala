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
}
