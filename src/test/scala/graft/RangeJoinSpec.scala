package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{greatest, least}
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic pseudo-random values incl. negatives and exact boundaries
  private def points = (0 until 500)
    .map(i => (i.toLong, ((i * 37) % 200) - 50 + (i % 7) * 0.25))
    .toDF("pid", "v")

  // overlapping, irregular, and empty intervals
  private def intervals = Seq(
    (0L, -60.0, -10.0), (1L, -20.0, 35.5), (2L, 0.0, 0.0), // empty [0,0)
    (3L, 30.0, 31.0), (4L, 30.0, 160.0), (5L, 150.0, 150.25)
  ).toDF("iid", "lo", "hi")

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  // left intervals: varied lengths (incl. multi-bin spans), a touching pair,
  // nested, and zero-length — all the overlap-predicate corners
  private def leftIvals = Seq(
    (0L, 0.0, 10.0), (1L, 10.0, 20.0),   // touch at 10: NOT overlapping [*,10) vs [10,*)
    (2L, 5.0, 105.0),                     // spans many bins at small widths
    (3L, 50.0, 50.0),                     // empty
    (4L, -30.0, -5.0), (5L, 98.0, 99.0)
  ).toDF("lid", "l_lo", "l_hi")
  private def rightIvals = Seq(
    (10L, 9.0, 11.0), (11L, 10.0, 10.5),
    (12L, -100.0, 200.0),                 // contains everything
    (13L, 60.0, 70.0),                    // nested inside lid=2
    (14L, -5.0, 0.0), (15L, 105.0, 110.0) // touch lid=4 / lid=2 boundaries
  ).toDF("rid", "r_lo", "r_hi")

  test("bin-blocked overlap join equals the naive theta join, each pair exactly once") {
    for (w <- Seq(0.7, 8.0, 500.0)) {
      val got = RangeJoin.joinOverlap(leftIvals, "l_lo", "l_hi", rightIvals, "r_lo", "r_hi", w)
      assert(got.count() == got.select("lid", "rid").distinct().count(),
        s"duplicate pairs at binWidth $w")
      val want = leftIvals.join(rightIvals,
        greatest($"l_lo", $"r_lo") < least($"l_hi", $"r_hi"))
      def p(df: org.apache.spark.sql.DataFrame) =
        df.select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(p(got) == p(want), s"pair set mismatch at binWidth $w")
      // the corners, explicitly: touching intervals excluded, containment and
      // nesting included, empty interval matches nothing
      assert(!p(got).contains((0L, 11L)), "touching at 10 must not overlap")
      assert(!p(got).exists(_._1 == 3L), "empty interval must match nothing")
      assert(p(got).contains((2L, 13L)), "nested interval must match")
      assert(p(got).contains((0L, 12L)) && p(got).contains((4L, 12L)),
        "containing interval must match everything non-empty")
      assert(!p(got).contains((4L, 14L)), "touching at -5 must not overlap")
      assert(!p(got).contains((2L, 15L)), "touching at 105 must not overlap")
    }
  }

  test("bin-blocked range join equals the naive theta join, with no duplicate pairs") {
    for (w <- Seq(1.0, 16.0, 1000.0)) { // spans many bins / few bins / one bin
      val got = RangeJoin.joinRange(points, "v", intervals, "lo", "hi", w)
      assert(got.count() == got.select("pid", "iid").distinct().count(),
        s"duplicate pairs at binWidth $w")
      val want = points.join(intervals, $"v" >= $"lo" && $"v" < $"hi")
      assert(pairsOf(got) == pairsOf(want), s"pair set mismatch at binWidth $w")
    }
  }

  test("half-open semantics: lo inclusive, hi exclusive, empty interval matches nothing") {
    val pts = Seq((1L, 30.0), (2L, 31.0), (3L, 0.0)).toDF("pid", "v")
    val got = pairsOf(RangeJoin.joinRange(pts, "v", intervals, "lo", "hi", 16.0))
    assert(got.contains((1L, 3L)))  // v=30 in [30,31)
    assert(!got.contains((2L, 3L))) // v=31 excluded from [30,31)
    assert(!got.exists(_._2 == 2L)) // [0,0) empty
    assert(got.contains((3L, 1L)))  // v=0 in [-20,35.5)
  }

  test("a value inside two overlapping intervals pairs with both") {
    val pts = Seq((9L, 30.5)).toDF("pid", "v")
    val got = pairsOf(RangeJoin.joinRange(pts, "v", intervals, "lo", "hi", 16.0))
    assert(got == Set((9L, 1L), (9L, 3L), (9L, 4L)))
  }
}
