package graft

import org.scalatest.funsuite.AnyFunSuite
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
