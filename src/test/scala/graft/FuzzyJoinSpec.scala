package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def join(a: Seq[(Long, String)], b: Seq[(Long, String)], d: Int) =
    FuzzyJoin.fuzzyJoin(a.toDF("id", "s"), b.toDF("id", "s"),
      "id", "s", "id", "s", maxDist = d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet

  test("matches within maxDist, excludes beyond it") {
    val clean = Seq(1L -> "jonathan", 2L -> "margaret", 3L -> "william")
    val dirty = Seq(
      10L -> "jonathan",  // dist 0
      11L -> "jonatan",   // deletion, dist 1
      12L -> "margret",   // deletion, dist 1
      13L -> "wiliam",    // deletion, dist 1
      14L -> "wilhelmina")// dist > 2 from everything
    assert(join(clean, dirty, 2) ==
      Set((1L, 10L, 0), (1L, 11L, 1), (2L, 12L, 1), (3L, 13L, 1)))
    // tighter budget drops nothing here but a zero budget keeps only exact
    assert(join(clean, dirty, 0) == Set((1L, 10L, 0)))
  }

  test("substitution and insertion edits are found, not just deletions") {
    val res = join(Seq(1L -> "spark"), Seq(
      20L -> "spork",   // substitution
      21L -> "sparka",  // insertion
      22L -> "speark"), // insertion mid-string
      1)
    assert(res == Set((1L, 20L, 1), (1L, 21L, 1), (1L, 22L, 1)))
  }

  test("contract edge: pairs sharing no bigram are missed, short strings never match") {
    // "ab" -> "ba" is distance 2 but shares no bigram: documented miss
    assert(join(Seq(1L -> "ab"), Seq(2L -> "ba"), 2).isEmpty)
    // single-char strings have no bigrams at all
    assert(join(Seq(1L -> "a"), Seq(2L -> "a"), 0).isEmpty)
  }

  test("length band prunes before levenshtein") {
    // shares bigram "ka" but lengths differ by 3 > maxDist
    assert(join(Seq(1L -> "kate"), Seq(2L -> "katerina"), 2).isEmpty)
  }
}
