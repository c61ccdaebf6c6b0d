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

  test("hot-bigram df-cap bounds candidates, matches unchanged") {
    // Stopword-bigram corpus: every string opens with the boilerplate
    // "xqname" (5 bigrams at combined df 160 -> 5 * 80 * 80 candidate rows
    // when unguarded). The suffix is a repetition code c1 c1 c2 c2 over
    // disjoint alphabets, so (a) non-aligned pairs differ in >= 2 positions
    // -> edit distance >= 2 -> outside maxDist=1, and (b) every aligned pair
    // shares its unique c1c2 bigram (df 2, far under the cap) — the capped
    // join must therefore find exactly the same 80 matches.
    def s(i: Long): String = {
      val c1 = ('a' + i / 10).toChar; val c2 = ('A' + i % 10).toChar
      s"xqname$c1$c1$c2$c2"
    }
    val left  = (0L until 80L).map(i => i -> s(i))
    val right = (0L until 80L).map(i => (1000L + i) -> s(i))
    val (a, b) = (left.toDF("id", "s"), right.toDF("id", "s"))
    def cand(cap: Int) = graft.operators.FuzzyJoin
      .candidates(a, b, "id", "s", "id", "s", 1, cap).count()
    val unguarded = cand(0)
    val capped = cand(20)
    // the hot boilerplate bigrams alone contribute 80*80 rows each unguarded
    assert(unguarded > 6400, s"corpus not hot enough: $unguarded")
    assert(capped < unguarded / 4, s"cap did not bound candidates: $capped vs $unguarded")
    def matches(cap: Int) = graft.operators.FuzzyJoin
      .fuzzyJoin(a, b, "id", "s", "id", "s", maxDist = 1, dfCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matches(20) == matches(0))
    assert(matches(20).size >= 80) // every aligned pair found (dist 0)
  }

  test("length band prunes before levenshtein") {
    // shares bigram "ka" but lengths differ by 3 > maxDist
    assert(join(Seq(1L -> "kate"), Seq(2L -> "katerina"), 2).isEmpty)
  }
}
