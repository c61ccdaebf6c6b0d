package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.normalize.{ColumnNameNormalizer, OverflowRepair}

class NormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("camelCase expansion, punctuation, digits") {
    val n = ColumnNameNormalizer.normalizeName _
    assert(n("firstName") == "first_name")
    assert(n("HTTPResponseCode") == "http_response_code")
    assert(n("Order ID") == "order_id")
    assert(n("total$amount!!") == "total_amount")
    assert(n("123abc") == "c_123abc")
    assert(n("___") == "col")
  }

  test("duplicate names get ordered suffixes") {
    assert(ColumnNameNormalizer.normalizeAll(Seq("a", "A", "a ")) ==
      Seq("a", "a_1", "a_2"))
    // a suffixed name must not collide with a later column's own name
    assert(ColumnNameNormalizer.normalizeAll(Seq("a", "a", "a_1")) ==
      Seq("a", "a_1", "a_1_1"))
    assert(ColumnNameNormalizer.normalizeAll(Seq("a", "a", "a_1")).distinct.size == 3)
  }

  test("property: normalization is idempotent and lowercase-snake") {
    val prop = Prop.forAll(Gen.asciiPrintableStr) { s =>
      val once = ColumnNameNormalizer.normalizeName(s)
      ColumnNameNormalizer.normalizeName(once) == once &&
        once.matches("[a-z0-9_]+") && !once.head.isDigit
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("overflow repair drops trailing phantom columns and flags spills") {
    import spark.implicits._
    val df = Seq(
      ("a", "b", null, null),
      ("c", "d", null, "spill"),
      ("e", "f", null, null),
      ("g", "h", null, null),
      ("i", "j", null, null)).toDF("c1", "c2", "p1", "p2")
    val out = OverflowRepair.repair(df, 0.8)
    assert(out.columns.toSeq == Seq("c1", "c2", "is_shifted"))
    val flagged = out.filter(org.apache.spark.sql.functions.col("is_shifted")).count()
    assert(flagged == 1)
  }
}
