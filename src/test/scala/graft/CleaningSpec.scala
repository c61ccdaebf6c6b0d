package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Cleaning, Coercion}

class CleaningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  private def strDf(vals: (java.lang.Long, String)*): DataFrame = {
    import spark.implicits._
    vals.toDF("id", "v")
  }

  test("protocol order: mojibake -> trim -> empty -> sentinel") {
    val df = strDf((1L, "  CafÃ©  "), (2L, "  N/A "), (3L, "   "), (4L, " ok "),
      (5L, null))
    val out = df.select(col("id"), Cleaning.protocol(col("v")).as("v")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains("Café"))
    assert(out(2L).isEmpty)   // sentinel
    assert(out(3L).isEmpty)   // empty after trim
    assert(out(4L).contains("ok"))
    assert(out(5L).isEmpty)
  }

  test("gender expansion and state format") {
    val df = strDf((1L, " m "), (2L, "FEMALE"), (3L, "nonbinary"), (4L, "ny"),
      (5L, "new york"))
    val g = df.select(col("id"), Cleaning.genderExpand(col("v")).as("g")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(g(1L) == "Male" && g(2L) == "Female" && g(3L) == "Nonbinary")
    val s = df.select(col("id"), Cleaning.stateFormat(col("v")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s(4L) == "NY" && s(5L) == "New York")
  }

  test("currency extraction") {
    val df = strDf((1L, "$12.50"), (2L, "EUR 9.99"), (3L, "£5.00"), (4L, "¥700.00"),
      (5L, "42.00"), (6L, "bad"))
    val out = df.select(col("id"),
      Cleaning.currencyCode(col("v")).as("code"),
      Cleaning.currencyValue("v").as("value")).collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), Option(r.get(2)))).toMap
    assert(out(1L) == (Some("USD"), Some(12.5)))
    assert(out(2L) == (Some("EUR"), Some(9.99)))
    assert(out(3L) == (Some("GBP"), Some(5.0)))
    assert(out(4L) == (Some("JPY"), Some(700.0)))
    assert(out(5L) == (None, Some(42.0)))
    assert(out(6L) == (None, None))
  }

  test("multi-format date parse") {
    val df = strDf((1L, "2024-03-07"), (2L, "3/7/2024"), (3L, "07.03.2024"),
      (4L, "20240307"), (5L, "not a date"))
    val out = df.select(col("id"), Cleaning.dateStandardize("v").as("d")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    (1L to 4L).foreach(i => assert(out(i).contains("2024-03-07"), s"row $i"))
    assert(out(5L).isEmpty)
  }

  test("city/state split takes the last token as state") {
    val df = strDf((1L, "Memphis TN"), (2L, " New York NY "), (3L, "Houston"))
    val out = df.select(col("id"),
      Cleaning.citySplit(col("v")).as("city"),
      Cleaning.stateSplit(col("v")).as("state")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L) == ("Memphis", "TN"))
    assert(out(2L) == ("New York", "NY"))
    assert(out(3L) == ("Houston", "Houston")) // single token: regex strips nothing, token is also the "state"
  }

  test("flagDuplicates keeps first by order column") {
    import spark.implicits._
    val df = Seq((1L, "a", "x"), (2L, "a", "x"), (3L, "b", "y"))
      .toDF("rid", "c1", "c2")
    val out = Cleaning.flagDuplicates(df, "rid").collect()
      .map(r => r.getAs[Long]("rid") -> r.getAs[Boolean]("is_duplicate_in_file")).toMap
    assert(!out(1L) && out(2L) && !out(3L))
  }

  test("dropHighNullColumns drops >90%-null column") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, if (i <= 5) "rare" else null, "keep"))
      .toDF("id", "mostly_null", "full")
    val out = Cleaning.dropHighNullColumns(df, 0.9)
    assert(out.columns.toSet == Set("id", "full"))
  }

  test("evidence-based coercion tightens only confident columns") {
    import spark.implicits._
    val df = Seq(
      ("1", "1.5", "2024-01-01", "true", "mixed"),
      ("2", "2.5", "2024-01-02", "false", "3"),
      ("3", "x", "2024-01-03", "true", "words")).toDF("i", "d", "dt", "b", "s")
    val out = Coercion.coerce(df, threshold = 0.9)
    val types = out.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("i") == "bigint")
    assert(types("dt") == "date")
    assert(types("b") == "boolean")
    assert(types("d") == "string") // 2/3 castable-double < 90%
    assert(types("s") == "string")
  }

  test("date regex dispatch is COALESCE-equivalent on valid, invalid, and junk input") {
    import spark.implicits._
    // formats are parse-exclusive (separators differ), so coalesce order is
    // irrelevant — passing the REVERSED format list forces the coalesce code
    // path while describing the same function the dispatch must equal
    val inputs = Seq(
      "2025-08-12", "2025-8-3",            // ISO padded/unpadded
      "8/12/2025", "12/8/2025", "1/2/2025",// US slash
      "12.08.2025", "3.1.2025",            // dotted European
      "20250812",                          // compact
      "9999-99-99", "99/99/2025", "32.13.2025", "99999999", // shape ok, value bad
      "2025/08/12", "aug 12 2025", "", "  ", "garbage", "123", "2025-08-12T00:00:00")
    val df = inputs.toDF("s")
      .withColumn("dispatch", Cleaning.parseDateMulti("s"))
      .withColumn("coalesced",
        Cleaning.parseDateMulti("s", Cleaning.DateFormats.reverse))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"dispatch/coalesce disagree on '${r.getString(0)}': ${r.get(1)} vs ${r.get(2)}")
    }
    // the valid shapes parsed; unpadded ISO/dotted forms do NOT (the
    // reference's yyyy-MM-dd / dd.MM.yyyy patterns are strict two-digit —
    // only M/d/yyyy tolerates unpadded), and bad-value/junk rows are NULL
    val parsed = rows.filter(_.get(1) != null).map(_.getString(0)).toSet
    assert(parsed == Set("2025-08-12", "8/12/2025", "12/8/2025",
      "1/2/2025", "12.08.2025", "20250812"))
  }

  test("PII redaction: all categories masked, counts attribute to first match") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail bob@x.com and +1-555-123-4567 then 123-45-6789 at 10.1.2.3"),
      (2L, "no pii here"),
      (3L, "two mails a@b.co c@d.org"),
      // '10.1.2.3' is not a valid email host (TLD must be alphabetic), so the
      // dotted quad is attributed to the IP category, not swallowed by email
      (4L, "host user@10.1.2.3 pinged")
    ).toDF("id", "t")
    val red = df.select(col("id"), Cleaning.redactPii(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(1L) == "mail [EMAIL] and [PHONE] then [SSN] at [IP]")
    assert(red(2L) == "no pii here")
    assert(red(3L) == "two mails [EMAIL] [EMAIL]")
    assert(red(4L) == "host user@[IP] pinged")
    val counts = df.select(col("id") +:
        Cleaning.piiCounts(col("t")).map { case (c, n) => n.as(c) }: _*)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(counts(1L) == ((1L, 1L, 1L, 1L)))
    assert(counts(2L) == ((0L, 0L, 0L, 0L)))
    assert(counts(3L) == ((2L, 0L, 0L, 0L)))
    assert(counts(4L) == ((0L, 0L, 0L, 1L)))
    // a phone's dashed digit run must not double-count as an SSN: the mask
    // applied between counts removes the digits before the SSN pattern runs
  }
}
