package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.plans.GraftFunctions

/** The native Catalyst expressions must be bitwise-equal to the portable SQL
  * chains the DuckDB oracles evaluate — this is what licenses using them in
  * oracle-checked plans. */
class PortableParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("graft_phash == portable HOF chain on ASCII + CJK + accents") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq("example", "spark sql", "", "a", "部分文字", "Zürich café",
      "😀 astral").toDF("tok")
    val rows = df.select(
      expr("graft_phash(tok)").as("native"),
      expr(Portable.phashSpark("tok")).as("portable")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("graft_tokens == portable HOF chain on edge whitespace shapes") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = (Seq("plain words here", "  leading", "trailing  ", "a  b   c",
      "", " ", "    ", "one", "tab\there stays one token") ++
      graft.core.Tables.documents(spark, TestSpark.sfDir)
        .select("text").collect().map(_.getString(0)).take(50)).toDF("text")
    val rows = df.select(
      expr("graft_tokens(text)").as("native"),
      expr(Portable.tokensSpark("text")).as("portable")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("graft_shingles == array_distinct of the portable HOF chain") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet").limit(100)
    val rows = docs.select(
      expr("graft_shingles(text, 3)").as("native"),
      array_distinct(expr(
        s"CASE WHEN size(${Portable.tokensSpark("text")}) >= 3 THEN " +
          Portable.shinglesSpark(Portable.tokensSpark("text"), 3) +
          s" ELSE array() END")).as("portable")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  /** Edge corpus for the multi-format parse twins: every dispatch family
    * padded and unpadded, dispatch-matching-but-unparseable values, regex
    * backtracking traps (3-digit runs, letter-run boundaries), whitespace
    * shapes, and garbage. */
  private val tsEdgeCorpus = Seq(
    "2023-01-15 10:20:30", "2023-1-5 1:2:3", "2023/01/15 10:20:30",
    "2023/1/5 1:2:3", "1/5/2023 1:2:3", "01/15/2023 10:20:30",
    "1-5-2023 1:2:3", "01-15-2023 10:20:30", "15.01.2023 10:20:30",
    "5.1.2023 1:2:3", "20230115 10:20:30", "Jan 15 2023 10:20:30",
    "Jan 5 2023 1:2:3", "15 Jan 2023 10:20:30", "5 Jan 2023 1:2:3",
    "January 15, 2023 10:20:30", "January 5, 2023 1:2:3",
    // dispatch matches, parse must fail -> NULL in both
    "2023-13-40 99:99:99", "Notamonth 15 2023 10:20:30", "99/99/9999 1:2:3",
    "20230115 10:20", "2023-01-15", "1/5/2023",
    // regex traps: 3-digit runs, digits after the 1-2 digit match, commas
    "123 Jan 2023 1:2:3", "Jan 123 2023 1:2:3", "123/5/2023 1:2:3",
    "January 15 2023 10:20:30", "Jan 15, 2023 10:20:30",
    // whitespace: the ts chain trims before dispatch
    "  2023-01-15 10:20:30  ", " Jan 15 2023 10:20:30", "\t2023-01-15 10:20:30",
    // garbage / empties
    "", " ", "-", "not a date", "2023", "20230115", "ä 5 2023 1:2:3")

  test("graft_ts_multi == portable CASE/rlike chain, bitwise") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = tsEdgeCorpus.toDF("s")
    val rows = df.select(
      expr("graft_ts_multi(s)").as("native"),
      graft.operators.Cleaning.parseTimestampMultiPortable("s").as("portable"),
      col("s")).collect()
    rows.foreach { r =>
      assert(r.get(0) == r.get(1), s"ts mismatch on '${r.getString(2)}'")
    }
  }

  test("graft_date_multi == portable CASE/rlike chain, bitwise") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val dateCorpus = Seq(
      "2023-01-15", "2023-1-5", "1/5/2023", "01/15/2023", "15.01.2023",
      "5.1.2023", "20230115", "2023-13-40", "99/99/9999", "123.5.2023",
      "202301159", "2023011", "1/5/2023 extra", "20230115 ", " 2023-01-15",
      "", " ", "not a date", "15-01-2023")
    val df = dateCorpus.toDF("s")
    val rows = df.select(
      expr("graft_date_multi(s)").as("native"),
      graft.operators.Cleaning.parseDateMultiPortable("s").as("portable"),
      col("s")).collect()
    rows.foreach { r =>
      assert(r.get(0) == r.get(1), s"date mismatch on '${r.getString(2)}'")
    }
  }

  test("graft_dot == fixed-order expression chain, bitwise") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet").limit(50)
    val joined = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("eb")).limit(5))
    val rows = joined.select(
      expr("graft_dot(ea, eb)").as("native"),
      expr(s"(${Portable.dotSpark("ea", "eb")})").as("portable")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }
}
