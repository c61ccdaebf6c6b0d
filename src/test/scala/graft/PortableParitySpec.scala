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
