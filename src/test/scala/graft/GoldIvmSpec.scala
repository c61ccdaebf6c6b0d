package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{Exact, Tables}
import graft.lake.ParquetDirFormat
import graft.queries.Gold

/** Incremental view maintenance for the daily-sales gold view: batch
  * summary-delta partials appended to a REAL lake table fold to the exact
  * report a full recompute produces, and micro-batch replays (the
  * foreachBatch redelivery case) stay idempotent because each batch upserts
  * its own keyed rows. */
class GoldIvmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def batchPartials(b: Int) =
    Tables.orders(spark, dir)
      .withColumn("order_date", to_date(col("o_orderdate")))
      .filter(pmod(col("o_orderkey"), lit(8L)) === b)
      .groupBy("order_date", "o_custkey")
      .agg(count(lit(1)).as("pn"), Exact.dpartSum(col("o_totalprice")).as("prev"))
      .withColumn("batch", lit(b))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("order_date", "n_orders", "revenue", "n_customers",
        "avg_order_value", "new_customers")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getLong(5)))
      .toSet

  test("lake-appended batch partials fold to the direct recompute; replay is idempotent") {
    val tmp = java.nio.file.Files.createTempDirectory("gold_ivm").toString
    val lake = new ParquetDirFormat(tmp)
    (0 until 8).foreach { b =>
      lake.upsert(batchPartials(b), "sales_partials",
        Seq("batch", "order_date", "o_custkey"))
    }
    val direct = rows(Gold.dailySales(spark, dir))
    assert(rows(Gold.foldDailySummary(lake.read(spark, "sales_partials"))) == direct,
      "maintained view diverged from the full recompute")

    // foreachBatch redelivery: batch 3 lands a second time — its upsert
    // replaces its own keyed rows, so the fold is unchanged
    lake.upsert(batchPartials(3), "sales_partials",
      Seq("batch", "order_date", "o_custkey"))
    assert(rows(Gold.foldDailySummary(lake.read(spark, "sales_partials"))) == direct,
      "replayed batch double-counted")

    // the summary state is (day, customer)-sized, not order-sized: the
    // incremental state must not grow with batch count
    val partialRows = lake.read(spark, "sales_partials").count()
    val orderRows = Tables.orders(spark, dir).count()
    assert(partialRows <= orderRows,
      s"partial table ($partialRows rows) larger than the fact table ($orderRows)")
  }

  test("gate query equals the plain dailySales report bitwise") {
    assert(rows(Gold.dailySalesIncremental(spark, dir)) == rows(Gold.dailySales(spark, dir)))
  }

  test("retraction fold: a fully-cancelled (day, customer) vanishes; an empty day disappears") {
    import spark.implicits._
    // base: two customers on d1, one on d2; feed retracts ALL of customer
    // 20's d1 orders and BOTH of customer 30's d2 orders
    val base = Seq(
      ("2024-01-01", 10L, 2L, BigDecimal("100.00")),
      ("2024-01-01", 20L, 1L, BigDecimal("50.00")),
      ("2024-01-02", 30L, 2L, BigDecimal("80.00")))
      .toDF("order_date", "o_custkey", "pn", "prev")
      .withColumn("order_date", col("order_date").cast("date"))
      .withColumn("prev", col("prev").cast("decimal(18,2)"))
    val feed = Seq(
      ("2024-01-01", 20L, -1L, BigDecimal("-50.00")),
      ("2024-01-02", 30L, -2L, BigDecimal("-80.00")))
      .toDF("order_date", "o_custkey", "pn", "prev")
      .withColumn("order_date", col("order_date").cast("date"))
      .withColumn("prev", col("prev").cast("decimal(18,2)"))
    val got = Gold.foldDailySummary(base.unionByName(feed), retractions = true)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(5))).toSet
    // d1 keeps only customer 10 (2 orders, 100.00, 1 customer, 1 new);
    // d2 has no surviving rows at all — no report row, and customer 30
    // contributes no first-day minimum anywhere
    assert(got == Set(("2024-01-01", 2L, 100.0, 1L, 1L)))
    // without the filter the cancelled pairs would still count customers —
    // the fully-empty day even divides by zero under ANSI (n_orders = 0),
    // which is exactly why the retraction fold must drop dead pairs
    intercept[ArithmeticException](
      Gold.foldDailySummary(base.unionByName(feed)).collect())
  }
}
