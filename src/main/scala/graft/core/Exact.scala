package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Helpers that make floating-point aggregates *bitwise reproducible* across
  * engines, so the driver's DuckDB-oracle hash compare passes without tolerance.
  *
  * The test tables carry money/quantity columns as DOUBLE with <= 2 real decimal
  * digits. Summing doubles directly is order-dependent (Spark's partial aggregates
  * add in a different order than DuckDB's), so two correct engines produce
  * different low bits. Casting to DECIMAL first makes the sum exact and
  * associative; casting the exact result back to DOUBLE yields the identical
  * 64-bit value in any engine. Ratios of exact values (sum/count) are then single
  * well-defined double ops — also identical.
  *
  * At 100 TB the same trick is what you'd do anyway: decimal sums don't lose
  * cents, and the cast stays inside whole-stage codegen.
  */
object Exact {
  private val Money: DecimalType = DecimalType(18, 2)
  // Narrower type for multiplicands so double/triple products stay within
  // DECIMAL(38) in both Spark and DuckDB (12+12+1 = 25 digits, 36 for triples).
  private val MoneyN: DecimalType = DecimalType(12, 2)

  /** Exact SUM of a <=2-decimal double column, returned as DOUBLE.
    * DuckDB oracle twin: `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** Exact SUM of a product of two <=2-decimal double columns (e.g. price*(1-disc)).
    * Decimal multiply is exact (scale 4), so the sum is exact.
    * DuckDB twin: `CAST(SUM(CAST(a AS DECIMAL(12,2)) * CAST(b AS DECIMAL(12,2))) AS DOUBLE)`. */
  def dsum2(a: Column, b: Column): Column =
    sum(a.cast(MoneyN) * b.cast(MoneyN)).cast(DoubleType)

  /** Exact SUM of a triple product (price*(1-disc)*(1+tax)) — scale 6, still exact. */
  def dsum3(a: Column, b: Column, c: Column): Column =
    sum(a.cast(MoneyN) * b.cast(MoneyN) * c.cast(MoneyN)).cast(DoubleType)

  /** Reproducible AVG: exact decimal sum cast to double, divided by the count.
    * One double division on identical operands → identical result everywhere.
    * DuckDB twin: `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x)`. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** PARTIAL form of [[dsum]] for incremental view maintenance: the exact
    * decimal sum with NO final double cast, so partials from any batch split
    * re-merge associatively ([[dmergeSum]]) to the bit-identical total a
    * single direct [[dsum]] scan would produce. */
  def dpartSum(c: Column): Column = sum(c.cast(Money))

  /** Merge of [[dpartSum]] partials → the same DOUBLE [[dsum]] returns. */
  def dmergeSum(c: Column): Column = sum(c).cast(DoubleType)
}
