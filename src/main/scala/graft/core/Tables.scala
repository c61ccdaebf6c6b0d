package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated test tables (TESTDATA.md): a TPC-H-ish star
  * schema (`region nation customer supplier part orders lineitem`) plus `events`
  * (timestamped stream), `documents` (text corpus) and `embeddings` (vector table).
  *
  * Every query entry in [[graft.SparkEntry]] reads through here so the scan path is
  * uniform: plain parquet scans that Catalyst can push filters/projections into.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** events.parquet has shipped with two `ts` encodings across driver testdata
    * generations: TIMESTAMP(NANOS) (which Spark's parquet reader rejects unless
    * nanos are read as raw longs via the legacy conf) and plain TIMESTAMP(MICROS)
    * NTZ. Sniff the schema after the scan and normalize either shape to
    * TIMESTAMP_NTZ microseconds — lossless for this corpus (every value is an
    * exact microsecond) and NTZ so written results match DuckDB's naive
    * TIMESTAMP rendering byte-for-byte. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case _ =>
        raw.withColumn("ts", expr("cast(ts as timestamp_ntz)"))
    }
  }
  /** Bare scans. The single-row-group fan-out for CPU-dense work lives at the
    * operator entry points ([[graft.operators.Scale.fanOutScan]] call sites in
    * Dedup/Similarity/TextOps), NOT here: a cheap consumer (one md5
    * hash-aggregate) should not pay an exchange, and table load should not
    * force physical planning. */
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
