package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Z-order (Morton-curve) clustering for lake writes — the multi-column data
  * skipping layout of Delta OPTIMIZE ZORDER BY / Iceberg rewrite strategies
  * (public designs; Morton 1966). Sorting a table by one column gives perfect
  * file-level min/max pruning on that column and none on any other; writing in
  * z-value order gives every clustered column a file span of roughly
  * range/2^(bits shared), so a selective predicate on ANY of them skips most
  * files at the parquet-footer level — the difference between scanning 100 TB
  * and scanning the ~sqrt-fraction a 2-D box actually touches.
  *
  * The z-value is computed portably (see [[Portable.zBucketSpark]] /
  * [[Portable.zInterleaveSpark]]): each clustered column is min/max-bucketed
  * into 2^bits ranks and the bucket bits are round-robin interleaved into one
  * BIGINT. Everything is scan-fused integer arithmetic after ONE tiny
  * stats aggregate (a broadcast, never a shuffle); the only exchange is the
  * final `repartitionByRange` on the z-value — exactly the shuffle any
  * cluster-ordered write must pay, sized by `nFiles` to the target file count.
  *
  * Min/max-linear bucketing is deliberate: it is stats-cheap and portable, but
  * a heavily skewed column wastes bucket space around its hot region (the
  * curve still clusters, pruning just degrades toward single-column sorting).
  * For skewed columns pre-rank them (ntile or a quantile lookup) before
  * clustering — the interleave is agnostic to how buckets were assigned.
  */
object ZOrder {

  /** Appends an `outCol` (default `zv`) BIGINT z-value over `cols` (each
    * min/max-bucketed into 2^bits ranks). k*bits must fit a BIGINT
    * sign-free: k*bits <= 62. Refuses a frame already carrying `outCol` —
    * withColumn would silently REPLACE it, destroying user data (a table a
    * z-ordered writer produced legitimately carries `zv`); callers that
    * rewrite such tables pass a collision-free internal name instead (see
    * PartitionedTable.compactZOrdered). */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 16,
                 outCol: String = "zv"): DataFrame = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(cols.size * bits <= 62, s"${cols.size} cols x $bits bits overflows BIGINT")
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column — z-valuing would overwrite it; " +
        "pass a different outCol")
    val aggs = cols.flatMap(c => Seq(min(col(c)).as(s"__zmin_$c"), max(col(c)).as(s"__zmax_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val withBuckets = cols.foldLeft(df.crossJoin(broadcast(stats))) { (acc, c) =>
      acc.withColumn(s"__zb_$c", expr(Portable.zBucketSpark(c, s"__zmin_$c", s"__zmax_$c", bits)))
    }
    withBuckets
      .withColumn(outCol, expr(Portable.zInterleaveSpark(cols.map(c => s"__zb_$c"), bits)).cast("bigint"))
      .drop(cols.flatMap(c => Seq(s"__zmin_$c", s"__zmax_$c", s"__zb_$c")): _*)
  }

  /** Writes `df` clustered on the z-curve over `cols`: range-partitioned by
    * z-value into `nFiles` files, sorted by z-value within each, so parquet
    * footer min/max stats give every clustered column file-level pruning. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    nFiles: Int = 64, bits: Int = 16): Unit =
    withZValue(df, cols, bits)
      .repartitionByRange(nFiles, col("zv"))
      .sortWithinPartitions("zv")
      .write.mode("overwrite").parquet(path)

  /** Per-file min/max spans of `cols` for a written layout — the exact stats
    * a scan's footer pruning consults. A predicate `c BETWEEN lo AND hi` must
    * read the files whose [min_c, max_c] intersects [lo, hi] and may skip the
    * rest; counting intersecting files measures layout quality directly. */
  def fileSpans(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
