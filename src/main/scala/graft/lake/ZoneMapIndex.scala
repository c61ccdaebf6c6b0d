package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Per-file min/max zone-map sidecar for RANGE file skipping — the
  * manifest-stats layer of an Iceberg-style lake (reference:
  * pmgraham/biglake-iceberg-pipeline terraform/bigquery_tables.tf:97-116
  * declares Iceberg tables whose manifests carry exactly these bounds; no
  * engine-side analogue exists there — this is a beyond-reference scale
  * component). Completes the file-skipping triad:
  *
  *  - partition pruning ([[TableFormat]]) — coarse, by partition value;
  *  - [[BloomIndex]] — point lookups on high-cardinality unclustered ids;
  *  - zone maps (this) — RANGE predicates, where a Bloom filter is blind.
  *
  * Why above-parquet: row-group footer stats prune ranges too, but only
  * AFTER the scheduler has listed, opened and footer-read every file. At
  * 100 TB / ~1M files the win is pruning the FILE LIST driver-side from an
  * index that is files-sized, not data-sized — same argument as the Bloom
  * sidecar, for the orderable columns you did not cluster by.
  *
  * Bounds are stored IN THE COLUMN'S OWN TYPE (one sidecar row per file,
  * a `<col>__min`/`<col>__max`/`<col>__nulls` triple per indexed column),
  * so pruning comparisons are exact — no double rounding on int64 keys, no
  * collation surprises on strings. Long strings are truncated the way
  * Iceberg truncates manifest bounds: lower bounds truncate to a prefix
  * (always a valid lower bound); upper bounds truncate and INCREMENT the
  * last kept code unit — if no code unit below U+FFFF exists to increment,
  * the full string is kept (correctness first, width second).
  *
  * Superset guarantee: a file that contains a row matching the range always
  * survives [[candidateFiles]]; false survivors only cost file opens —
  * [[rangeScan]] re-applies the exact predicate. Rows whose indexed column
  * is NULL never match a range predicate, so all-null files prune away.
  */
object ZoneMapIndex {

  /** Iceberg-style upper-bound truncation (see Iceberg spec §Appendix D,
    * "Single-value serialization... truncate(L, s)"): keep `maxLen` code
    * units, then increment the last one that is < U+FFFF and drop the rest;
    * None when every kept unit is U+FFFF (no safe short upper bound). */
  private[graft] def truncatedUpper(s: String, maxLen: Int): Option[String] = {
    if (s.length <= maxLen) return Some(s)
    val prefix = s.substring(0, maxLen).toCharArray
    var i = prefix.length - 1
    while (i >= 0 && prefix(i) == '\uFFFF') i -= 1
    if (i < 0) None
    else Some(new String(prefix, 0, i) + (prefix(i) + 1).toChar)
  }

  private def boundCols(df: DataFrame, c: String, maxStrLen: Int): Seq[Column] = {
    val isStr = df.schema(c).dataType == StringType
    val lower =
      if (isStr) substring(min(col(c)), 1, maxStrLen)
      else min(col(c))
    val upper =
      if (isStr) {
        val fn = udf((s: String) =>
          if (s == null) null else truncatedUpper(s, maxStrLen).getOrElse(s))
        fn(max(col(c)))
      } else max(col(c))
    Seq(lower.as(s"${c}__min"), upper.as(s"${c}__max"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).cast("bigint").as(s"${c}__nulls"))
  }

  /** Build the sidecar from a file-backed scan: ONE pass, grouped by the
    * file each row physically lives in, with map-side-combined min/max —
    * shuffle carries files x columns bound pairs, never data. The string
    * `udf` sits on the files-sized AGGREGATED frame (post-shuffle, one value
    * per file), not in the row-scan hot path. */
  def build(table: DataFrame, cols: Seq[String], maxStrLen: Int = 32): DataFrame = {
    require(cols.nonEmpty, "index at least one column")
    require(maxStrLen >= 1, "maxStrLen must be >= 1")
    cols.foreach { c =>
      val dt = table.schema(c).dataType
      require(org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt),
        s"zone maps need an orderable column; $c is ${dt.sql}")
    }
    val aggs = count(lit(1)).cast("bigint").as("rows") +:
      cols.flatMap(boundCols(table, _, maxStrLen))
    table.select((input_file_name().as("file") +: cols.map(col)): _*)
      .groupBy("file")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental sidecar maintenance after appends/compaction — the index
    * stays per-file, so freshness is SET algebra, no retrain: rows for
    * files no longer in the table drop (compaction rewrote them), files the
    * sidecar has stay untouched, and ONLY missing files are read and
    * profiled (the append increment, not the table). The missing-file list
    * is collected driver-side — file-manifest-sized, the same budget the
    * scheduler itself spends listing the table. */
  def refresh(table: DataFrame, index: DataFrame, cols: Seq[String],
              maxStrLen: Int = 32): DataFrame = {
    val spark = table.sparkSession
    val present = table.select(input_file_name().as("file")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kept = index.join(present, Seq("file"), "left_semi")
    val missing = present
      .join(index.select("file").distinct(), Seq("file"), "left_anti")
      .collect().map(_.getString(0))
    present.unpersist()
    if (missing.isEmpty) kept
    else kept.unionByName(
      build(spark.read.schema(table.schema).parquet(missing.toIndexedSeq: _*),
        cols, maxStrLen))
  }

  /** Files that MIGHT contain a row with `c` in [lo, hi] (either bound
    * optional; both-None means "any non-null value"). Index-sized work; the
    * comparison runs in the column's own type. A file survives iff it has
    * any non-null value (nulls < rows) and its bounds overlap the range. */
  def candidateFiles(index: DataFrame, c: String,
                     lo: Option[Any], hi: Option[Any]): Seq[String] = {
    val hasValue = col(s"${c}__nulls") < col("rows")
    val lowOk = lo.map(v => col(s"${c}__max") >= lit(v)).getOrElse(lit(true))
    val hiOk = hi.map(v => col(s"${c}__min") <= lit(v)).getOrElse(lit(true))
    index.filter(hasValue && lowOk && hiOk)
      .select("file").distinct()
      .collect().map(_.getString(0)).toSeq
  }

  /** Sideways-information-passing scan for a key-range-bounded JOIN (the
    * zone-map analogue of dynamic partition pruning / a runtime min-max
    * filter): fold the BUILD side's join keys to [min, max] — a two-value
    * aggregate, metadata-sized by construction — and open only the probe
    * files whose zone overlaps that range. Semantics-preserving for an
    * inner equi-join: every build key lies inside [min, max], so the exact
    * range re-filter [[rangeScan]] applies can never drop a matching probe
    * row; false survivors are removed by the join itself. Pays off when the
    * probe layout is clustered on the join key (Z-order / range-partitioned
    * writes) and the build side is a bounded cohort — the common
    * "small dim slice vs huge clustered fact" shape. Empty build side reads
    * nothing.
    *
    * COST NOTE: unlike Spark's lazily-planned dynamic partition pruning this
    * analogizes to, the bounds fold is an EAGER action at call time — the
    * full build side runs here even if the returned frame is never consumed.
    * Call it only when the result is definitely used. */
  def keyBoundsPruneScan(index: DataFrame, c: String,
                         buildKeys: DataFrame, buildKeyCol: String,
                         schema: StructType): DataFrame = {
    val spark = buildKeys.sparkSession
    val b = buildKeys.agg(min(col(buildKeyCol)), max(col(buildKeyCol))).head()
    if (b.isNullAt(0))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else rangeScan(spark, index, c, Some(b.get(0)), Some(b.get(1)), schema)
  }

  /** Range read through the index: open only candidate files, then re-apply
    * the EXACT predicate (clears truncation slack and bound overlap). An
    * empty candidate set reads nothing. */
  def rangeScan(spark: SparkSession, index: DataFrame, c: String,
                lo: Option[Any], hi: Option[Any], schema: StructType): DataFrame = {
    val files = candidateFiles(index, c, lo, hi)
    val base =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files: _*)
    val lowOk = lo.map(v => col(c) >= lit(v)).getOrElse(col(c).isNotNull)
    val hiOk = hi.map(v => col(c) <= lit(v)).getOrElse(col(c).isNotNull)
    base.filter(lowOk && hiOk)
  }
}
