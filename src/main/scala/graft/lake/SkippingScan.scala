package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** One lakehouse read composing the full file-skipping TRIAD a real query
  * uses together on one table (reference: pmgraham/biglake-iceberg-pipeline
  * terraform/bigquery_tables.tf:97-116 declares Iceberg tables whose manifests
  * carry partition values and column bounds; BigQuery's engine applies the
  * analogous pruning server-side — this is the engine half, from scratch):
  *
  *  - the PARTITION predicate prunes at the manifest ([[PartitionedTable
  *    .partitionFiles]] — exact by construction, no re-filter needed);
  *  - the RANGE predicate prunes by per-file min/max ([[ZoneMapIndex]]);
  *  - the POINT predicate prunes by per-file Bloom filters ([[BloomIndex]]).
  *
  * The three candidate lists INTERSECT before any data file opens — each
  * index alone keeps a superset, so the intersection still keeps every file
  * that can contain a matching row, and the final exact re-filter clears the
  * remaining slack (zone-map string truncation, Bloom false positives).
  * All three lists are file-manifest-sized driver work — the same budget the
  * scheduler itself spends listing a table — so at 100 TB / ~1M files the
  * win is that the FILE LIST shrinks before the scan is even planned.
  *
  * File identity: the sidecars key files by `input_file_name()` URIs while
  * the manifest lists Hadoop paths — both normalize to the URI path
  * component here, so the intersection never misses on a scheme prefix. */
object SkippingScan {

  private def pathOf(s: String): String = LakePaths.pathOf(s)

  /** Candidate files for (partition pred) AND (rangeCol in [lo, hi]) AND
    * (pointCol IN points) — the pruning decision alone, exposed so tests and
    * callers can assert how much the triad skipped without scanning. */
  def candidateFiles(spark: SparkSession, table: PartitionedTable, t: String,
                     partPred: Map[String, String] => Boolean,
                     zoneIdx: DataFrame, rangeCol: String,
                     lo: Option[Any], hi: Option[Any],
                     bloomIdx: DataFrame, pointCol: String,
                     points: Seq[Any]): Seq[String] = {
    // the URI path KEYS the intersection only; what comes back out is the
    // manifest's ORIGINAL string — a scheme-stripped path handed to the scan
    // would re-resolve against the default filesystem, reading the wrong
    // file (or nothing) on exactly the remote-lake deployments this is for
    val part = table.partitionFiles(t, partPred).map(f => pathOf(f) -> f).toMap
    val zone = ZoneMapIndex.candidateFiles(zoneIdx, rangeCol, lo, hi).map(pathOf).toSet
    val bloom = BloomIndex.candidateFiles(spark, bloomIdx, points).map(pathOf).toSet
    part.collect { case (k, orig) if zone(k) && bloom(k) => orig }.toSeq.sorted
  }

  /** The composed read: open ONLY the triad's candidate files, then re-apply
    * the exact range + point predicates (the partition predicate needs no
    * re-filter — directory membership is exact). An empty candidate set
    * reads nothing and returns an empty frame with the table schema. */
  def scan(spark: SparkSession, table: PartitionedTable, t: String,
           partPred: Map[String, String] => Boolean,
           zoneIdx: DataFrame, rangeCol: String, lo: Option[Any], hi: Option[Any],
           bloomIdx: DataFrame, pointCol: String, points: Seq[Any],
           schema: StructType): DataFrame = {
    val files = candidateFiles(spark, table, t, partPred,
      zoneIdx, rangeCol, lo, hi, bloomIdx, pointCol, points)
    val base =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files: _*)
    val lowOk = lo.map(v => col(rangeCol) >= lit(v)).getOrElse(col(rangeCol).isNotNull)
    val hiOk = hi.map(v => col(rangeCol) <= lit(v)).getOrElse(col(rangeCol).isNotNull)
    val pointOk =
      if (points.isEmpty) lit(false)
      else col(pointCol).cast("string").isin(points.map(_.toString): _*)
    base.filter(lowOk && hiOk && pointOk)
  }
}
