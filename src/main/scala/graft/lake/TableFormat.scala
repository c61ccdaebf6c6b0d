package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Write-path semantics of the reference loader (services/loader/
  * bigquery_manager.py): create / append / overwrite / upsert with additive
  * schema evolution, re-expressed on a Parquet-directory table (no Iceberg
  * jars ship in this build; the trait boundary is where an Iceberg catalog
  * implementation would slot in — `df.writeTo(t).append()` etc. — without
  * touching callers).
  *
  * Semantics preserved from the reference:
  *  - schema evolution is ADDITIVE: new columns append, old rows read NULL
  *    (bigquery_manager.py:27-79 evolve_schema);
  *  - column alignment casts with try_cast and fills missing with NULL
  *    (bigquery_manager.py:220-256 _build_cast_select);
  *  - upsert = delete target rows matching source keys, then insert
  *    (bigquery_manager.py:259-316) — here a left_anti join + union;
  *  - writers never mutate in place: each commit writes a fresh versioned
  *    directory and flips a LAST pointer file, so readers see atomic swaps
  *    (the moral equivalent of the reference's staging->archive move,
  *    loader/cleanup.py:15-46).
  */
trait TableFormat {
  def create(df: DataFrame, table: String): Unit
  def append(df: DataFrame, table: String): Unit
  def overwrite(df: DataFrame, table: String): Unit
  def upsert(df: DataFrame, table: String, keys: Seq[String]): Unit
  def read(spark: SparkSession, table: String): DataFrame
  def exists(table: String): Boolean
}

/** Versioned Parquet-directory table: `<root>/<table>/v<N>/` + `LAST` pointer.
  * Readers resolve the pointer then scan one immutable snapshot directory —
  * writers commit by writing v<N+1> fully, then flipping the pointer (atomic
  * file move). Concurrent readers never see partial data. */
class ParquetDirFormat(root: String) extends TableFormat {

  private def tableDir(table: String): Path = Paths.get(root, table)
  private def pointer(table: String): Path = tableDir(table).resolve("LAST")
  private def partSpecFile(table: String): Path = tableDir(table).resolve("PARTITION")

  /** Partition columns recorded at create time; every later commit rewrites
    * with the same layout so readers always get directory-level pruning. */
  def partitionSpec(table: String): Seq[String] =
    if (!Files.exists(partSpecFile(table))) Seq.empty
    else new String(Files.readAllBytes(partSpecFile(table))).trim match {
      case "" => Seq.empty
      case s => s.split(",").toSeq
    }

  /** Create with a partition layout (e.g. days(created_at) materialized as a
    * date column). Partition pruning on these columns is then automatic for
    * every reader — the property the reference loses by leaving its Iceberg
    * tables unpartitioned (SURVEY §4). */
  def createPartitioned(df: DataFrame, table: String, partitionCols: Seq[String]): Unit = {
    require(!exists(table), s"table already exists: $table")
    Files.createDirectories(tableDir(table))
    Files.write(partSpecFile(table), partitionCols.mkString(",").getBytes)
    commit(df, table)
  }

  private def currentVersion(table: String): Option[Int] =
    if (Files.exists(pointer(table)))
      Some(new String(Files.readAllBytes(pointer(table))).trim.toInt)
    else None

  private def versionDir(table: String, v: Int): Path =
    tableDir(table).resolve(s"v$v")

  override def exists(table: String): Boolean = currentVersion(table).isDefined

  override def read(spark: SparkSession, table: String): DataFrame = {
    val v = currentVersion(table).getOrElse(
      throw new IllegalArgumentException(s"no such table: $table"))
    spark.read.parquet(versionDir(table, v).toString)
  }

  private def commit(df: DataFrame, table: String): Unit = {
    val next = currentVersion(table).getOrElse(-1) + 1
    val dir = versionDir(table, next)
    val writer = df.write.mode(SaveMode.Overwrite)
    val parts = partitionSpec(table)
    (if (parts.nonEmpty) writer.partitionBy(parts: _*) else writer).parquet(dir.toString)
    val tmp = tableDir(table).resolve(s".LAST.tmp$next")
    Files.write(tmp, next.toString.getBytes)
    Files.move(tmp, pointer(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  override def create(df: DataFrame, table: String): Unit = {
    require(!exists(table), s"table already exists: $table")
    commit(df, table)
  }

  /** Align `df` to the union schema of (target, df): existing columns
    * try_cast to the target type, brand-new columns appended (additive
    * evolution), columns absent from `df` read NULL via unionByName. */
  override def append(df: DataFrame, table: String): Unit = {
    if (!exists(table)) { create(df, table); return }
    val spark = df.sparkSession
    val target = read(spark, table)
    val targetTypes = target.schema.map(f => f.name -> f.dataType).toMap
    val aligned = df.select(df.columns.map { c =>
      targetTypes.get(c) match {
        case Some(t) if df.schema(c).dataType != t =>
          expr(s"try_cast($c as ${t.sql})").as(c)
        case _ => col(c)
      }
    }.toSeq: _*)
    commit(target.unionByName(aligned, allowMissingColumns = true), table)
  }

  override def overwrite(df: DataFrame, table: String): Unit = commit(df, table)

  /** Delete-matching-then-insert (reference upsert): rows in the target whose
    * key appears in the source are replaced by the source rows. */
  override def upsert(df: DataFrame, table: String, keys: Seq[String]): Unit = {
    if (!exists(table)) { create(df, table); return }
    val spark = df.sparkSession
    val target = read(spark, table)
    val kept = target.join(df.select(keys.map(col): _*).distinct(), keys, "left_anti")
    commit(kept.unionByName(df, allowMissingColumns = true), table)
  }

  // ---- maintenance (the Iceberg-side operations of the reference stack) ----

  /** Small-file compaction: rewrite the current snapshot into
    * ceil(rows / rowsPerFile) files — the Parquet-dir analogue of Iceberg's
    * rewrite_data_files. Appends accumulate one file set per commit; compact
    * before the file count, not the data size, becomes the scan bottleneck. */
  def compact(spark: SparkSession, table: String, rowsPerFile: Long = 1000000L): Unit = {
    val df = read(spark, table)
    val rows = df.count()
    val nFiles = math.max(1L, (rows + rowsPerFile - 1) / rowsPerFile).toInt
    commit(df.repartition(nFiles), table)
  }

  /** All snapshot versions currently on disk (oldest first). */
  def versions(table: String): Seq[Int] =
    if (!Files.exists(tableDir(table))) Seq.empty
    else {
      val ds = Files.list(tableDir(table))
      try {
        import scala.jdk.CollectionConverters._
        ds.iterator().asScala.map(_.getFileName.toString)
          .filter(_.matches("v\\d+")).map(_.drop(1).toInt).toSeq.sorted
      } finally ds.close()
    }

  /** Snapshot expiration: delete all version directories older than the
    * current pointer (Iceberg's expire_snapshots). Readers pinned to old
    * snapshots lose them — call on a maintenance schedule, not per commit. */
  def expireSnapshots(table: String): Seq[Int] = {
    val cur = currentVersion(table).getOrElse(return Seq.empty)
    val old = versions(table).filter(_ < cur)
    old.foreach { v =>
      val dir = versionDir(table, v)
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(dir)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
    old
  }

  /** Table metadata snapshot: version, files, bytes, rows. */
  def stats(spark: SparkSession, table: String): Map[String, Long] = {
    val v = currentVersion(table).getOrElse(
      throw new IllegalArgumentException(s"no such table: $table"))
    val dir = versionDir(table, v)
    import scala.jdk.CollectionConverters._
    val walk = Files.walk(dir)
    val (nFiles, nBytes) = try {
      val parquets = walk.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet")).toSeq
      (parquets.size.toLong, parquets.map(Files.size).sum)
    } finally walk.close()
    Map("version" -> v.toLong, "data_files" -> nFiles, "bytes" -> nBytes,
      "rows" -> read(spark, table).count())
  }
}
