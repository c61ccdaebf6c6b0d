package graft.pipeline

import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.TableFormat
import graft.normalize.{ColumnNameNormalizer, OverflowRepair}
import graft.operators.{Cleaning, Coercion}
import graft.sources.{DelimiterDetector, FormatDetector, Formats, Readers}

/** Per-file processing status, rank-monotonic like the reference's Firestore
  * ledger (services/logger/main.py:14-19 STATUS_RANK): a file's status can
  * only move forward; replayed/out-of-order events cannot regress it. */
object Status {
  /** 'failed' ranks BELOW 'loaded' and ties with 'cleaned': failure is a
    * retryable state, and the fold resolves rank ties toward the newer
    * record, so a successful retry overwrites an earlier failure while a
    * stray late failure can never regress a completed load. */
  val Rank: Map[String, Int] = Map(
    "received" -> 0, "cleaned" -> 1, "failed" -> 1, "loaded" -> 2)
}

final case class FileRecord(fileHash: String, path: String, table: String,
                            status: String, rows: Long)

/** Driver-side idempotency ledger (reference: loader/main.py:44-46 +
  * logger rank-monotonic upsert). File-level state is tiny — thousands of
  * entries, not data — so it lives in a compact JSONL the driver owns; the
  * DATA path stays fully distributed. */
class Ledger(path: String) {
  private val file = Paths.get(path)

  def all(): Map[String, FileRecord] =
    if (!Files.exists(file)) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      val entries = Files.readAllLines(file).asScala.flatMap { ln =>
        ln.split("\t", -1) match {
          case Array(h, p, t, s, r) => Some(FileRecord(h, p, t, s, r.toLong))
          case _ => None
        }
      }.toSeq
      // last-wins per hash, but rank-monotonic
      entries.foldLeft(Map.empty[String, FileRecord]) { (m, r) =>
        m.get(r.fileHash) match {
          case Some(prev) if Status.Rank(prev.status) > Status.Rank(r.status) => m
          case _ => m + (r.fileHash -> r)
        }
      }
    }

  def record(r: FileRecord): Unit = {
    val line = s"${r.fileHash}\t${r.path}\t${r.table}\t${r.status}\t${r.rows}\n"
    Files.write(file, line.getBytes,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }

  def isLoaded(fileHash: String): Boolean =
    all().get(fileHash).exists(_.status == "loaded")

  /** Per-table routing aggregates — the reference logger's table_routing doc
    * (services/logger/main.py:157-190): files/rows loaded counters plus
    * first/last-load markers per target table, maintained there as Firestore
    * transactional increments on LOADER_BIGQUERY_COMPLETE. Here they are a
    * one-line groupBy over the rank-folded ledger view: only files whose
    * final status is 'loaded' count (received/failed/cleaned files are
    * in-flight or dead, and a stray late event can never regress a load —
    * [[all]]'s monotonic fold guarantees it before aggregation). First/last
    * markers use the lexicographic min/max load path, the deterministic
    * stand-in for the reference's wall-clock first_load_at/last_load_at.
    * Ledger state is driver-sized (thousands of files, not data), so the
    * frame is built from the folded map directly. */
  def tableRouting(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val loaded = all().values.filter(_.status == "loaded").toSeq
    loaded.toDF()
      .groupBy(col("table").as("table_name"))
      .agg(
        count(lit(1)).cast("bigint").as("total_files_loaded"),
        sum(col("rows")).cast("bigint").as("total_rows_loaded"),
        min(col("path")).as("first_load_path"),
        max(col("path")).as("last_load_path"))
  }
}

/** The reference's event-driven file pipeline, end to end
  * (services/data-cleaning-agent/main.py:93-236 + loader): detect format ->
  * raw all-VARCHAR load with the atomic row-count guarantee -> normalize
  * column names -> overflow repair -> drop empty rows -> evidence-based
  * coercion -> string cleaning protocol -> processed_at stamp -> duplicate
  * flag -> append into the lake table. Exactly-once per file content via
  * sha256 + the ledger.
  */
object FilePipeline {

  def fileHash(path: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.update(Files.readAllBytes(Paths.get(path)))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Load a raw file into an all-string DataFrame by detected format. Text
    * formats go through encoding recovery first (reference ensure_utf8,
    * file_detector.py:127-165): BOM/UTF-16/Windows-1252 inputs are transcoded
    * to clean UTF-8 before parsing.
    *
    * CSV follows the reference's fast-path-first control flow
    * (tools/ingestion.py:915-920, 1028-1074): the strict atomic load runs
    * first; only a file that fails it pays for the multi-strategy scored
    * recovery parse ([[graft.sources.CsvRecovery]]). JSON always goes through
    * the validate/repair path ([[graft.sources.JsonRepair]]) because Spark's
    * permissive reader silently drops malformed JSONL lines — the exact row
    * loss the reference's atomic guarantee forbids. */
  def loadRaw(spark: SparkSession, path: String): DataFrame =
    FormatDetector.detect(path) match {
      case Formats.Csv | Formats.Tsv =>
        val utf8 = graft.sources.Encoding.ensureUtf8(path).toString
        val sep = DelimiterDetector.detectFile(spark, utf8)
        // only the atomic guarantee's deliberate failure routes to recovery;
        // infrastructure errors (missing file, FS faults) must surface as-is
        try Readers.atomicCsv(spark, utf8, sep = sep.toString)
        catch {
          case _: IllegalStateException =>
            graft.sources.CsvRecovery.recover(spark, utf8, sep = sep.toString)
        }
      case Formats.Json | Formats.Jsonl =>
        graft.sources.JsonRepair.loadAtomic(
          spark, graft.sources.Encoding.ensureUtf8(path).toString)
      case Formats.Parquet => Readers.parquet(spark, path)
      case Formats.Excel => graft.sources.Excel.read(spark, path)
      case f => throw new IllegalArgumentException(s"unsupported format $f for $path")
    }

  final case class Result(fileHash: String, status: String, rows: Long,
                          skipped: Boolean, quarantinedRows: Long = 0L)

  /** Quarantine table name for overflow-shifted rows. */
  def quarantineTable(table: String): String = s"${table}_quarantine"

  /** Archive a processed inbox file (reference loader/cleanup.py:15-46
    * inbox -> archive move + staging delete): atomic same-volume rename. A
    * transcoded `.utf8` sibling left by [[graft.sources.Encoding.ensureUtf8]]
    * is derived data — deleted so the inbox drains completely. */
  def archive(path: String, archiveDir: String): java.nio.file.Path = {
    val src = Paths.get(path)
    val dir = Paths.get(archiveDir)
    Files.createDirectories(dir)
    Files.deleteIfExists(src.resolveSibling(src.getFileName.toString + ".utf8"))
    Files.move(src, dir.resolve(src.getFileName),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def processFile(spark: SparkSession, path: String, table: String,
                  lake: TableFormat, ledger: Ledger,
                  coercionThreshold: Double = 0.9): Result = {
    val hash = fileHash(path)
    if (ledger.isLoaded(hash))
      return Result(hash, "loaded", 0L, skipped = true)
    val priorStatus = ledger.all().get(hash).map(_.status)
    ledger.record(FileRecord(hash, path, table, "received", 0L))
    try {
      val raw = loadRaw(spark, path)
      val named = ColumnNameNormalizer(raw)
      val repaired = OverflowRepair.repair(named)
      val nonEmpty = repaired.na.drop("all")
      val coerced = Coercion.coerce(nonEmpty, coercionThreshold)
      val cleaned = coerced.select(coerced.schema.fields.map { f =>
        if (f.dataType == org.apache.spark.sql.types.StringType)
          Cleaning.protocol(col(f.name)).as(f.name)
        else col(f.name)
      }.toIndexedSeq: _*)
      // processed_at is captured ONCE on the driver and stamped as a literal:
      // current_timestamp() is per-action, and this frame feeds three actions
      // (count, main append, quarantine append) — persist eviction could
      // otherwise stamp a file's main and quarantine rows differently.
      val processedAt = java.time.Instant.now()
      val stamped = cleaned
        .withColumn("processed_at",
          lit(java.sql.Timestamp.from(processedAt)))
        .withColumn("_source_file_hash", lit(hash))
        .persist()
      // Quarantine routing (reference prompts/coordinator.py:63-64: shifted
      // rows are suspect — route them for review, never into silver). Rows
      // the overflow repair flagged go to `<table>_quarantine` WITH the flag
      // column for context; the main table receives only clean rows and
      // keeps its schema free of the flag.
      val shifted = stamped.columns.contains("is_shifted")
      val good = if (shifted) stamped.filter(!col("is_shifted")).drop("is_shifted")
                 else stamped
      val rows = good.count()
      val qrows = if (shifted) stamped.filter(col("is_shifted")).count() else 0L
      ledger.record(FileRecord(hash, path, table, "cleaned", rows))
      // Idempotent commit token: the file hash travels WITH the data, so a
      // crash between the lake append and the 'loaded' ledger record cannot
      // cause a double append — the re-run finds the hash already committed
      // and only repairs the ledger. The token SCAN runs only when the
      // ledger shows the crash window is possible (this hash reached
      // 'cleaned'/'failed' before): the happy path stays O(new data), not
      // O(table) per file. Main and quarantine commits are checked
      // independently — a crash between the two appends must not drop the
      // quarantine rows on replay.
      val crashWindowPossible = priorStatus.exists(s => s == "cleaned" || s == "failed")
      def alreadyCommitted(t: String): Boolean =
        crashWindowPossible && lake.exists(t) && {
          val df = lake.read(spark, t)
          df.columns.contains("_source_file_hash") &&
            !df.filter(col("_source_file_hash") === hash).isEmpty
        }
      if (!alreadyCommitted(table)) lake.append(good, table)
      if (qrows > 0 && !alreadyCommitted(quarantineTable(table)))
        lake.append(stamped.filter(col("is_shifted")), quarantineTable(table))
      stamped.unpersist()
      ledger.record(FileRecord(hash, path, table, "loaded", rows))
      // the transcoded sibling is derived data; drop it once the load is done
      val utf8Sibling = Paths.get(path).resolveSibling(
        Paths.get(path).getFileName.toString + ".utf8")
      Files.deleteIfExists(utf8Sibling)
      Result(hash, "loaded", rows, skipped = false, quarantinedRows = qrows)
    } catch {
      case e: Exception =>
        ledger.record(FileRecord(hash, path, table, "failed", 0L))
        throw e
    }
  }
}
