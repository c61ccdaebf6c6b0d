package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.ParquetDirFormat
import graft.operators.Heuristics
import graft.pipeline.{FilePipeline, Ledger}

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("end-to-end file pipeline: load, clean, coerce, stamp, lake, idempotent") {
    val root = Files.createTempDirectory("graft-pipe")
    val csv = root.resolve("users.csv")
    Files.write(csv,
      ("userId,First Name,Age,note\n" +
       "1,  alice  ,34,ok\n" +
       "2,bob,N/A,fine\n" +
       "3,carol,29,\n").getBytes)
    val lake = new ParquetDirFormat(root.resolve("lake").toString)
    val ledger = new Ledger(root.resolve("ledger.tsv").toString)

    val r1 = FilePipeline.processFile(spark, csv.toString, "users", lake, ledger)
    assert(r1.status == "loaded" && r1.rows == 3 && !r1.skipped)

    val out = lake.read(spark, "users")
    // normalized names + processed_at stamp + provenance commit token
    assert(out.columns.toSet ==
      Set("user_id", "first_name", "age", "note", "processed_at", "_source_file_hash"))
    // coercion tightened user_id; N/A in age nulled BEFORE coercion decision
    val types = out.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("user_id") == "bigint")
    // string cleaning applied: whitespace trimmed
    val names = out.select("first_name").collect().map(_.getString(0)).toSet
    assert(names.contains("alice"))

    // same content again -> skipped (exactly-once per content hash)
    val r2 = FilePipeline.processFile(spark, csv.toString, "users", lake, ledger)
    assert(r2.skipped)
    assert(lake.read(spark, "users").count() == 3)
  }

  test("overflow-shifted rows are quarantined, not loaded into the main table") {
    val root = Files.createTempDirectory("graft-quar")
    val csv = root.resolve("q.csv")
    // row 10's unquoted comma spills into a phantom column: overflow repair
    // flags it is_shifted -> the pipeline must route it to <table>_quarantine
    val rows = (1 to 9).map(i => s"$i,name$i,note$i") :+ "10,Bob,messy, extra"
    Files.write(csv, ("id,name,notes\n" + rows.mkString("\n") + "\n").getBytes)
    val lake = new ParquetDirFormat(root.resolve("lake").toString)
    val ledger = new Ledger(root.resolve("ledger.tsv").toString)
    val r = FilePipeline.processFile(spark, csv.toString, "q", lake, ledger)
    assert(r.status == "loaded" && r.rows == 9 && r.quarantinedRows == 1)
    val main = lake.read(spark, "q")
    assert(main.count() == 9, "shifted row must not reach the main table")
    assert(!main.columns.contains("is_shifted"), "main table schema stays clean")
    val quar = lake.read(spark, FilePipeline.quarantineTable("q"))
    assert(quar.count() == 1)
    assert(quar.columns.contains("is_shifted"), "quarantine keeps the flag for review")
    assert(quar.head().getAs[String]("name") == "Bob")
    // one driver-captured stamp for the whole file: main and quarantine rows
    // must carry the IDENTICAL processed_at even across separate actions
    val stamps = (main.select("processed_at").collect() ++
      quar.select("processed_at").collect()).map(_.get(0)).toSet
    assert(stamps.size == 1, s"main+quarantine must share one stamp, got $stamps")
    // a clean file quarantines nothing and creates no quarantine table
    val clean = root.resolve("clean.csv")
    Files.write(clean, "id,name,notes\n1,a,x\n2,b,y\n".getBytes)
    val r2 = FilePipeline.processFile(spark, clean.toString, "c", lake, ledger)
    assert(r2.quarantinedRows == 0)
    assert(!lake.exists(FilePipeline.quarantineTable("c")))
  }

  test("crash between append and ledger record cannot double-load (commit token)") {
    val root = Files.createTempDirectory("graft-crash")
    val csv = root.resolve("t.csv")
    Files.write(csv, "id,v\n1,a\n2,b\n".getBytes)
    val lake = new ParquetDirFormat(root.resolve("lake").toString)
    val ledger = new Ledger(root.resolve("ledger.tsv").toString)
    // first run commits the data
    val first = FilePipeline.processFile(spark, csv.toString, "t", lake, ledger)
    assert(lake.read(spark, "t").count() == 2)
    // simulate the crash window: the lake append happened but the 'loaded'
    // ledger record was lost — the ledger last saw this hash at 'cleaned'
    val crashed = new Ledger(root.resolve("ledger2.tsv").toString)
    crashed.record(graft.pipeline.FileRecord(first.fileHash, csv.toString, "t", "received", 0))
    crashed.record(graft.pipeline.FileRecord(first.fileHash, csv.toString, "t", "cleaned", 2))
    val r = FilePipeline.processFile(spark, csv.toString, "t", lake, ledger = crashed)
    assert(r.status == "loaded")
    // the in-data _source_file_hash token prevented a second append
    assert(lake.read(spark, "t").count() == 2, "rows must not be appended twice")
    assert(crashed.isLoaded(r.fileHash), "ledger repaired to loaded")
  }

  test("transcoded .utf8 sibling is cleaned up after load and archive") {
    val root = Files.createTempDirectory("graft-utf8")
    val csv = root.resolve("win.csv")
    // Windows-1252 content (0xE9 = é) forces an ensureUtf8 transcode sibling
    Files.write(csv, ("id,name\n1,café\n".getBytes("windows-1252")))
    val lake = new ParquetDirFormat(root.resolve("lake").toString)
    val ledger = new Ledger(root.resolve("ledger.tsv").toString)
    FilePipeline.processFile(spark, csv.toString, "w", lake, ledger)
    assert(!Files.exists(root.resolve("win.csv.utf8")),
      "derived .utf8 sibling must not linger in the inbox")
    FilePipeline.archive(csv.toString, root.resolve("archive").toString)
    assert(Files.exists(root.resolve("archive").resolve("win.csv")))
    assert(!Files.exists(root.resolve("win.csv")))
  }

  test("a failed load is retryable: success overwrites the failure record") {
    val root = java.nio.file.Files.createTempDirectory("graft-retry")
    val ledger = new Ledger(root.resolve("ledger.tsv").toString)
    ledger.record(graft.pipeline.FileRecord("h1", "/p", "t", "received", 0))
    ledger.record(graft.pipeline.FileRecord("h1", "/p", "t", "failed", 0))
    assert(!ledger.isLoaded("h1"))
    // retry succeeds
    ledger.record(graft.pipeline.FileRecord("h1", "/p", "t", "cleaned", 5))
    ledger.record(graft.pipeline.FileRecord("h1", "/p", "t", "loaded", 5))
    assert(ledger.isLoaded("h1"))
    // a stray late failure event cannot regress a completed load
    ledger.record(graft.pipeline.FileRecord("h1", "/p", "t", "failed", 0))
    assert(ledger.isLoaded("h1"))
  }

  test("PII name matching is token-exact, not substring") {
    import spark.implicits._
    val df = Seq(("x", "y", "z", "w"))
      .toDF("population", "adobe", "user_email", "longevity")
    val findings = Heuristics.detectPii(df).map(_.column).toSet
    assert(findings == Set("user_email"))
  }

  test("header heuristic: textual header over numeric body") {
    assert(Heuristics.looksLikeHeader(
      Seq("id", "amount", "when"),
      Seq(Seq("1", "9.99", "2024-01-01"), Seq("2", "12.50", "2024-01-02"))))
    assert(!Heuristics.looksLikeHeader(
      Seq("1", "9.99", "2024-01-01"),
      Seq(Seq("2", "12.50", "2024-01-02"), Seq("3", "8.00", "2024-01-03"))))
  }

  test("PII detection by name and by value shape") {
    import spark.implicits._
    val df = Seq(
      ("a@b.com", "555-123-4567x", "plain", "x"),
      ("c@d.org", "555-987-6543x", "text", "y"))
      .toDF("contact", "phone_number", "note", "v")
    val findings = Heuristics.detectPii(df).map(f => f.column -> f.reason).toMap
    assert(findings.get("phone_number").contains("column_name"))
    assert(findings.get("contact").contains("value_pattern"))
    assert(!findings.contains("note") && !findings.contains("v"))
  }
}
