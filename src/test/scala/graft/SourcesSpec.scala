package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DelimiterDetector, FormatDetector, Formats, Readers, Sinks}

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpFile(name: String, content: String): String = {
    val d = Files.createTempDirectory("graft-src")
    val p = d.resolve(name)
    Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  test("format detection by extension and magic bytes") {
    assert(FormatDetector.byExtension("x/y/data.csv") == Formats.Csv)
    assert(FormatDetector.byExtension("d.jsonl") == Formats.Jsonl)
    assert(FormatDetector.byExtension("d.parquet") == Formats.Parquet)
    assert(FormatDetector.byMagic("PAR1xxxx".getBytes) == Formats.Parquet)
    assert(FormatDetector.byMagic("  {\"a\":1}".getBytes) == Formats.Json)
  }

  test("delimiter detection: semicolon file beats comma") {
    val lines = Seq("a;b;c", "1;2;3", "4;5,5;6", "7;8;9")
    assert(DelimiterDetector.detect(lines) == ';')
    assert(DelimiterDetector.detect(Seq("a\tb", "1\t2")) == '\t')
  }

  test("csv strict: all-string schema, header, quotes honored") {
    val p = tmpFile("t.csv", "id,name\n1,\"smith, jo\"\n2,plain\n")
    val df = Readers.csvStrict(spark, p)
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(1)).toSet == Set("smith, jo", "plain"))
  }

  test("csv no-header names columns positionally") {
    val p = tmpFile("nh.csv", "1,x\n2,y\n")
    val df = Readers.csvNoHeader(spark, p)
    assert(df.columns.toSeq == Seq("column0", "column1"))
    assert(df.count() == 2)
  }

  test("atomic load passes on clean file") {
    val p = tmpFile("ok.csv", "a,b\n1,2\n3,4\n")
    assert(Readers.atomicCsv(spark, p).count() == 2)
  }

  test("atomic load tolerates blank lines (CSV parser skips them)") {
    val p = tmpFile("blank.csv", "a,b\n1,2\n\n   \n3,4\n")
    assert(Readers.atomicCsv(spark, p).count() == 2)
  }

  test("atomic load fails when multi-line records merge source lines") {
    // a quoted embedded newline: 1 record from 2 physical lines -> the
    // source-line vs loaded-row invariant must trip (reference
    // ingestion.py:537-557 semantics)
    val p = tmpFile("bad.csv", "a,b\n1,\"two\nlines\"\n")
    intercept[IllegalStateException] {
      Readers.atomicCsv(spark, p, multiLine = true)
    }
  }

  test("json sniff: array vs jsonl") {
    val pa = tmpFile("arr.json", """[{"a": 1}, {"a": 2}]""")
    assert(Readers.json(spark, pa).count() == 2)
    val pl = tmpFile("l.jsonl", "{\"a\": 1}\n{\"a\": 2}\n{\"a\": 3}\n")
    assert(Readers.json(spark, pl).count() == 3)
  }

  test("sinks round-trip: parquet, csv, jsonl, orc") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val d = Files.createTempDirectory("graft-sink").toString
    Sinks.parquet(df, s"$d/p"); assert(spark.read.parquet(s"$d/p").count() == 2)
    Sinks.csv(df, s"$d/c");     assert(spark.read.option("header", true).csv(s"$d/c").count() == 2)
    Sinks.jsonl(df, s"$d/j");   assert(spark.read.json(s"$d/j").count() == 2)
    Sinks.orc(df, s"$d/o");     assert(spark.read.orc(s"$d/o").count() == 2)
  }
}
