package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.QualityScan
import graft.pipeline.FilePipeline
import graft.sources.Sinks

class QualityScanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("one-scan string quality profile: null-like, whitespace, constants") {
    import spark.implicits._
    val df = Seq(
      ("n/a", " padded", "const"),
      ("ok", "clean", "const"),
      ("NULL", "also ok", "const"),
      (null, " x ", "const")).toDF("a", "b", "c")
    val q = QualityScan.scanStrings(df, Seq("a", "b", "c"))
      .map(x => x.column -> x).toMap
    assert(q("a").nullLike == 2)       // n/a + NULL
    assert(q("a").nonNull == 3)
    assert(q("b").whitespacePadded == 2)
    assert(q("c").isConstant)
    assert(QualityScan.constantColumns(df, Seq("a", "b", "c")) == Seq("c"))
  }

  test("summarize profiles every column in one scan") {
    val li = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
    val prof = graft.operators.Profiling.summarize(li).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.size == li.columns.length)
    val qty = prof("l_quantity")
    assert(qty.getString(1) == "DOUBLE")
    assert(qty.getLong(2) == li.count() && qty.getLong(3) == qty.getLong(2))
    assert(qty.getDouble(5) == 0.0)
    assert(qty.getString(6).toDouble >= 1.0)
  }

  test("value breakdown is top-k with deterministic tie-break") {
    import spark.implicits._
    val df = (Seq.fill(3)("x") ++ Seq.fill(3)("a") ++ Seq("z")).toDF("v")
    val rows = QualityScan.valueBreakdown(df, "v", 2).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 3L), ("x", 3L)))
  }

  test("archive moves the file atomically") {
    val d = Files.createTempDirectory("graft-arch")
    val f = d.resolve("in.csv")
    Files.write(f, "a\n1\n".getBytes)
    val moved = FilePipeline.archive(f.toString, d.resolve("archive").toString)
    assert(!Files.exists(f) && Files.exists(moved))
  }

  test("jsonArray writes a single array document and caps size") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-ja")
    val p = d.resolve("r.json").toString
    Sinks.jsonArray(Seq((1, "a"), (2, "b")).toDF("id", "s"), p)
    val txt = new String(Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
    assert(txt.startsWith("[") && txt.endsWith("]"))
    assert(spark.read.option("multiLine", true).json(p).count() == 2)
    intercept[IllegalArgumentException] {
      Sinks.jsonArray(spark.range(10).toDF(), d.resolve("big.json").toString, maxRows = 5)
    }
  }
}
