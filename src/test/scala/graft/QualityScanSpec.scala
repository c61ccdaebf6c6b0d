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

  test("constraint audit: exact violation counts per rule on a dirty frame") {
    import spark.implicits._
    import graft.operators.Constraints
    import graft.operators.Constraints._
    // 2 null keys; key 10 appears 3x and key 11 twice (3 extra rows); one
    // status off-list plus a NULL status (null must NOT count there); one
    // value below and one above range (nulls don't count); orphans 98/99
    val child = Seq(
      (Some(10L), "A", Some(5.0)), (Some(10L), "A", Some(5.0)), (Some(10L), "A", None),
      (Some(11L), "B", Some(-1.0)), (Some(11L), "Z", Some(99.0)),
      (None, "A", Some(5.0)), (None, null, Some(5.0)),
      (Some(98L), "B", Some(5.0)), (Some(99L), "B", Some(5.0)),
      (Some(1L), "A", Some(5.0))
    ).toDF("k", "status", "v")
    val parent = Seq(1L, 10L, 11L).toDF("pk")
    val got = Constraints.audit(child, Seq(
      NotNull("k"),
      Unique(Seq("k")),
      AcceptedValues("status", Seq("A", "B")),
      InRange("v", 0.0, 50.0),
      ForeignKey(Seq("k"), parent, Seq("pk"), "parent")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("not_null", "k")) == 2L)
    assert(got(("unique", "k")) == 3L, "3 extra rows beyond first per dup key; NULL keys ignored")
    assert(got(("accepted_values", "status")) == 1L, "Z only; NULL status is not_null's job")
    assert(got(("in_range", "v")) == 2L, "-1 and 99; NULL v not counted")
    assert(got(("foreign_key", "k->parent(pk)")) == 2L, "98, 99 orphaned; NULL keys unchecked")
    assert(got.size == 5)
    // an all-clean frame reports zero everywhere, same report shape
    val clean = Seq((Some(1L), "A", Some(5.0))).toDF("k", "status", "v")
    val zeros = Constraints.audit(clean, Seq(
      NotNull("k"), Unique(Seq("k")),
      AcceptedValues("status", Seq("A", "B")), InRange("v", 0.0, 50.0),
      ForeignKey(Seq("k"), parent, Seq("pk"), "parent")))
      .collect().map(_.getLong(2))
    assert(zeros.forall(_ == 0L) && zeros.length == 5)
  }
}
