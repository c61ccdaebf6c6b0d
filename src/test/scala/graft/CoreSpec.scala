package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.core.{Exact, TableRegistry}
import graft.operators.Coercion
import graft.sources.Encoding

class CoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dsum is order-independent and exact for 2-decimal doubles") {
    import spark.implicits._
    val vals = Seq(0.1, 0.2, 0.3, 1000000.01, -0.3, 123456.78, 0.07)
    val a = vals.toDF("v").agg(Exact.dsum(col("v"))).head().getDouble(0)
    val b = vals.reverse.toDF("v").repartition(7)
      .agg(Exact.dsum(col("v"))).head().getDouble(0)
    assert(a == b)
    val cents = vals.map(v => math.rint(v * 100).toLong).sum
    assert(a == cents / 100.0)
  }

  test("property: coercion never loses non-null cells") {
    val gen = Gen.listOfN(30, Gen.oneOf(
      Gen.choose(-1000, 1000).map(_.toString),
      Gen.choose(-10.0, 10.0).map(d => f"$d%.3f"),
      Gen.alphaStr.suchThat(_.nonEmpty),
      Gen.const(null: String)))
    val prop = Prop.forAll(gen) { vals =>
      import spark.implicits._
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val before = df.filter(col("v").isNotNull).count()
      val out = Coercion.coerce(df, 0.9)
      val after = out.filter(col("v").isNotNull).count()
      // a coerced column keeps >= threshold of its non-nulls; an uncoerced
      // column keeps all of them
      after >= (before * 0.9 - 1).toLong
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("encoding: BOM and windows-1252 fallbacks transcode to clean UTF-8") {
    val d = Files.createTempDirectory("graft-enc")
    val bom = d.resolve("bom.csv")
    Files.write(bom, Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ "a,b\n1,2\n".getBytes)
    assert(Encoding.detect(bom.toString) == Encoding.Utf8Bom)
    val fixed = Encoding.ensureUtf8(bom.toString)
    assert(new String(Files.readAllBytes(fixed), "UTF-8").startsWith("a,b"))

    val cp = d.resolve("cp1252.csv")
    Files.write(cp, ("name\ncafé\n").getBytes("windows-1252"))
    assert(Encoding.detect(cp.toString) == Encoding.Windows1252)
    val fixed2 = Encoding.ensureUtf8(cp.toString)
    assert(new String(Files.readAllBytes(fixed2), "UTF-8").contains("café"))

    val clean = d.resolve("ok.csv")
    Files.write(clean, "x\n1\n".getBytes("UTF-8"))
    assert(Encoding.ensureUtf8(clean.toString).toString == clean.toString)
  }

  test("registry guard blocks comment-prefixed and newline-split destructive SQL") {
    import spark.implicits._
    val reg = new TableRegistry(spark)
    reg.register("reg_g1", Seq((1L, "a")).toDF("id", "v"))
    intercept[IllegalArgumentException](reg.sql("/* hi */ DROP TABLE reg_g1"))
    intercept[IllegalArgumentException](reg.sql("DROP\nTABLE reg_g1"))
    intercept[IllegalArgumentException](reg.sql("-- c\nDELETE FROM reg_g1"))
    assert(reg.sql("SELECT * FROM reg_g1").count() == 1)
    reg.drop("reg_g1")
  }

  test("summarize tolerates non-orderable columns") {
    import spark.implicits._
    // arrays are orderable in Spark; maps are not — both must profile
    val df = Seq((1L, Map("k" -> 1), Seq(1.0f)), (2L, Map("k" -> 2), Seq(2.0f)))
      .toDF("id", "props", "vec")
    val prof = graft.operators.Profiling.summarize(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof("props").isNullAt(6) && prof("props").isNullAt(7))
    assert(prof("id").getString(6) == "1")
    assert(prof("vec").getString(6) != null) // arrays order lexicographically
  }

  test("encoding detect handles multi-byte chars at the sample boundary") {
    val d = java.nio.file.Files.createTempDirectory("graft-enc2")
    val p = d.resolve("boundary.csv")
    // valid UTF-8 with a 2-byte char straddling a 32-byte sample boundary
    val bytes = ("x" * 31).getBytes("UTF-8") ++ "é".getBytes("UTF-8") ++ "tail\n".getBytes("UTF-8")
    java.nio.file.Files.write(p, bytes)
    assert(Encoding.detect(p.toString, sampleBytes = 32) == Encoding.Utf8)
  }

  test("table registry: register, describe, guard") {
    import spark.implicits._
    val reg = new TableRegistry(spark)
    reg.register("reg_t1", Seq((1L, "a")).toDF("id", "v"), "test")
    assert(reg.describe("reg_t1") == Seq("id" -> "BIGINT", "v" -> "VARCHAR"))
    assert(reg.rowCount("reg_t1") == 1)
    assert(reg.sql("SELECT count(*) c FROM reg_t1").head().getLong(0) == 1)
    intercept[IllegalArgumentException](reg.sql("DROP TABLE reg_t1"))
    intercept[IllegalArgumentException](reg.register("bad name!", Seq(1).toDF("x")))
    reg.drop("reg_t1")
    assert(reg.get("reg_t1").isEmpty)
  }
}
