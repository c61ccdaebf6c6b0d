package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.StreamPipeline

class StreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("file inbox: drain, exactly-once across restarts, pipeline applied") {
    val root = Files.createTempDirectory("graft-stream")
    val inbox = root.resolve("inbox"); Files.createDirectories(inbox)
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("v", StringType)))

    Files.write(inbox.resolve("f1.csv"), "id,v\n1,  a \n2,N/A\n".getBytes)
    Files.write(inbox.resolve("f2.csv"), "id,v\n3, b\n".getBytes)

    def pipeline(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"),
        graft.operators.Cleaning.protocol(col("v")).as("v"))

    StreamPipeline.runAvailableNow(
      StreamPipeline.csvInbox(spark, inbox.toString, schema, pipeline, out, ckpt))
    val r1 = spark.read.parquet(out)
    assert(r1.count() == 3)
    val byId = r1.collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(byId("1").contains("a"))   // trimmed
    assert(byId("2").isEmpty)         // sentinel -> null
    assert(byId("3").contains("b"))

    // restart with same checkpoint + one new file: only the new file lands
    Files.write(inbox.resolve("f3.csv"), "id,v\n4,c\n".getBytes)
    StreamPipeline.runAvailableNow(
      StreamPipeline.csvInbox(spark, inbox.toString, schema, pipeline, out, ckpt))
    assert(spark.read.parquet(out).count() == 4)
  }
}
