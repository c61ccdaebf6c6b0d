package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{Doc, Survivor}

class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("streaming dedup emits each content exactly once across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDedup.dedup(input.toDS(), horizon = "10 minutes")
      .writeStream.format("memory").queryName("sdedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: A twice (in-batch dup, later doc_id first in time), B once
      input.addData(
        Doc(11L, ts(1), "alpha body"), Doc(10L, ts(2), "alpha body"),
        Doc(20L, ts(1), "beta body"))
      q.processAllAvailable()
      // batch 2: A again (cross-batch dup) + new C
      input.addData(Doc(12L, ts(3), "alpha body"), Doc(30L, ts(3), "gamma body"))
      q.processAllAvailable()
      val out = spark.table("sdedup_out").as[Survivor].collect()
      assert(out.map(_.text).sorted.toSeq ==
        Seq("alpha body", "beta body", "gamma body"))
      // earliest (ts, doc_id) arrival is the survivor, not the smallest id
      assert(out.find(_.text == "alpha body").get.docId == 11L)
    } finally q.stop()
  }

  test("dedup state survives a restart via the checkpointed state store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-sdedup-restart")
    val (ckpt, outDir) = (s"$root/ckpt", s"$root/out")
    val input = MemoryStream[Doc]
    // the memory sink cannot recover from a checkpoint; the parquet file sink
    // can, and its durable output makes a spurious re-emit visible
    def start() = StreamingDedup.dedup(input.toDS(), horizon = "10 minutes")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    val q1 = start()
    try {
      input.addData(Doc(1L, ts(0), "persistent doc"))
      q1.processAllAvailable()
    } finally q1.stop()
    // new query, same checkpoint: the content-hash state must come back from
    // the state store, so the duplicate is suppressed across the restart
    val q2 = start()
    try {
      input.addData(Doc(2L, ts(1), "persistent doc"), Doc(3L, ts(1), "fresh doc"))
      q2.processAllAvailable()
      val texts = spark.read.parquet(outDir).as[Survivor].collect().map(_.text)
      assert(texts.sorted.toSeq == Seq("fresh doc", "persistent doc"),
        s"exactly-once across restart violated: ${texts.toSeq}")
    } finally q2.stop()
  }

  test("state evicts past the horizon; later re-arrival starts a new cycle") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDedup.dedup(input.toDS(), horizon = "10 minutes")
      .writeStream.format("memory").queryName("sdedup_evict")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Doc(1L, ts(0), "doc x"))
      q.processAllAvailable()
      // push the watermark far past ts(0) + horizon -> state for "doc x" evicts
      input.addData(Doc(2L, ts(100), "filler"))
      q.processAllAvailable()
      input.addData(Doc(3L, ts(101), "filler2"))
      q.processAllAvailable()
      // re-arrival after eviction is a NEW dedup cycle (documented contract)
      input.addData(Doc(4L, ts(102), "doc x"))
      q.processAllAvailable()
      val got = spark.table("sdedup_evict").as[Survivor].collect()
        .filter(_.text == "doc x").map(_.docId).sorted.toSeq
      assert(got == Seq(1L, 4L))
    } finally q.stop()
  }
}
