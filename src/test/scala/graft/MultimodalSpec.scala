package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def media() = {
    def fake(w: Int, h: Int, payload: Array[Byte]): Array[Byte] =
      Array((w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte) ++ payload
    val rows = Seq(
      Row(1L, "image", fake(640, 480, Array.tabulate(32)(_.toByte))),
      Row(2L, "image", fake(64, 64, Array.tabulate(8)(i => (i * 3).toByte))),
      Row(3L, "video", fake(1280, 720, Array.tabulate(512)(i => (i % 251).toByte))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
  }

  test("extractMeta decodes width/height and deterministic checksum") {
    val m = Multimodal.extractMeta(media()).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getInt(2) == 640 && m(1L).getInt(3) == 480)
    assert(m(3L).getInt(2) == 1280 && m(3L).getInt(3) == 720)
    // checksum is stable across runs
    val again = Multimodal.extractMeta(media()).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    m.foreach { case (id, r) => assert(again(id) == r.getLong(5)) }
  }

  test("featurize emits fixed-dim float vectors") {
    val f = Multimodal.featurize(media(), dim = 16).collect()
    assert(f.length == 3)
    f.foreach(r => assert(r.getSeq[Float](1).length == 16))
  }

  test("frameSample explodes video rows into n frames") {
    val fr = Multimodal.frameSample(media(), n = 4, frameBytes = 64).collect()
    assert(fr.length == 4)
    assert(fr.map(_.getInt(1)).toSet == Set(0, 1, 2, 3))
    fr.foreach(r => assert(r.getAs[Array[Byte]]("frame").length == 64))
  }
}
