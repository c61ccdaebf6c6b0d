package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{Event, Session}
import graft.export.Reports

class StatefulSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StatefulSessions.sessions(input.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 5 min apart (one session), then 90 min silence,
      // then another event -> first session closes
      input.addData(Event(1L, ts(0), 1.0), Event(1L, ts(5), 2.0))
      q.processAllAvailable()
      input.addData(Event(1L, ts(95), 3.0))
      q.processAllAvailable()
      // push the watermark far forward so the open session times out
      input.addData(Event(2L, ts(500), 9.0))
      q.processAllAvailable()
      input.addData(Event(2L, ts(1000), 1.0))
      q.processAllAvailable()

      val out = spark.table("sessions_out").as[Session].collect()
      val u1 = out.filter(_.userId == 1L).sortBy(_.sessionStart.getTime)
      assert(u1.length >= 2)
      assert(u1(0).nEvents == 2 && u1(0).sumValue == 3.0)
      assert(u1(0).sessionEnd.getTime - u1(0).sessionStart.getTime == 5 * 60000L)
      assert(u1(1).nEvents == 1 && u1(1).sumValue == 3.0)
    } finally q.stop()
  }

  test("watermarked windowed counts run on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDS().toDF("ts", "event_type", "value")
    val agg = graft.streaming.StreamPipeline.windowedCounts(df, "ts", "10 minutes", "5 minutes")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(0), "a", 1.0), (ts(1), "a", 2.0), (ts(7), "b", 3.0))
      q.processAllAvailable()
      input.addData((ts(60), "a", 1.0)) // advance watermark, finalize windows
      q.processAllAvailable()
      val out = spark.table("win_out").collect()
      assert(out.nonEmpty)
      val a = out.find(r => r.getString(1) == "a" && r.getLong(2) == 2)
      assert(a.isDefined, s"expected finalized window for 'a' x2 in ${out.mkString(";")}")
    } finally q.stop()
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val df = input.toDS().toDF("ts", "user_id", "v")
    val q = graft.streaming.StreamPipeline
      .streamingDedup(df, "ts", "10 minutes", Seq("user_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(0), 1L, "a"), (ts(0), 1L, "a-dup"), (ts(1), 2L, "b"))
      q.processAllAvailable()
      // a replay of key 1 with a DIFFERENT event time must also be dropped —
      // dedup is per KEY within the watermark, not per (key, ts)
      input.addData((ts(0), 1L, "a-replay"), (ts(3), 1L, "a-later-ts"))
      q.processAllAvailable()
      val out = spark.table("dedup_out").collect()
      assert(out.length == 2, out.mkString(";")) // one row per key within horizon
    } finally q.stop()
  }

  test("out-of-order within-gap event extends sessionStart backwards") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StatefulSessions.sessions(input.toDS())
      .writeStream.format("memory").queryName("sessions_ooo")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(7L, ts(10), 1.0))
      q.processAllAvailable()
      // within-gap but EARLIER than the open session's start (above watermark)
      input.addData(Event(7L, ts(2), 5.0))
      q.processAllAvailable()
      // push watermark far ahead so the session times out and emits
      input.addData(Event(8L, ts(500), 0.0))
      q.processAllAvailable()
      input.addData(Event(8L, ts(1000), 0.0))
      q.processAllAvailable()
      val out = spark.table("sessions_ooo").as[Session].collect()
        .filter(_.userId == 7L)
      assert(out.length == 1, out.mkString(";"))
      assert(out(0).sessionStart.getTime == ts(2).getTime,
        s"sessionStart must move back to the true earliest event: ${out(0)}")
      assert(out(0).nEvents == 2 && out(0).sumValue == 6.0)
    } finally q.stop()
  }

  test("report JSON rendering escapes and shapes") {
    val json = Reports.render(Reports.QualityReport("t\"x", 10,
      Seq(Reports.ColumnFinding("c1", "null_like", "warning", "line1\nline2", 3))))
    assert(json.contains("\"table\":\"t\\\"x\""))
    assert(json.contains("\"count\":3"))
    assert(json.contains("line1\\nline2"))
  }
}
