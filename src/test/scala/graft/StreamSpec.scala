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

  test("continuous medallion: inbox files merge into the lake as key upserts") {
    val root = Files.createTempDirectory("graft-stream-silver")
    val inbox = root.resolve("inbox"); Files.createDirectories(inbox)
    val ckpt = root.resolve("ckpt").toString
    val lake = new graft.lake.ParquetDirFormat(root.resolve("lake").toString)
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("name", StringType)))
    def silver(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id").cast("bigint").as("id"),
        graft.operators.Cleaning.protocol(col("name")).as("name"))

    Files.write(inbox.resolve("b1.csv"), "id,name\n1,  alice \n2,bob\n".getBytes)
    StreamPipeline.runAvailableNow(StreamPipeline.silverUpsertInbox(
      spark, inbox.toString, schema, silver, lake, "users_silver", Seq("id"), ckpt))
    assert(lake.read(spark, "users_silver").count() == 2)

    // a late file UPDATES id 2 and adds id 3: merge, not duplicate append
    Files.write(inbox.resolve("b2.csv"), "id,name\n2,robert\n3,carol\n".getBytes)
    StreamPipeline.runAvailableNow(StreamPipeline.silverUpsertInbox(
      spark, inbox.toString, schema, silver, lake, "users_silver", Seq("id"), ckpt))
    val rows = lake.read(spark, "users_silver").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "alice", 2L -> "robert", 3L -> "carol"))
  }

  test("event-time floor: a replayed stale file leaves silver byte-identical") {
    val root = Files.createTempDirectory("graft-stream-floor")
    val inbox = root.resolve("inbox"); Files.createDirectories(inbox)
    val ckpt = root.resolve("ckpt").toString
    val lake = new graft.lake.ParquetDirFormat(root.resolve("lake").toString)
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("name", StringType),
      StructField("seq", StringType)))
    def silver(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id").cast("bigint").as("id"),
        graft.operators.Cleaning.protocol(col("name")).as("name"),
        col("seq").cast("bigint").as("processed_at"))
    def drain(): Unit = StreamPipeline.runAvailableNow(
      StreamPipeline.silverUpsertInbox(
        spark, inbox.toString, schema, silver, lake, "t", Seq("id"), ckpt,
        orderCol = Some("processed_at")))

    val b1 = "id,name,seq\n1,alice,1\n2,bob,1\n"
    Files.write(inbox.resolve("b1.csv"), b1.getBytes)
    drain()
    Files.write(inbox.resolve("b2.csv"), "id,name,seq\n2,robert,2\n".getBytes)
    drain()
    def state() = lake.read(spark, "t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val before = state()
    assert(before == Set((1L, "alice", 1L), (2L, "robert", 2L)))
    val versionsBefore = lake.versions("t").size

    // the hazard: b1's CONTENT re-delivered under a NEW name after a restart.
    // The checkpoint's file ledger sees a new file; only the event-time
    // floor knows the rows are stale.
    Files.write(inbox.resolve("b1_redelivered.csv"), b1.getBytes)
    drain()
    assert(state() == before, "stale replay resurrected old row versions")
    assert(lake.versions("t").size == versionsBefore,
      "a wholly-stale batch must commit nothing")

    // mixed batch: the stale row is rejected, the genuinely new one lands
    Files.write(inbox.resolve("b3.csv"), "id,name,seq\n1,zombie,0\n4,dan,5\n".getBytes)
    drain()
    assert(state() == before + ((4L, "dan", 5L)),
      "mixed batch must apply only the strictly-newer rows")
  }

  test("continuous medallion survives lake maintenance between drains") {
    // the production interaction most likely to corrupt a continuous
    // pipeline: compaction + snapshot expiry rewrite the table OUT FROM
    // UNDER a checkpointed stream, then the stream restarts and must still
    // merge (not duplicate, not resurrect expired state)
    val root = Files.createTempDirectory("graft-stream-maint")
    val inbox = root.resolve("inbox"); Files.createDirectories(inbox)
    val ckpt = root.resolve("ckpt").toString
    val lake = new graft.lake.ParquetDirFormat(root.resolve("lake").toString)
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("name", StringType)))
    def silver(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id").cast("bigint").as("id"),
        graft.operators.Cleaning.protocol(col("name")).as("name"))
    def drain(): Unit = StreamPipeline.runAvailableNow(
      StreamPipeline.silverUpsertInbox(
        spark, inbox.toString, schema, silver, lake, "t", Seq("id"), ckpt))

    // two drains so the lake accumulates multiple snapshots + file sets
    Files.write(inbox.resolve("b1.csv"), "id,name\n1,alice\n2,bob\n".getBytes)
    drain()
    Files.write(inbox.resolve("b2.csv"), "id,name\n2,robert\n3,carol\n".getBytes)
    drain()

    // maintenance window: compact rewrites the live snapshot, expiry deletes
    // every older version the stream's past commits produced
    lake.compact(spark, "t")
    val expired = lake.expireSnapshots("t")
    assert(expired.nonEmpty, "maintenance should have reclaimed old snapshots")
    assert(lake.versions("t").size == 1)

    // stream restarts from its checkpoint against the rewritten table: the
    // new file must land as a merge on the compacted state
    Files.write(inbox.resolve("b3.csv"), "id,name\n3,carole\n4,dan\n".getBytes)
    drain()
    val rows = lake.read(spark, "t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "alice", 2L -> "robert", 3L -> "carole", 4L -> "dan"))
    // no duplicate keys survived the compact/expire/restart cycle
    assert(lake.read(spark, "t").count() == 4)
  }

  test("streaming near-dup curation: rejections hold across the restart boundary") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-stream-curate")
    val inbox = root.resolve("inbox"); Files.createDirectories(inbox)
    val ckpt = root.resolve("ckpt").toString
    val verdictDir = root.resolve("verdicts").toString
    val lake = new graft.lake.ParquetDirFormat(root.resolve("lake").toString)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))

    def toks(prefix: String) = (1 to 20).map(i => f"$prefix$i%02d").mkString(" ")
    val seedText = toks("w")
    val textA = toks("x")
    val textB = toks("y")
    // one token changed out of 20 -> 3 of 18 trigram shingles differ,
    // J = 15/21 = 0.714 >= tau 0.5 (and the fixed 42x3 band family finds it)
    def nearDup(t: String) = t.replace("05", "99")

    // accumulated corpus + its persisted index exist BEFORE the stream starts
    lake.create(Seq((100L, seedText)).toDF("doc_id", "text"), "corpus")
    graft.operators.Dedup.buildDedupIndex(lake.read(spark, "corpus"), lake)

    def drain(): Unit = StreamPipeline.runAvailableNow(
      graft.streaming.StreamingDedup.curationInbox(
        spark, inbox.toString, schema, lake, "corpus", verdictDir, ckpt))

    Files.write(inbox.resolve("b1.csv"),
      s"doc_id,text\n1,$textA\n2,$seedText\n3,${nearDup(seedText)}\n".getBytes)
    drain()
    val v1 = spark.read.parquet(verdictDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v1 == Map(1L -> "new", 2L -> "exact_dup", 3L -> "near_dup"))
    assert(lake.read(spark, "corpus").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 100L), "only the new doc folds into the corpus")

    // RESTART: fresh query, same checkpoint + lake. Batch 2 replays nothing
    // and must reject duplicates of what batch 1 ACCEPTED — the rejection
    // state lives in the persisted index, not in stream memory.
    Files.write(inbox.resolve("b2.csv"),
      s"doc_id,text\n11,$textA\n12,${nearDup(textA)}\n13,$textB\n".getBytes)
    drain()
    val v2 = spark.read.parquet(verdictDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v2 -- v1.keys == Map(11L -> "exact_dup", 12L -> "near_dup", 13L -> "new"))
    assert(v2.view.filterKeys(v1.contains).toMap == v1, "replay rewrote old verdicts")
    assert(lake.read(spark, "corpus").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 13L, 100L))

    // idempotent drain: nothing new in the inbox changes nothing
    drain()
    assert(spark.read.parquet(verdictDir).count() == 6)
    assert(lake.read(spark, "corpus").count() == 3)
  }

  test("streaming profiling: per-batch sketch partials fold to the direct profile") {
    import graft.operators.Profiling
    val root = Files.createTempDirectory("graft-stream-prof")
    val inbox = root.resolve("inbox"); Files.createDirectories(inbox)
    val ckpt = root.resolve("ckpt").toString
    val lake = new graft.lake.ParquetDirFormat(root.resolve("lake").toString)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("value", DoubleType),
      StructField("user", StringType)))
    def fileFor(name: String, ids: Range): Unit =
      Files.write(inbox.resolve(name),
        ("id,value,user\n" + ids.map(i =>
          s"$i,${(i * 37 % 400) / 2.0},user${i % 97}").mkString("\n")).getBytes)
    fileFor("b1.csv", 0 until 400)
    fileFor("b2.csv", 400 until 1000)
    def drain(): Unit = StreamPipeline.runAvailableNow(
      StreamPipeline.profilingInbox(spark, inbox.toString, schema,
        statCols = Seq("value"), histCol = "value",
        histLo = 0.0, histWidth = 8.0, histBins = 32, distinctCol = "user",
        lake = lake, checkpoint = ckpt, maxFilesPerTrigger = 1,
        termCol = Some("user")))
    drain()
    // the merged answers — computed ONLY from partial rows in the lake
    def answers() = (
      Profiling.mergeStatsPartials(lake.read(spark, "stats_partials"), Seq("value"))
        .collect()(0),
      Profiling.mergeHistogramQuantiles(lake.read(spark, "hist_partials"),
        Seq(0.5, 0.95), lo = 0.0, width = 8.0).collect()(0),
      Profiling.mergeHllDistinct(lake.read(spark, "hll_partials")).collect()(0),
      Profiling.mergeCms(lake.read(spark, "cms_partials"))
        .orderBy("sk_row", "sk_slot").collect().toSeq)
    val (st, hq, hll, cms) = answers()
    // direct single-scan twins over the union of both files
    import spark.implicits._
    val all = (0 until 1000).map(i =>
      (i.toLong, (i * 37 % 400) / 2.0, s"user${i % 97}", 0L))
      .toDF("id", "value", "user", "shard")
    val directStats = Profiling.mergeStatsPartials(
      Profiling.statsPartials(all, "shard", Seq("value")), Seq("value")).collect()(0)
    assert(st == directStats, s"stats:\n$st\n$directStats")
    val directHq = Profiling.mergeHistogramQuantiles(
      Profiling.histogramPartials(all, "shard", "value", 0.0, 8.0, 32),
      Seq(0.5, 0.95), 0.0, 8.0).collect()(0)
    assert(hq == directHq, s"quantiles:\n$hq\n$directHq")
    // registers merge by MAX, so streamed == direct bitwise (absolute
    // accuracy is IncrementalStatsSpec's contract, not this one's)
    val directHll = Profiling.mergeHllDistinct(
      Profiling.hllPartials(all, "shard", "user")).collect()(0)
    assert(hll == directHll, s"hll:\n$hll\n$directHll")
    // counters SUM, so streamed == direct bitwise for the CMS family too
    val directCms = Profiling.mergeCms(
      Profiling.cmsPartials(all, "shard", "user"))
      .orderBy("sk_row", "sk_slot").collect().toSeq
    assert(cms == directCms, "cms counters must fold to the direct sketch")
    // restart with the same checkpoint and nothing new: profile unchanged
    // (replayed/duplicate drains overwrite their own shard rows, never add)
    drain()
    assert(answers() == ((st, hq, hll, cms)), "idempotence across drains")
  }

  test("continuous gold maintenance: streamed sales partials fold to the direct report") {
    val root = Files.createTempDirectory("graft-stream-gold")
    val inbox = root.resolve("inbox"); Files.createDirectories(inbox)
    val ckpt = root.resolve("ckpt").toString
    val lake = new graft.lake.ParquetDirFormat(root.resolve("lake").toString)
    val schema = StructType(Seq(
      StructField("okey", LongType), StructField("cust", LongType),
      StructField("odate", StringType), StructField("price", DoubleType)))
    def line(i: Int) =
      s"$i,${i % 53},2024-0${1 + i % 3}-${10 + i % 15},${(i * 131 % 9000) / 100.0 + 5.0}"
    def fileFor(name: String, ids: Range): Unit =
      Files.write(inbox.resolve(name),
        ("okey,cust,odate,price\n" + ids.map(line).mkString("\n")).getBytes)
    fileFor("w1.csv", 0 until 300)
    fileFor("w2.csv", 300 until 900)
    def drain(): Unit = StreamPipeline.runAvailableNow(
      StreamPipeline.goldInbox(spark, inbox.toString, schema,
        dateCol = "odate", custCol = "cust", priceCol = "price",
        lake = lake, checkpoint = ckpt, maxFilesPerTrigger = 1))
    drain()
    def report() = graft.queries.Gold.foldDailySummary(
        lake.read(spark, "sales_partials"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).toSet
    val streamed = report()
    // direct single-batch twin over the union of both waves
    import spark.implicits._
    val all = (0 until 900).map { i =>
      val Array(k, c, d, p) = line(i).split(",")
      (k.toLong, c.toLong, d, p.toDouble)
    }.toDF("okey", "cust", "odate", "price")
    val direct = graft.queries.Gold.foldDailySummary(
        all.select(to_date(col("odate")).as("order_date"),
          col("cust").as("o_custkey"), col("price"))
          .groupBy("order_date", "o_custkey")
          .agg(count(lit(1)).as("pn"),
            graft.core.Exact.dpartSum(col("price")).as("prev")))
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).toSet
    assert(streamed == direct, "streamed gold view diverged from direct recompute")
    // late third wave: only the new partials land; the fold re-answers
    fileFor("w3.csv", 900 until 1200)
    drain()
    val all3 = (0 until 1200).map { i =>
      val Array(k, c, d, p) = line(i).split(",")
      (k.toLong, c.toLong, d, p.toDouble)
    }.toDF("okey", "cust", "odate", "price")
    val direct3 = graft.queries.Gold.foldDailySummary(
        all3.select(to_date(col("odate")).as("order_date"),
          col("cust").as("o_custkey"), col("price"))
          .groupBy("order_date", "o_custkey")
          .agg(count(lit(1)).as("pn"),
            graft.core.Exact.dpartSum(col("price")).as("prev")))
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).toSet
    assert(report() == direct3, "third wave did not fold in")
    // drain with nothing new: shard-scoped replace keeps the view unchanged
    drain()
    assert(report() == direct3, "idempotence across drains")
  }

  test("continuous DQ audit: per-batch constraint reports land keyed; replay overwrites") {
    import graft.operators.Constraints._
    val root = Files.createTempDirectory("graft-stream-dq")
    val inbox = root.resolve("inbox"); Files.createDirectories(inbox)
    val ckpt = root.resolve("ckpt").toString
    val lake = new graft.lake.ParquetDirFormat(root.resolve("lake").toString)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("status", StringType),
      StructField("v", DoubleType)))
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val rules = Seq(
      NotNull("id"), Unique(Seq("id")),
      AcceptedValues("status", Seq("A", "B")), InRange("v", 0.0, 10.0),
      ForeignKey(Seq("id"), parent, Seq("pk"), "parent"))
    // batch 1 clean; batch 2 carries one of each violation class
    Files.write(inbox.resolve("b1.csv"),
      "id,status,v\n1,A,5.0\n2,B,7.0\n3,A,0.0\n".getBytes)
    Files.write(inbox.resolve("b2.csv"),
      "id,status,v\n1,A,5.0\n1,Z,11.0\n,A,5.0\n9,B,5.0\n".getBytes)
    def drain(): Unit = StreamPipeline.runAvailableNow(
      StreamPipeline.dqInbox(spark, inbox.toString, schema, rules,
        lake, ckpt, maxFilesPerTrigger = 1))
    drain()
    def report() = lake.read(spark, "dq_report")
      .collect()
      .map(r => (r.getLong(3), r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val rep = report()
    assert(rep.size == 10, s"5 rules x 2 batches, got ${rep.size}")
    // the clean batch is all zeros; the dirty batch counts each class once
    val batches = rep.keys.map(_._1).toSeq.distinct.sorted
    val (clean, dirty) =
      if (rep((batches(0), "not_null", "id")) == 0L) (batches(0), batches(1))
      else (batches(1), batches(0))
    assert(Seq("not_null", "unique", "accepted_values", "in_range", "foreign_key")
      .forall(t => rep.exists { case ((b, rt, _), v) => b == clean && rt == t && v == 0L }))
    assert(rep((dirty, "not_null", "id")) == 1L)
    assert(rep((dirty, "unique", "id")) == 1L)
    assert(rep((dirty, "accepted_values", "status")) == 1L)
    assert(rep((dirty, "in_range", "v")) == 1L)
    assert(rep((dirty, "foreign_key", "id->parent(pk)")) == 1L)
    // replayed drain recomputes identical reports and overwrites its rows
    drain()
    assert(report() == rep, "replay must not duplicate or change reports")
  }

  test("continuous CDC apply: change files fold into the lake; replay converges") {
    val root = Files.createTempDirectory("graft-stream-cdc")
    val inbox = root.resolve("inbox"); Files.createDirectories(inbox)
    val ckpt = root.resolve("ckpt").toString
    val lake = new graft.lake.ParquetDirFormat(root.resolve("lake").toString)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("ver", LongType), StructField("op", StringType)))
    def drain(): Unit = StreamPipeline.runAvailableNow(
      StreamPipeline.cdcInbox(spark, inbox.toString, schema, lake, "t",
        Seq("id"), "op", "ver", ckpt, maxFilesPerTrigger = 1))
    Files.write(inbox.resolve("c1.csv"),
      "id,v,ver,op\n1,a,1,insert\n2,b,1,insert\n3,c,1,insert\n".getBytes)
    drain()
    def state() = lake.read(spark, "t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state() == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    // second file: update 1, delete 2, full lifecycle on 4 (nets to nothing)
    Files.write(inbox.resolve("c2.csv"),
      ("id,v,ver,op\n1,A2,2,update\n2,b,2,delete\n" +
        "4,d1,2,insert\n4,d2,3,update\n4,d3,4,delete\n").getBytes)
    drain()
    assert(state() == Map(1L -> "A2", 3L -> "c"))
    // fresh checkpoint = full replay of BOTH files: applyCdc converges
    drain()
    StreamPipeline.runAvailableNow(
      StreamPipeline.cdcInbox(spark, inbox.toString, schema, lake, "t",
        Seq("id"), "op", "ver", root.resolve("ckpt2").toString,
        maxFilesPerTrigger = 1))
    assert(state() == Map(1L -> "A2", 3L -> "c"), "replay must converge")
  }

  test("stream-stream join: time-bounded matches; outer emits after watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val impressions = MemoryStream[(Long, java.sql.Timestamp, String)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamPipeline.streamStreamJoin(
      impressions.toDF.toDF("ad_id", "imp_ts", "campaign"),
      clicks.toDF.toDF("ad_id", "click_ts"),
      keys = Seq("ad_id"), leftTs = "imp_ts", rightTs = "click_ts",
      watermark = "5 minutes", within = "10 minutes", joinType = "left_outer")
    val q = joined.writeStream.format("memory")
      .queryName("ss_join").outputMode("append").start()
    try {
      // ad 1 clicked inside the window; ad 2 clicked OUTSIDE it; ad 3 never
      impressions.addData(
        (1L, ts("2024-01-01 00:00:00"), "c1"),
        (2L, ts("2024-01-01 00:00:00"), "c1"),
        (3L, ts("2024-01-01 00:00:00"), "c2"))
      clicks.addData(
        (1L, ts("2024-01-01 00:05:00")),
        (2L, ts("2024-01-01 00:20:00")))
      q.processAllAvailable()
      val inner = spark.table("ss_join").where(col("click_ts").isNotNull)
        .collect().map(r => r.getLong(0)).toSeq
      assert(inner == Seq(1L), s"only ad 1 clicked within 10 minutes: $inner")
      // outer rows for ads 2/3 may only emit once the GLOBAL watermark (min
      // across both sources) passes their join window — advance both sides
      impressions.addData((99L, ts("2024-01-01 02:00:00"), "c9"))
      clicks.addData((99L, ts("2024-01-01 02:01:00")))
      q.processAllAvailable()
      val rows = spark.table("ss_join").collect()
        .map(r => (r.getLong(0), Option(r.get(3)))).toMap
      assert(rows(1L).isDefined && rows(99L).isDefined)
      assert(rows(2L).isEmpty, "out-of-window click must NOT attribute")
      assert(rows(3L).isEmpty, "unclicked impression emits with NULL click")
      assert(spark.table("ss_join").count() == 4)
    } finally q.stop()
  }
}
