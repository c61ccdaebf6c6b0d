package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Scale

class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted aggregation equals direct aggregation") {
    import spark.implicits._
    // heavily skewed: 90% of rows share one key
    val df = (1 to 10000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toDouble)
    }.toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3))).toMap
    val salted = Scale.saltedAggregate(df, Seq("k"), Map(
      "s" -> (col("v"), "sum"),
      "n" -> (lit(1), "count"),
      "mx" -> (col("v"), "max")), salt = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3))).toMap
    assert(salted == direct)
  }

  test("salted join equals plain join on skewed keys") {
    import spark.implicits._
    val big = (1 to 5000).map(i => (if (i % 5 == 0) "rare" else "hot", i.toLong))
      .toDF("k", "id")
    val small = Seq(("hot", 1.0), ("rare", 2.0)).toDF("k", "w")
    val plain = big.join(small, "k").agg(sum(col("id") * col("w"))).head().getDouble(0)
    val salted = Scale.saltedJoin(big, small, "k", col("id"), salt = 8)
      .agg(sum(col("id") * col("w"))).head().getDouble(0)
    assert(plain == salted)
  }

  test("bloomPrunedJoin equals plain join; prune stage drops most non-matching rows") {
    import spark.implicits._
    // 1% of big-side keys match the dimension — the regime where the filter
    // pays: almost every row can be dropped before the join's exchange
    val big = (1L to 20000L).map(i => (i, i % 1000)).toDF("row_id", "k")
    val small = Seq((7L, "a"), (413L, "b"), (999L, "c"), (7L, "d")).toDF("k", "tag")
    val plain = big.join(small, "k")
      .select("row_id", "k", "tag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val bloomed = Scale.bloomPrunedJoin(big, small, "k", bits = 1 << 14)
      .select("row_id", "k", "tag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(bloomed == plain)
    // the prune stage itself: every matching row survives (no false
    // negatives) and the false-positive tail is a sliver, not the table
    val pruned = Scale.bloomPrune(big, small, "k", bits = 1 << 14).count()
    val matching = big.join(small.select("k").distinct(), "k").count()
    assert(pruned >= matching, "bloom must never drop a matching row")
    assert(pruned < big.count() / 4,
      s"prune kept $pruned of 20000 rows — filter is not filtering")
    // degenerate sizing still correct (heavy collisions, tiny table): the
    // exact join clears every false positive the 64-bit filter lets through
    val tiny = Scale.bloomPrunedJoin(big, small, "k", bits = 64)
      .select("row_id", "k", "tag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(tiny == plain)
  }

  test("fanOutScan ENGAGES on a narrow file scan under AQE, passes through local relations") {
    import spark.implicits._
    // regression for the silent no-op: with AQE on, executedPlan is an
    // AdaptiveSparkPlanExec LEAF, so a leaf probe on it never sees the file
    // scan; the probe must read the pre-adaptive sparkPlan. Without this
    // assert the function can no-op engine-wide and every test still passes.
    val dir = java.nio.file.Files.createTempDirectory("graft-fanout")
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val narrow = spark.read.parquet(dir.toString)
    val fanned = Scale.fanOutScan(narrow)
    assert(fanned.queryExecution.sparkPlan.toString.contains("RoundRobinPartitioning"),
      "one-split scan must fan out to session parallelism")
    assert(fanned.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // non-file-scan inputs (local relations) pass through untouched
    val local = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    assert(Scale.fanOutScan(local) eq local)
  }

  test("bucketed join plan has no shuffle exchange") {
    import spark.implicits._
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("id", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("id", "vb")
    // the in-memory catalog forgets tables across JVMs but their warehouse
    // directories persist — clear both before recreating
    Seq("bkt_a", "bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Scale.writeBucketed(a, "bkt_a", "id", 8)
    Scale.writeBucketed(b, "bkt_b", "id", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("25x repeated dedupLines + connectedComponents leave no accumulating storage blocks") {
    import spark.implicits._
    // both operators localCheckpoint internally; checkpoint blocks free via
    // the ContextCleaner only once their plans become unreachable — a
    // long-lived session calling them repeatedly must NOT grow storage
    // memory monotonically (the r7/r8 unpersist lineage of findings)
    val docs = (0L until 2000L).map(i =>
      (i, s"unique line $i\nshared boilerplate everywhere\ncontent ${i % 37} tail"))
      .toDF("doc_id", "text")
    val pairs = (0L until 500L).map(i => (i, i - (i % 10))).toDF("doc_a", "doc_b")
    def liveBlocks: Int =
      spark.sparkContext.getRDDStorageInfo.count(_.numCachedPartitions > 0)
    System.gc(); Thread.sleep(200)
    val base = liveBlocks
    for (_ <- 1 to 25) {
      graft.operators.TextOps.dedupLines(docs, maxDf = 100)
        .agg(sum(length(col("clean_text")))).collect()
      graft.operators.Dedup.connectedComponents(pairs).count()
    }
    // poll: each iteration's frames are unreachable once the loop moves on,
    // so after GC the cleaner must drain the checkpoint blocks back to
    // (near) baseline — a small fixed slack covers cleaner in-flight lag
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    var settled = liveBlocks
    while (settled > base + 4 && System.nanoTime() < deadline) {
      System.gc(); Thread.sleep(500); settled = liveBlocks
    }
    info(s"storage blocks: baseline $base, after 25 runs (settled) $settled")
    assert(settled <= base + 4,
      s"storage blocks grew $base -> $settled after 25 repeated runs")
  }

  test("topKPerKey equals the window row_number twin (desc + tiebreak, many partitions)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // duplicate order values force the id tiebreak; 13 partitions force
    // partial-buffer serialization + k-bounded merges across map tasks
    val df = (1L to 20000L).map(i => (i % 257, (i * 31) % 100, i))
      .toDF("k", "v", "id").repartition(13)
    val got = Scale.topKPerKey(df, Seq("k"), Seq(("v", true), ("id", false)),
        k = 5, payload = Seq("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select("k", "rnk", "v", "id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
  }

  test("topKPerKey: k larger than group, ascending order, string payload") {
    import spark.implicits._
    val df = Seq((1L, 5L, "a"), (1L, 3L, "b"), (2L, 9L, "c"))
      .toDF("k", "v", "tag")
    val got = Scale.topKPerKey(df, Seq("k"), Seq(("v", false)), k = 10, payload = Seq("tag"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3))).toSet
    assert(got == Set((1L, 1, 3L, "b"), (1L, 2, 5L, "a"), (2L, 1, 9L, "c")))
  }

  test("topKPerKey aggregation state is k-bounded (ObjectHashAggregate, no window sort)") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i % 7, i)).toDF("k", "id")
    val plan = Scale.topKPerKey(df, Seq("k"), Seq(("id", false)), k = 3, payload = Seq.empty)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate in:\n$plan")
    assert(!plan.contains("Window"), s"top-k must not fall back to a window sort:\n$plan")
  }
}
