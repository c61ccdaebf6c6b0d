package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  def emb = Tables.embeddings(spark, TestSpark.sfDir)

  test("brute-force top-k: k rows per query, ranks contiguous, cosine sorted") {
    val rows = Similarity.bruteForceTopK(emb, nQueries = 5, k = 10).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.values.foreach { g =>
      assert(g.length == 10)
      val sorted = g.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to 10))
      val cosines = sorted.map(_.getDouble(2)).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
  }

  test("l2Normalize yields unit vectors and is idempotent") {
    import org.apache.spark.sql.functions._
    val n1 = Similarity.l2Normalize(emb)
    val norms = n1.limit(20).select(expr("sqrt(graft_dot(embedding, embedding))")).collect()
      .map(_.getDouble(0))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-3, s"norm $n"))
    val n2 = Similarity.l2Normalize(n1)
    val a = n1.orderBy("vec_id").limit(3).select("embedding").collect().map(_.getSeq[Float](0))
    val b = n2.orderBy("vec_id").limit(3).select("embedding").collect().map(_.getSeq[Float](0))
    a.zip(b).foreach { case (x, y) =>
      x.zip(y).foreach { case (u, v) => assert(math.abs(u - v) < 1e-4) } }
  }

  test("native graft_lsh_buckets matches an independent Scala reimplementation") {
    import graft.functions.Portable
    import org.apache.spark.sql.functions._
    val nT = 16; val nB = 4
    val rows = Similarity.lshBuckets(emb, nT, nB)
      .select("vec_id", "embedding", "table", "bucket").limit(2000).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val t = r.getInt(2)
      var expected = 0L
      for (b <- 0 until nB) {
        var dot = 0.0
        for (i <- 0 until math.min(v.length, Portable.Dim))
          dot += v(i).toDouble * Portable.lshPlane(t * nB + b, i)
        if (dot >= 0) expected |= (1L << b)
      }
      assert(r.getLong(3) == expected,
        s"vec ${r.getLong(0)} table $t: native ${r.getLong(3)} != reference $expected")
    }
  }

  test("deterministic IVF-flat recall@10 >= 0.4 against brute force") {
    val exact = Similarity.bruteForceTopK(emb, nQueries = 10, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfFlatTopK(emb, nQueries = 10, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF-flat recall was $recall")
  }

  test("IVF ANN recall@10 >= 0.5 against brute force") {
    val exact = Similarity.bruteForceTopK(emb, nQueries = 10, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfAnnTopK(emb, nQueries = 10, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall was $recall")
  }

  test("LSH ANN recall@10 >= 0.6 against brute force") {
    val exact = Similarity.bruteForceTopK(emb, nQueries = 10, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshAnnTopK(emb, nQueries = 10, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall was $recall")
  }

  test("LSH index round trip serves results identical to the in-memory path") {
    val root = java.nio.file.Files.createTempDirectory("graft-lsh-index")
    val lake = new graft.lake.ParquetDirFormat(root.toString)
    Similarity.buildLshIndex(emb, lake)
    val served = Similarity.queryLshIndex(spark, lake, emb, "lsh", 10, 10)
    val mem = Similarity.lshAnnTopK(emb, nQueries = 10, k = 10)
    assert(served.exceptAll(mem).isEmpty && mem.exceptAll(served).isEmpty)
    // rebuilding over an existing index overwrites, not appends
    Similarity.buildLshIndex(emb, lake)
    val again = Similarity.queryLshIndex(spark, lake, emb, "lsh", 10, 10)
    assert(again.count() == mem.count())
  }

  test("appendLshIndex: frozen planes, appended vectors bucket identically") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-lsh-append")
    val lake = new graft.lake.ParquetDirFormat(root.toString)
    // non-default params: the append MUST read them back from lsh_params
    // rather than trust caller defaults, or it would hash into a different
    // bucket space than the build
    Similarity.buildLshIndex(emb, lake, nTables = 8, nBits = 3)
    val before = lake.read(spark, "lsh_buckets").count()
    Similarity.appendLshIndex(emb.withColumn("vec_id", col("vec_id") + 100000L), lake)
    val bk = lake.read(spark, "lsh_buckets")
    assert(bk.count() == before * 2, "append must add, not overwrite")
    val orig = bk.filter(col("vec_id") < 100000L)
    val shifted = bk.filter(col("vec_id") >= 100000L)
      .withColumn("vec_id", col("vec_id") - 100000L)
    assert(shifted.exceptAll(orig).isEmpty && orig.exceptAll(shifted).isEmpty,
      "appended buckets must match the build-time bucketing of the same vectors")
    // the served query still runs against the doubled index, k rows per query
    val served = Similarity.queryLshIndex(spark, lake, emb, "lsh", 5, 10,
      nTables = 8, nBits = 3)
    assert(served.groupBy("query_id").count().collect().forall(_.getLong(1) == 10))
    // appending where no index exists must fail loudly, not create one
    intercept[IllegalArgumentException] {
      Similarity.appendLshIndex(emb, new graft.lake.ParquetDirFormat(
        java.nio.file.Files.createTempDirectory("graft-lsh-none").toString))
    }
  }

  test("appendPqIndex: frozen codebook, appended vectors encode identically") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-pq-append")
    val lake = new graft.lake.ParquetDirFormat(root.toString)
    Similarity.buildPqIndex(emb, lake)
    val before = lake.read(spark, "pq_codes").count()
    // the "increment": the same embeddings under shifted ids — same vectors
    // through the frozen codebook MUST produce byte-identical codes
    Similarity.appendPqIndex(emb.withColumn("vec_id", col("vec_id") + 100000L), lake)
    val codes = lake.read(spark, "pq_codes")
    assert(codes.count() == before * 2, "append must add, not overwrite")
    val orig = codes.filter(col("vec_id") < 100000L)
    val shifted = codes.filter(col("vec_id") >= 100000L)
      .withColumn("vec_id", col("vec_id") - 100000L)
    assert(shifted.exceptAll(orig).isEmpty && orig.exceptAll(shifted).isEmpty,
      "appended codes must match the build-time encoding of the same vectors")
    // and the served query still runs against the doubled index
    val served = Similarity.queryPqIndex(spark, lake, emb, "pq", 5, 10)
    assert(served.groupBy("query_id").count().collect().forall(_.getLong(1) == 10))
  }

  test("appendIvfIndex: frozen centroids, appended vectors assign identically") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-ivf-append")
    val lake = new graft.lake.ParquetDirFormat(root.toString)
    Similarity.buildIvfIndex(emb, lake)
    val before = lake.read(spark, "ivf_assign").count()
    Similarity.appendIvfIndex(emb.withColumn("vec_id", col("vec_id") + 100000L), lake)
    val assign = lake.read(spark, "ivf_assign")
    assert(assign.count() == before * 2)
    val orig = assign.filter(col("vec_id") < 100000L)
    val shifted = assign.filter(col("vec_id") >= 100000L)
      .withColumn("vec_id", col("vec_id") - 100000L)
    assert(shifted.exceptAll(orig).isEmpty && orig.exceptAll(shifted).isEmpty,
      "appended assignments must match the build-time cells of the same vectors")
  }

  test("append drift metric crosses the rebuild threshold exactly when raw recall rots") {
    import org.apache.spark.sql.functions._
    val thr = Similarity.DriftRebuildThreshold
    // Base corpus: the original table minus the query id range, so served
    // queries (vec_id < 10) come from the APPENDED increment — the
    // production shape where fresh data is what gets queried. Ids stay dense
    // from 10, so the stride-sampled codebook is intact.
    val base = emb.filter(col("vec_id") >= 10)
    // The increment re-ids everything except the query range out of the way.
    def reId(df: org.apache.spark.sql.DataFrame) = df.withColumn("vec_id",
      when(col("vec_id") < 10, col("vec_id")).otherwise(col("vec_id") + 1000000L))
    // In-distribution increment: the same vectors.
    val incSame = reId(emb)
    // Drifted increment: a constant per-component offset. Translation
    // preserves every within-increment L2 distance (true neighbors among the
    // increment are unchanged, and they ARE the true top-k — base vectors
    // sit ||delta||^2 = 256 away), so any recall loss is PURELY the frozen
    // codebook's fault.
    val incShift = reId(emb).withColumn("embedding",
      expr("transform(embedding, x -> cast(x + 2.0 as float))"))

    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    }
    def scenario(inc: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val root = java.nio.file.Files.createTempDirectory("graft-pq-drift")
      val lake = new graft.lake.ParquetDirFormat(root.toString)
      Similarity.buildPqIndex(base, lake)
      val ratio = Similarity.appendPqIndex(inc, lake)
      val combined = base.union(inc)
      // RAW ADC ranks (refine=0): code quality unmasked by exact refinement
      val approx = Similarity.queryPqIndex(spark, lake, combined, "pq", 10, 10, refine = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val vecs = combined.collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val exact = (0L until 10L).flatMap { q =>
        vecs.keys.filter(_ != q).toSeq
          .sortBy(v => (l2(vecs(q), vecs(v)), v)).take(10).map(v => (q, v))
      }.toSet
      (ratio, (exact & approx).size.toDouble / exact.size)
    }
    val (rSame, recSame) = scenario(incSame)
    val (rShift, recShift) = scenario(incShift)
    info(f"in-distribution: ratio $rSame%.2f recall $recSame%.2f; " +
      f"shifted: ratio $rShift%.2f recall $recShift%.2f")
    // the metric itself: ~1.0 for matching distributions, past the threshold
    // for the shifted one
    assert(rSame < thr, s"in-distribution append flagged as drift: $rSame")
    assert(rShift > thr, s"shifted append not flagged: $rShift")
    // the coupling VERDICT asks for: the threshold crossing coincides with
    // the recall floor (half the healthy raw recall)
    val floor = recSame / 2
    assert((rSame > thr) == (recSame < floor))
    assert((rShift > thr) == (recShift < floor),
      s"drift flagged but recall did not rot: $recShift vs floor $floor")
  }

  test("append drift metric: IVF twin orders the same way") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-ivf-drift")
    val lake = new graft.lake.ParquetDirFormat(root.toString)
    Similarity.buildIvfIndex(emb, lake)
    val rSame = Similarity.appendIvfIndex(
      emb.withColumn("vec_id", col("vec_id") + 1000000L), lake)
    val rShift = Similarity.appendIvfIndex(
      emb.withColumn("vec_id", col("vec_id") + 2000000L)
        .withColumn("embedding", expr("transform(embedding, x -> cast(x + 2.0 as float))")),
      lake)
    info(f"IVF drift: same $rSame%.2f shifted $rShift%.2f")
    assert(rSame < Similarity.DriftRebuildThreshold)
    assert(rShift > Similarity.DriftRebuildThreshold)
  }

  test("PQ ANN recall@10 against exact L2 brute force") {
    // PQ ranks by (approximate) squared L2, so the honest reference is the
    // exact L2 top-k, computed driver-side on the (tiny) test table
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    }
    val exact = (0L until 10L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .sortBy(v => (l2(vecs(q), vecs(v)), v)).take(10).map(v => (q, v))
    }.toSet
    val approx = Similarity.pqAnnTopK(emb, nQueries = 10, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"PQ+refine recall@10 = $recall%.2f")
    assert(recall >= 0.7, s"PQ refined recall was $recall")
    // the raw compressed-domain ranks find SOME signal even on this
    // unstructured corpus (refinement is what makes them usable)
    val raw = Similarity.pqAnnTopK(emb, nQueries = 10, k = 10, refine = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rawRecall = (exact & raw).size.toDouble / exact.size
    info(f"PQ raw recall@10 = $rawRecall%.2f")
    assert(rawRecall > 0.0)
    // distances are non-negative and rank-consistent per query, both modes
    Seq(Similarity.pqAnnTopK(emb, nQueries = 10, k = 10),
        Similarity.pqAnnTopK(emb, nQueries = 10, k = 10, refine = 0))
      .foreach(_.collect().groupBy(_.getLong(0)).values.foreach { g =>
        val sorted = g.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
        assert(sorted == sorted.sorted && sorted.forall(_ >= 0.0))
      })
  }

  test("SQ8 recall@10 beats PQ's floor (256 levels/dim is near-lossless)") {
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    }
    val exact = (0L until 10L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .sortBy(v => (l2(vecs(q), vecs(v)), v)).take(10).map(v => (q, v))
    }.toSet
    val approx = Similarity.sq8AnnTopK(emb, nQueries = 10, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"SQ8+refine recall@10 = $recall%.2f")
    assert(recall >= 0.9, s"SQ8 refined recall was $recall")
  }

  test("filteredTopK: every neighbor is allowed, and an all-allowing set equals brute force") {
    import org.apache.spark.sql.functions._
    val allowed = emb.filter(col("label") =!= 3).select("vec_id")
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet
    val res = Similarity.filteredTopK(emb, allowed, nQueries = 5, k = 10).collect()
    assert(res.nonEmpty)
    res.foreach(r => assert(allowedIds.contains(r.getLong(1)),
      s"neighbor ${r.getLong(1)} escaped the allow-set"))
    // pre-filter semantics: k full rows per query even though ~10% of the
    // corpus is filtered out (post-filtering a brute top-k could not promise this)
    res.groupBy(_.getLong(0)).values.foreach(g => assert(g.length == 10))
    val everything = Similarity.filteredTopK(emb, emb.select("vec_id"), 5, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = Similarity.bruteForceTopK(emb, 5, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(everything == brute)
  }

  test("filteredTopK: a tight filter re-ranks — results are the filtered subset's own top-k") {
    import org.apache.spark.sql.functions._
    val allowed = emb.filter(col("vec_id") % 5 === 0).select("vec_id")
    val res = Similarity.filteredTopK(emb, allowed, nQueries = 3, k = 5).collect()
    res.foreach(r => assert(r.getLong(1) % 5 == 0))
    // expected: brute-force cosine over ONLY the allowed vectors
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def cos(a: Long, b: Long) =
      dot(vecs(a), vecs(b)) / (math.sqrt(dot(vecs(a), vecs(a))) * math.sqrt(dot(vecs(b), vecs(b))))
    val expected = (0L until 3L).flatMap { q =>
      vecs.keys.filter(v => v % 5 == 0 && v != q).toSeq
        .sortBy(v => (-cos(q, v), v)).take(5).map(v => (q, v))
    }.toSet
    assert(res.map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
  }

  test("filtered IVF serve: only allowed neighbors; an all-allowing set equals the unfiltered serve") {
    import org.apache.spark.sql.functions._
    val lake = new graft.lake.ParquetDirFormat(
      java.nio.file.Files.createTempDirectory("graft_ivf_filter_").toString)
    Similarity.buildIvfIndex(emb, lake)
    val allowed = emb.filter(col("label") =!= 3).select("vec_id")
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet
    val filtered = Similarity.queryIvfIndex(spark, lake, emb, "ivf", 5, 10,
        allowed = Some(allowed)).collect()
    assert(filtered.nonEmpty)
    filtered.foreach(r => assert(allowedIds.contains(r.getLong(1))))
    val everything = Similarity.queryIvfIndex(spark, lake, emb, "ivf", 5, 10,
        allowed = Some(emb.select("vec_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val unfiltered = Similarity.queryIvfIndex(spark, lake, emb, "ivf", 5, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(everything == unfiltered)
  }

  test("JL randomProject matches an independent Scala reimplementation, bit for bit") {
    import graft.functions.Portable
    val outDim = 16
    val signs = Portable.rpSigns(outDim)
    val raw = emb.orderBy("vec_id").limit(50).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val projected = Similarity.randomProject(emb, outDim)
      .filter(org.apache.spark.sql.functions.col("vec_id") < 50).collect()
    assert(projected.length == 50)
    projected.foreach { r =>
      val v = raw(r.getLong(0))
      val p = r.getSeq[Float](1)
      assert(p.length == outDim)
      for (j <- 0 until outDim) {
        // same left-assoc double accumulation, same float rounding
        var s = 0.0
        for (i <- 0 until Portable.Dim)
          s = if (signs(j)(i) < 0) s - v(i).toDouble else s + v(i).toDouble
        assert(p(j) == s.toFloat,
          s"vec ${r.getLong(0)} component $j: native ${p(j)} != reference ${s.toFloat}")
      }
    }
  }

  test("JL rpRecall: one row per query, recall in [0,1], mean far above the random baseline") {
    val rows = Similarity.rpRecall(emb, 16, nQueries = 10, k = 10).collect()
    assert(rows.length == 10)
    val recalls = rows.map(_.getDouble(2))
    recalls.foreach(r => assert(r >= 0.0 && r <= 1.0))
    // random top-10 of ~N vectors would overlap ~10/N (< 0.03 on every SF);
    // a sign-correct 4x projection holds an order of magnitude more
    assert(recalls.sum / recalls.length > 0.05,
      s"mean recall ${recalls.sum / recalls.length} suspiciously low — projection broken?")
  }
}
