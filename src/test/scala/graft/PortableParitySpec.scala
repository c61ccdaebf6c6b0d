package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Portable
import graft.plans.GraftFunctions

/** The native Catalyst expressions must be bitwise-equal to the portable SQL
  * chains the DuckDB oracles evaluate — this is what licenses using them in
  * oracle-checked plans. */
class PortableParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("graft_phash == portable HOF chain on ASCII + CJK + accents") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq("example", "spark sql", "", "a", "部分文字", "Zürich café",
      "😀 astral").toDF("tok")
    val rows = df.select(
      expr("graft_phash(tok)").as("native"),
      expr(Portable.phashSpark("tok")).as("portable")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("graft_tokens == portable HOF chain on edge whitespace shapes") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = (Seq("plain words here", "  leading", "trailing  ", "a  b   c",
      "", " ", "    ", "one", "tab\there stays one token") ++
      graft.core.Tables.documents(spark, TestSpark.sfDir)
        .select("text").collect().map(_.getString(0)).take(50)).toDF("text")
    val rows = df.select(
      expr("graft_tokens(text)").as("native"),
      expr(Portable.tokensSpark("text")).as("portable")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("graft_shingles == array_distinct of the portable HOF chain") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet").limit(100)
    val rows = docs.select(
      expr("graft_shingles(text, 3)").as("native"),
      array_distinct(expr(
        s"CASE WHEN size(${Portable.tokensSpark("text")}) >= 3 THEN " +
          Portable.shinglesSpark(Portable.tokensSpark("text"), 3) +
          s" ELSE array() END")).as("portable")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("graft_band_keys == the 42-wide bandKeyCols polynomial chain, exactly") {
    GraftFunctions.register(spark)
    // real signatures (the corpus path) at BOTH banding schemes the gates
    // use: 42x3 (dedup family default) and 63x2 (the e2e chain); plus a
    // rowsPerBand=1 scheme, whose fold is the bare sig element (no mod)
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet").limit(100)
    Seq((42, 3), (63, 2), (4, 1)).foreach { case (bands, rows) =>
      val k = bands * rows
      val sig = docs.select(
        expr(s"graft_minhash(graft_shingle_hashes(text, 3), $k)").as("sig"))
        .filter(size(col("sig")) > 0 && expr("sig[0]") =!= Long.MaxValue)
      val out = sig.select(
        expr(s"graft_band_keys(sig, $bands, $rows)").as("native"),
        array(graft.operators.Dedup.bandKeyCols(bands, rows): _*).as("portable"))
        .collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"scheme ${bands}x$rows")
      }
    }
  }

  test("graft_rp_project == the outDim x Dim rpProjectSpark chain, exactly") {
    GraftFunctions.register(spark)
    // real embeddings (the corpus path) at the gate's outDim=16, a 1-component
    // projection (the degenerate chain), and the identity-width Dim
    val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet").limit(100)
    Seq(16, 1, Portable.Dim).foreach { outDim =>
      val out = emb.select(
        expr(s"graft_rp_project(embedding, $outDim)").as("native"),
        expr(Portable.rpProjectSpark("embedding", outDim)).as("portable"))
        .collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        assert(r.getSeq[Float](0) == r.getSeq[Float](1), s"outDim $outDim")
      }
    }
  }

  test("graft_ql2_argmin == the crossJoin+topKPerKey aggregate argmin, exactly") {
    GraftFunctions.register(spark)
    import graft.operators.Scale
    val q = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet").limit(200)
      .select(col("vec_id"), expr(Portable.quantVecSpark("embedding")).as("q"))
      .localCheckpoint(true)
    // centroids = the first 8 quantized vectors, with non-contiguous cell ids
    // (3,5,...) so the tie rule is exercised on id order, not array order
    val cent = q.filter(col("vec_id") < 8)
      .select((col("vec_id") * 2 + 3).as("cell"), col("q").as("c"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val centsSql = cent.map(_._2.mkString("array(", "L, ", "L)"))
      .mkString("array(", ", ", ")")
    val cellsSql = cent.map(_._1).mkString("array(", "L, ", "L)")
    val native = q.select(col("vec_id"),
        expr(s"graft_ql2_argmin(q, $centsSql, $cellsSql)").as("ac"))
      .select(col("vec_id"), col("ac.cell").as("cell"), col("ac.dist").as("dist"))
    val centDf = q.sparkSession.createDataFrame(cent.toSeq.map {
      case (cl, c) => (cl, c) }).toDF("cell", "c")
    val agg = Scale.topKPerKey(
        q.crossJoin(broadcast(centDf))
          .withColumn("dist", expr(Portable.qL2Spark("q", "c")))
          .select("vec_id", "dist", "cell"),
        Seq("vec_id"), Seq(("dist", false), ("cell", false)), 1, Seq())
      .select("vec_id", "cell", "dist")
    val n = native.orderBy("vec_id").collect().toSeq
    val a = agg.orderBy("vec_id").collect().toSeq
    assert(n.nonEmpty && n.size == a.size)
    assert(n == a)
  }

  /** Edge corpus for the multi-format parse twins: every dispatch family
    * padded and unpadded, dispatch-matching-but-unparseable values, regex
    * backtracking traps (3-digit runs, letter-run boundaries), whitespace
    * shapes, and garbage. */
  private val tsEdgeCorpus = Seq(
    "2023-01-15 10:20:30", "2023-1-5 1:2:3", "2023/01/15 10:20:30",
    "2023/1/5 1:2:3", "1/5/2023 1:2:3", "01/15/2023 10:20:30",
    "1-5-2023 1:2:3", "01-15-2023 10:20:30", "15.01.2023 10:20:30",
    "5.1.2023 1:2:3", "20230115 10:20:30", "Jan 15 2023 10:20:30",
    "Jan 5 2023 1:2:3", "15 Jan 2023 10:20:30", "5 Jan 2023 1:2:3",
    "January 15, 2023 10:20:30", "January 5, 2023 1:2:3",
    // dispatch matches, parse must fail -> NULL in both
    "2023-13-40 99:99:99", "Notamonth 15 2023 10:20:30", "99/99/9999 1:2:3",
    "20230115 10:20", "2023-01-15", "1/5/2023",
    // regex traps: 3-digit runs, digits after the 1-2 digit match, commas
    "123 Jan 2023 1:2:3", "Jan 123 2023 1:2:3", "123/5/2023 1:2:3",
    "January 15 2023 10:20:30", "Jan 15, 2023 10:20:30",
    // whitespace: the ts chain trims before dispatch
    "  2023-01-15 10:20:30  ", " Jan 15 2023 10:20:30", "\t2023-01-15 10:20:30",
    // garbage / empties
    "", " ", "-", "not a date", "2023", "20230115", "ä 5 2023 1:2:3")

  test("graft_ts_multi == portable CASE/rlike chain, bitwise") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = tsEdgeCorpus.toDF("s")
    val rows = df.select(
      expr("graft_ts_multi(s)").as("native"),
      graft.operators.Cleaning.parseTimestampMultiPortable("s").as("portable"),
      col("s")).collect()
    rows.foreach { r =>
      assert(r.get(0) == r.get(1), s"ts mismatch on '${r.getString(2)}'")
    }
  }

  test("graft_date_multi == portable CASE/rlike chain, bitwise") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val dateCorpus = Seq(
      "2023-01-15", "2023-1-5", "1/5/2023", "01/15/2023", "15.01.2023",
      "5.1.2023", "20230115", "2023-13-40", "99/99/9999", "123.5.2023",
      "202301159", "2023011", "1/5/2023 extra", "20230115 ", " 2023-01-15",
      "", " ", "not a date", "15-01-2023")
    val df = dateCorpus.toDF("s")
    val rows = df.select(
      expr("graft_date_multi(s)").as("native"),
      graft.operators.Cleaning.parseDateMultiPortable("s").as("portable"),
      col("s")).collect()
    rows.foreach { r =>
      assert(r.get(0) == r.get(1), s"date mismatch on '${r.getString(2)}'")
    }
  }

  test("graft_dot == fixed-order expression chain, bitwise") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet").limit(50)
    val joined = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("eb")).limit(5))
    val rows = joined.select(
      expr("graft_dot(ea, eb)").as("native"),
      expr(s"(${Portable.dotSpark("ea", "eb")})").as("portable")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_l2 == fixed-order subL2 chain over the full dim, bitwise") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet").limit(50)
    val joined = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("eb")).limit(5))
    val rows = joined.select(
      expr("graft_l2(ea, eb)").as("native"),
      expr(s"(${Portable.subL2Spark("ea", "eb", 0, Portable.Dim)})").as("portable")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_ql2 == unrolled integer qL2 chain, exactly") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet").limit(30)
      .select(col("vec_id"), expr(Portable.quantVecSpark("embedding")).as("q"))
    val joined = emb.select(col("vec_id").as("ia"), col("q").as("qa"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("q").as("qb")).limit(5))
    val rows = joined.select(
      expr("graft_ql2(qa, qb)").as("native"),
      expr(s"(${Portable.qL2Spark("qa", "qb")})").as("portable")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("graft_sq8_encode == unrolled affine-snap chain, exactly") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val stats = emb.agg(expr("graft_minmax_arr(embedding)").as("st"))
      .select(col("st.mns").as("mns"), col("st.mxs").as("mxs"))
    // scalar-aggregate twin of the native min/max (the oracle's spelling)
    val statsCols = emb.agg(count(lit(1)).as("__n"),
      Portable.sq8StatsSpark("embedding").map(expr): _*).drop("__n")
    val mm = statsCols.head()
    val mmNative = stats.head()
    (1 to Portable.Dim).foreach { j =>
      assert(java.lang.Double.doubleToLongBits(mm.getAs[Double](s"mn_$j")) ==
        java.lang.Double.doubleToLongBits(mmNative.getSeq[Double](0)(j - 1)),
        s"min mismatch at dim $j")
      assert(java.lang.Double.doubleToLongBits(mm.getAs[Double](s"mx_$j")) ==
        java.lang.Double.doubleToLongBits(mmNative.getSeq[Double](1)(j - 1)),
        s"max mismatch at dim $j")
    }
    val rows = emb.limit(100).crossJoin(broadcast(stats))
      .crossJoin(broadcast(statsCols))
      .select(
        expr("graft_sq8_encode(embedding, mns, mxs)").as("native"),
        expr(Portable.sq8VecSpark("embedding")).as("portable")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("graft_pq_encode == crossJoin + min_by aggregation, exactly (codes) and bitwise (qerr)") {
    GraftFunctions.register(spark)
    val m = 8; val sub = Portable.Dim / m; val ksub = 16
    val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val cent = emb.filter(col("vec_id") < ksub)
      .select(col("vec_id").as("j"), col("embedding").as("emb_c"))
    // former formulation: x-ksub fan-out + min_by hash aggregates
    val d2Cols = (0 until m).map(mm =>
      expr(Portable.subL2Spark("embedding", "emb_c", mm * sub, sub)).as(s"d2_$mm"))
    val scored = emb.crossJoin(broadcast(cent))
      .select(col("vec_id") +: col("j") +: d2Cols: _*)
    val qerr = (0 until m).map(mm => min(col(s"d2_$mm"))).reduce(_ + _).as("qerr")
    val legacy = scored.groupBy("vec_id")
      .agg(min_by(col("j"), struct(col("d2_0"), col("j"))).as("code_0"),
        (1 until m).map(mm =>
          min_by(col("j"), struct(col(s"d2_$mm"), col("j"))).as(s"code_$mm")) :+ qerr: _*)
    val centArr = cent.agg(array_sort(collect_list(struct(col("j"), col("emb_c")))).as("cents"))
    val native = emb.crossJoin(broadcast(centArr))
      .select(col("vec_id"), expr(s"graft_pq_encode(embedding, cents, $m)").as("enc"))
      .select(col("vec_id") +:
        (0 until m).map(i => element_at(col("enc.codes"), i + 1).as(s"code_$i")) :+
        col("enc.qerr").as("qerr"): _*)
    val rows = native.join(legacy.withColumnRenamed("qerr", "qerr_l")
      .select(col("vec_id") +: (0 until m).map(i => col(s"code_$i").as(s"cl_$i")) :+
        col("qerr_l"): _*), "vec_id").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (0 until m).foreach(i =>
        assert(r.getAs[Long](s"code_$i") == r.getAs[Long](s"cl_$i"), s"code_$i mismatch"))
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("qerr")) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("qerr_l")), "qerr mismatch")
    }
  }

  test("graft_pq_adc == per-subspace broadcast join chain + left-assoc add, bitwise") {
    GraftFunctions.register(spark)
    val m = 8; val sub = Portable.Dim / m; val ksub = 16; val nQueries = 10
    val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val cent = emb.filter(col("vec_id") < ksub)
      .select(col("vec_id").as("j"), col("embedding").as("emb_c"))
    val centArr = cent.agg(array_sort(collect_list(struct(col("j"), col("emb_c")))).as("cents"))
    val codes = emb.crossJoin(broadcast(centArr))
      .select(col("vec_id"), expr(s"graft_pq_encode(embedding, cents, $m)").as("enc"))
      .select(col("vec_id") +:
        (0 until m).map(i => element_at(col("enc.codes"), i + 1).as(s"code_$i")): _*)
    val qCols = (0 until m).map(mm =>
      expr(Portable.subL2Spark("emb_q", "emb_c", mm * sub, sub)).as(s"q$mm"))
    val lut = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("emb_q"))
      .crossJoin(broadcast(cent))
      .select(col("query_id") +: col("j") +: qCols: _*)
      .localCheckpoint(false)
    // legacy: one broadcast join per subspace + left-assoc addition chain
    val joined = (0 until m).foldLeft(codes) { (acc, mm) =>
      val slice = lut.select(col("query_id"), col("j").as(s"code_$mm"), col(s"q$mm"))
      acc.join(broadcast(slice),
        if (mm == 0) Seq("code_0") else Seq("query_id", s"code_$mm"))
    }
    val approx = (1 until m).foldLeft("q0")((e, mm) => s"($e + q$mm)")
    val legacy = joined.select(col("vec_id"), col("query_id"),
      expr(approx).as("legacy_dist"))
    val lutRows = lut.groupBy("query_id").agg(
      array_sort(collect_list(struct(col("j") +: (0 until m).map(mm => col(s"q$mm")): _*)))
        .as("lutm"))
    val adcArgs = ("lutm" +: (0 until m).map(mm => s"code_$mm")).mkString(", ")
    val native = codes.crossJoin(broadcast(lutRows))
      .select(col("vec_id"), col("query_id"),
        expr(s"graft_pq_adc($adcArgs)").as("native_dist"))
    val rows = native.join(legacy, Seq("vec_id", "query_id")).collect()
    assert(rows.length == emb.count() * nQueries)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("native_dist")) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("legacy_dist")))
    }
  }
  test("graft_rep_stats == explode + two-level aggregate formulation, exactly") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // edge shapes: single token (no bigrams), all-identical, all-distinct,
    // repeated bigram, unicode tokens
    val docs = Seq(
      (1L, "solo"),
      (2L, "a a a a"),
      (3L, "w x y z"),
      (4L, "to be or not to be to be"),
      (5L, "héllo wörld héllo wörld héllo")
    ).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
      expr("graft_tokens(text)").as("toks")).filter(size(col("toks")) > 0)
    val native = toks.select(col("doc_id"), expr("graft_rep_stats(toks)").as("st"))
      .select(col("doc_id"), col("st.n_uni"), col("st.d_uni"), col("st.top_uni"),
        col("st.n_bi"), col("st.d_bi"), col("st.top_bi"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    def agg(exploded: org.apache.spark.sql.DataFrame) =
      exploded.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
        .groupBy("doc_id").agg(sum(col("tf")).as("n"),
          count(lit(1)).as("d"), max(col("tf")).as("top"))
    val uni = agg(toks.select(col("doc_id"), explode(col("toks")).as("t")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val bi = agg(toks.filter(size(col("toks")) > 1).select(col("doc_id"), explode(expr(
        "zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1), (a, b) -> concat(a, ' ', b))")).as("t")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    native.foreach { case (id, (nu, du, tu, nb, db, tb)) =>
      assert((nu, du, tu) == uni(id), s"uni mismatch for doc $id")
      assert((nb, db, tb) == bi.getOrElse(id, (0L, 0L, 0L)), s"bi mismatch for doc $id")
    }
  }

  test("graft_bucket_counts == explode + pmod(graft_phash) + count formulation, exactly") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // edge shapes: empty text (empty histogram), single token, colliding
    // buckets at a tiny bucket count, unicode, repeats
    val docs = Seq(
      (1L, ""),
      (2L, "solo"),
      (3L, "a b c d e f g h i j k l m n o p"),
      (4L, "to be or not to be to be"),
      (5L, "héllo wörld héllo wörld 部分")
    ).toDF("doc_id", "text")
    for (buckets <- Seq(2, 64)) {
      val toks = docs.select(col("doc_id"), expr("graft_tokens(text)").as("toks"))
      val native = toks
        .select(col("doc_id"), explode(expr(s"graft_bucket_counts(toks, $buckets)")).as("f"))
        .select(col("doc_id"), col("f.b"), col("f.x"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val portable = toks
        .select(col("doc_id"), explode(col("toks")).as("tok"))
        .select(col("doc_id"),
          pmod(expr("graft_phash(tok)"), lit(buckets.toLong)).as("b"))
        .groupBy("doc_id", "b").agg(count(lit(1)).cast("bigint").as("x"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(native == portable, s"bucket histogram mismatch at buckets=$buckets")
      // ascending-b order within each doc (the determinism convenience)
      val perDoc = toks.select(col("doc_id"),
          expr(s"graft_bucket_counts(toks, $buckets)").as("fs")).collect()
      perDoc.foreach { r =>
        val bs = r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0))
        assert(bs == bs.sorted, s"buckets not ascending for doc ${r.getLong(0)}")
      }
    }
  }

}
