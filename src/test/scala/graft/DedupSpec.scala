package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  def docs = Tables.documents(spark, TestSpark.sfDir)

  test("minhash LSH pairs == exact n-gram jaccard pairs (verified candidates)") {
    val exact = Dedup.ngramJaccardPairs(docs, 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, 3, 42, 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
    assert(exact.nonEmpty, "corpus should contain near-dup pairs")
  }

  test("minhashContamination == exact cross-split slice of the jaccard pairs; never same-split") {
    import graft.functions.Portable
    // the exact reference: all-pairs jaccard restricted to pairs straddling
    // the deterministic split boundary (same bucket arithmetic the operator
    // derives inline)
    val splitOf = docs.select(col("doc_id"),
        expr(Portable.splitBucketSpark("doc_id")).as("b")).collect()
      .map(r => r.getLong(0) -> (if (r.getLong(1) < 90) "train" else "test")).toMap
    val exact = Dedup.ngramJaccardPairs(docs, 3, 0.5).collect()
      .flatMap { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        // ngramJaccardPairs emits doc_a < doc_b; orient to (test, train)
        (splitOf(a), splitOf(b)) match {
          case ("test", "train") => Some((a, b))
          case ("train", "test") => Some((b, a))
          case _                 => None
        }
      }.toSet
    val got = Dedup.minhashContamination(docs, 3, tau = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact)
    assert(got.nonEmpty, "corpus should contain cross-split near-dup pairs")
    got.foreach { case (t, tr) =>
      assert(splitOf(t) == "test" && splitOf(tr) == "train",
        s"pair ($t, $tr) does not straddle the split boundary")
    }
  }

  test("minhashAnchoredPairs == corpus-wide pairs oriented and filtered to anchors") {
    import spark.implicits._
    // anchors 0-2: 0~1 anchor-anchor near-dups, 2~5 anchor-other; docs 6-9
    // are a non-anchor-only near-dup cohort the anchored path must never pay
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val other = "one two three four five six seven eight nine ten eleven twelve"
    val tdocs = Seq(
      (0L, base), (1L, base.replace("mu", "nu")), (2L, other),
      (3L, "spark shuffles hash exchanges and sort merge joins entirely"),
      (4L, "parquet footers row groups and dictionary encoded pages here"),
      (5L, other.replace("twelve", "thirteen")),
      (6L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
      (7L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed io"),
      (8L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed ro"),
      (9L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed zo"))
      .toDF("doc_id", "text")
    val wide = Dedup.minhashLshPairs(tdocs, 3, 42, 3, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = wide.flatMap { case (a, b, j) => Seq((a, b, j), (b, a, j)) }
      .filter(_._1 < 3L).toSet
    val got = Dedup.minhashAnchoredPairs(tdocs, col("doc_id") < 3, 3, 42, 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      s"anchored pairs must equal the filtered corpus-wide table: $got vs $expected")
    assert(expected.exists(p => p._1 < 3 && p._2 < 3),
      "setup: an anchor-anchor pair must exist (both orientations covered)")
    assert(expected.exists(p => p._2 >= 3),
      "setup: an anchor-other pair must exist")
    assert(wide.exists(p => p._1 >= 6 && p._2 >= 6),
      "setup: a non-anchor-only cohort must exist in the corpus-wide table")
  }

  test("connected components match a local union-find over the same pairs") {
    val pairsDf = Dedup.ngramJaccardPairs(docs, 3, 0.5)
    val pairs = pairsDf.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // reference: classic union-find on the driver
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap
    val got = Dedup.connectedComponents(pairsDf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // representatives are members of their own component
    assert(got.values.toSet.subsetOf(got.keySet))
    // and the DISTRIBUTED min-label regime (edge list over the driver cap)
    // produces the identical labeling — force it by zeroing the cap
    val dist = Dedup.connectedComponents(pairsDf, driverEdgeCap = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == expected)
  }

  test("star-contraction components: deep chain converges in O(log d) rounds") {
    import spark.implicits._
    // a chain of depth 120 — min-label propagation would need 120 rounds;
    // zero the driver cap so the DISTRIBUTED star rounds (the subject of
    // this test) run instead of the r17 small-graph fold
    val chain = (0L until 120L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponentsStars(chain, maxIter = 12, driverEdgeCap = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 121)
    assert(got.values.forall(_ == 0L), "every chain node labels to the minimum (0)")
    // and two disjoint chains stay disjoint
    val two = chain.union(Seq((1000L, 1001L), (1001L, 1002L)).toDF("doc_a", "doc_b"))
    val got2 = Dedup.connectedComponentsStars(two, maxIter = 12, driverEdgeCap = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 120L).forall(got2(_) == 0L))
    assert(Seq(1000L, 1001L, 1002L).forall(got2(_) == 1000L))
  }

  test("star-contraction components agree with min-label on the corpus pairs") {
    val pairsDf = Dedup.ngramJaccardPairs(docs, 3, 0.5)
    val a = Dedup.connectedComponents(pairsDf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.connectedComponentsStars(pairsDf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // regime identity (r17): the forced-DISTRIBUTED star rounds produce the
    // same labeling as the driver fold the gate-scale path takes
    val c = Dedup.connectedComponentsStars(pairsDf, driverEdgeCap = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c == b)
  }

  test("dedup survivors: every removed doc has a surviving representative") {
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val survivors = Dedup.dedupSurvivors(docs).collect().map(_.getLong(0)).toSet
    assert(survivors.nonEmpty && survivors.subsetOf(all))
    assert(survivors.size < all.size, "corpus contains dups, some must be removed")
    // component representatives and exact keepers always survive
    val comps = Dedup.connectedComponents(Dedup.ngramJaccardPairs(docs, 3, 0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    comps.foreach { case (doc, rep) =>
      assert(survivors.contains(rep), s"representative $rep of $doc must survive")
      if (doc != rep) assert(!survivors.contains(doc) || doc == rep ||
        // a doc can only survive if it IS its component representative
        false, s"non-representative $doc must be removed")
    }
  }

  test("embedding LSH near-dup pairs are a high-recall subset of all-pairs") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val exact = Dedup.embeddingNearDupPairs(emb, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupLsh(emb, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "every LSH pair must verify against exact cosine")
    assert(exact.nonEmpty)
    val recall = (lsh & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH blocking recall was $recall")
  }

  test("exact dup groups partition the corpus") {
    val n = docs.count()
    val groups = Dedup.exactDupGroups(docs)
    assert(groups.agg(sum("n_copies")).head().getLong(0) == n)
    // survivors are minimal doc_ids: re-running on survivors is a fixpoint
    val survivors = docs.join(
      groups.select(col("keep_doc_id").as("doc_id")), "doc_id")
    assert(Dedup.exactDupGroups(survivors).filter(col("n_copies") > 1).count() == 0)
  }

  test("simhash blocking finds exactly the all-pairs hamming<=3 set") {
    val fp = Dedup.simhashFingerprints(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (ida, a1, a2) <- fp; (idb, b1, b2) <- fp if ida < idb
      d = java.lang.Long.bitCount(a1 ^ b1) + java.lang.Long.bitCount(a2 ^ b2)
      if d <= 3
    } yield (ida, idb)).toSet
    val blocked = Dedup.simhashPairs(docs, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute)
  }

  test("hot-shingle df cap: shared-boilerplate corpus completes without a pair explosion") {
    import spark.implicits._
    // 1000 docs that ALL share one boilerplate shingle ("terms of service apply"
    // windows) plus a unique tail; 10 true near-dup pairs differ only in the tail.
    // Without the df cap the boilerplate shingle alone emits ~500k candidate
    // pairs; with it, candidates come only from the rare tail shingles.
    val docsDf = (0 until 1000).map { i =>
      val pair = i / 2
      val tail = if (i < 20) s"alpha$pair beta$pair gamma$pair delta$pair epsilon$pair"
                 else s"unique$i only$i words$i here$i now$i"
      (i.toLong, s"terms of service apply to all $tail")
    }.toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val pairs = Dedup.ngramJaccardPairs(docsDf, 3, 0.5, dfCap = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val secs = (System.nanoTime() - t0) / 1e9
    // the 10 constructed near-dup pairs (2i, 2i+1) — and nothing else — survive
    assert(pairs == (0 until 10).map(p => (2L * p, 2L * p + 1)).toSet)
    assert(secs < 60, s"capped candidate generation took ${secs}s — pair explosion?")
  }

  test("hot-band df cap: same-signature cohort stays candidate-bounded, normal pairs survive") {
    import spark.implicits._
    // 10k byte-identical docs (a corpus that SKIPPED exact dedup) — without
    // the band cap the bucket self-join is 42 bands x 10k² = 4.2e9 rows; with
    // it every bucket of the cohort trips the cap and candidate generation is
    // bounded. Two constructed near-dup docs (rare buckets) must still pair.
    val cohort = (0 until 10000).map(i =>
      (i.toLong, "the exact same document text repeated for every row here"))
    val nearDup = Seq(
      (20000L, "completely different unique text alpha beta gamma delta epsilon zeta"),
      (20001L, "completely different unique text alpha beta gamma delta epsilon eta"))
    val docsDf = (cohort ++ nearDup).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val pairs = Dedup.minhashLshPairs(docsDf, 3, 42, 3, 0.5, dfCap = 1000)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val secs = (System.nanoTime() - t0) / 1e9
    // cohort pairs are missed LOUDLY (every shared bucket is capped — exact-dup
    // territory, excised by exactDups in a correctly ordered pipeline); the
    // rare-bucket near-dup pair survives the guard
    assert(pairs == Set((20000L, 20001L)))
    assert(secs < 120, s"capped band join took ${secs}s — candidate explosion?")
  }

  test("hot-band guard reports trimmed buckets through the same-pass accumulator") {
    import spark.implicits._
    // the guard's warn rides a task accumulator inside the pair-generation
    // pass (no extra job) — pin that a hot corpus actually REPORTS: the
    // probe registered for this call must end the action with acc > 0
    val before = Dedup.trimProbeFor(spark.sparkContext, "minhashLshPairs", 3, "band bucket")
      .map(_.acc.value.longValue).getOrElse(0L)
    val cohort = (0 until 8).map(i =>
      (i.toLong, "the exact same document text repeated for every row here"))
    val pairs = Dedup.minhashLshPairs(cohort.toDF("doc_id", "text"),
      3, 42, 3, 0.5, dfCap = 3).collect()
    assert(pairs.isEmpty, "every bucket of the cohort is over the cap")
    val probe = Dedup.trimProbeFor(spark.sparkContext, "minhashLshPairs", 3, "band bucket")
    assert(probe.isDefined, "the call registered no trim probe")
    // accumulator updates land with task completion; the action has returned,
    // so the value is final (cumulative per signature — assert GROWTH)
    assert(probe.get.acc.value.longValue > before, "hot-bucket accumulator never reported")
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val pairs = Dedup.embeddingNearDupPairs(emb, 0.4).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }

  test("incremental dedup: exact / near / new / short-doc verdicts via a persisted index") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different text about spark shuffles and partitions at scale"),
      (5L, "a third corpus document mentioning streams, state, and watermarks here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),
      (20L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (30L, "totally unrelated fresh content sharing nothing with anything stored before"),
      (40L, "hi")
    ).toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft_dedup_idx_spec_").toString
    try {
      val lake = new graft.lake.ParquetDirFormat(root)
      Dedup.buildDedupIndex(corpus, lake)
      val v = Dedup.incrementalDedup(lake, corpus, batch).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // 10 = byte-identical to corpus doc 1 (exact wins over its J=1 near hit);
      // 20 = one trailing token changed (J = 8/14 >= 0.5); 30 = no shared
      // shingles; 40 = too short to shingle, only exact matching can apply
      assert(v == Map(10L -> "exact_dup", 20L -> "near_dup", 30L -> "new", 40L -> "new"))
      // fold the admitted batch in (pure parquet append) and re-serve the same
      // batch against the grown corpus: every doc now collides with itself
      Dedup.appendDedupIndex(batch, lake)
      val again = Dedup.incrementalDedup(lake, corpus.union(batch), batch).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(again == Map(10L -> "exact_dup", 20L -> "exact_dup",
        30L -> "exact_dup", 40L -> "exact_dup"))
      // and a near-dup of a doc that entered via append is caught by its bands
      val probe = Seq((60L,
        "totally unrelated fresh content sharing nothing with anything stored today"))
        .toDF("doc_id", "text")
      val v60 = Dedup.incrementalDedup(lake, corpus.union(batch), probe).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(v60 == Map(60L -> "near_dup"))
    } finally {
      import java.nio.file.{Files, Path}
      Files.walk(Path.of(root)).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    }
  }

  test("semantic dedup decision table: total, min-representative, self-kept") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val keep = Dedup.semanticDedupKeep(emb, 0.4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keep.size == emb.count(), "every vector gets a decision")
    assert(keep.forall { case (v, k) => k <= v }, "keeper is the component min")
    assert(keep.values.toSet.forall(k => keep(k) == k), "keepers keep themselves")
    assert(keep.exists { case (v, k) => k != v },
      "corpus has within-cell near-dups at tau=0.4 (embeddingNearDupPairs finds pairs)")
    // cell-blocking only ever DROPS pairs vs the all-pairs graph: every
    // merged member must also merge under the unblocked tau graph
    val allPairs = Dedup.embeddingNearDupPairs(emb, 0.4)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    keep.collect { case (v, k) if k != v => v }
      .foreach(v => assert(allPairs.contains(v),
        s"vec $v merged without any all-pairs edge at tau"))
  }

  test("exactSubstrExcise: shared passage excised from both docs, unique text kept") {
    import spark.implicits._
    val passage = "one two three four five six seven eight"  // exactly l=8 tokens
    val docs = Seq(
      (1L, s"alpha bravo $passage charlie delta"),
      (2L, s"echo foxtrot golf $passage hotel"),
      (3L, "india juliet kilo lima mike november oscar papa quebec")
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.exactSubstrExcise(docs, l = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // the shared window occurs twice -> excised everywhere; overlapping
    // windows containing parts of the passage are unique, so the excised
    // span is exactly the 8 shared tokens
    assert(got(1L) == ((12L, 8L, "alpha bravo charlie delta")))
    assert(got(2L) == ((12L, 8L, "echo foxtrot golf hotel")))
    // doc 3 has 9 tokens -> two windows, both unique -> untouched
    assert(got(3L) == ((9L, 0L,
      "india juliet kilo lima mike november oscar papa quebec")))
  }

  test("graft_span_filter: HOF parity, null elements survive typed, unsorted spans fall back") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    // parity with the order-insensitive filter/exists twin on sorted spans
    val df = Seq(Tuple1(Seq("a", "b", "c", "d", "e"))).toDF("toks")
      .withColumn("sp", expr(
        "array(named_struct('s', 1, 'e', 2), named_struct('s', 3, 'e', 5))"))
    val native = df.select(expr("graft_span_filter(toks, sp)")).head.getSeq[String](0)
    val hof = df.select(expr(
      "filter(toks, (t, i) -> NOT exists(sp, x -> i >= x.s AND i < x.e))"))
      .head.getSeq[String](0)
    assert(native == Seq("a", "c") && native == hof)
    // UNSORTED spans must produce the same set as the HOF twin (the merge
    // pointer verifies order and falls back), never a silent mis-filter
    val un = df.withColumn("sp", expr(
      "array(named_struct('s', 3, 'e', 5), named_struct('s', 1, 'e', 2))"))
    assert(un.select(expr("graft_span_filter(toks, sp)")).head.getSeq[String](0)
      == Seq("a", "c"))
    // null elements in a nullable input array survive under a NULLABLE
    // output type (declaring containsNull=false there would let codegen
    // elide null checks downstream)
    val withNull = spark.sql(
      "SELECT graft_span_filter(array('a', CAST(NULL AS STRING), 'c'), " +
        "array(named_struct('s', 2, 'e', 3))) AS kept")
    assert(withNull.schema("kept").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    assert(withNull.head.getSeq[String](0) == Seq("a", null))
  }

  test("exactSubstrExcise: overlapping repeated windows merge into one maximal span") {
    import spark.implicits._
    // docs share a 10-token passage -> three overlapping repeated windows
    // per doc (starts 0, 1, 2) must merge into one span of 10 tokens
    val passage = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val docs = Seq(
      (1L, s"$passage tail1 tail2"),
      (2L, s"$passage other3 other4")
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.exactSubstrExcise(docs, l = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((12L, 10L, "tail1 tail2")))
    assert(got(2L) == ((12L, 10L, "other3 other4")))
  }

  test("CDC chunks: shared passage surfaces at DIFFERENT offsets; unique text does not") {
    val spark = TestSpark.spark
    import spark.implicits._
    // find a boundary token empirically so the passage is self-delimiting:
    // the passage must START with a boundary (hash % 8 == 0) token for its
    // chunking to be fully offset-independent
    def phash(s: String): Long =
      s.foldLeft(7L)((acc, c) => (acc * 131L + c.toInt) % 1000000007L)
    val boundaries = (1 to 2000).map(i => s"tok$i").filter(phash(_) % 8 == 0).take(2)
    val (b1, b2) = (boundaries(0), boundaries(1))
    val interior = (1 to 1000).map(i => s"pl$i").filter(phash(_) % 8 != 0).take(6)
    // the shared chunk is [b1 .. last interior]; the FOLLOWING boundary b2
    // closes it identically in both docs (a chunk is only shareable once
    // closed — its tail would otherwise absorb doc-local suffixes)
    val passage = (b1 +: interior).mkString(" ")
    val pre = (1 to 4).map(i => s"a$i").filter(phash(_) % 8 != 0)
    val docs = Seq(
      (1L, s"${pre.head} $passage $b2 x1end"),
      (2L, s"${pre.mkString(" ")} $passage $b2"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.cdcSharedChunks(docs, avgChunk = 8, minDocs = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.get(passage).map(_._1).contains(2L),
      s"passage chunk must be shared by exactly 2 docs at different offsets: $out")
    // doc-local chunks (pre-junk, b2-suffix) and doc 3 must NOT surface
    assert(!out.keys.exists(_.contains("z1")), s"unique text surfaced: ${out.keys}")
    assert(!out.keys.exists(_.contains("x1end")), s"doc-local suffix surfaced: ${out.keys}")
  }

  test("dedupSurvivorsBy: exact+near families merge, keeper is max-quality") {
    import spark.implicits._
    // docs 0,1: exact copies (long shared text). doc 2: near-dup of them
    // (one word changed). doc 3: unrelated. Quality column ranks doc 2
    // highest, so the merged family keeps 2 — the min-id rule would keep 0.
    val base = (1 to 30).map(i => s"token$i").mkString(" ")
    val docs = Seq(
      (0L, base, 10L),
      (1L, base, 11L),
      (2L, base.replace("token30", "changed"), 99L),
      (3L, (1 to 30).map(i => s"other$i").mkString(" "), 50L)
    ).toDF("doc_id", "text", "quality")
    val fams = Dedup.dedupSurvivorsBy(docs, "quality", n = 3, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(fams.toSeq == Seq((0L, 2L, 3L), (3L, 3L, 1L)),
      s"got ${fams.toSeq}: family 0 = {0,1,2} keeps quality-99 doc 2; 3 alone")
  }

  test("contaminationServe from the persisted eval index == full-scan minhashContamination") {
    import graft.functions.Portable
    graft.plans.GraftFunctions.register(spark)
    val lake = new graft.lake.ParquetDirFormat(
      java.nio.file.Files.createTempDirectory("graft_contam_serve_").toString)
    val evalD  = docs.filter(expr(Portable.splitBucketSpark("doc_id")) >= 90)
    val trainD = docs.filter(expr(Portable.splitBucketSpark("doc_id")) < 90)
    Dedup.buildContamIndex(evalD, lake)
    assert(lake.exists("contam_bands"), "index table must be persisted")
    val served = Dedup.contaminationServe(lake, evalD, trainD, 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val scanned = Dedup.minhashContamination(docs, 3, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(served == scanned, s"serve drifted from scan: ${served.diff(scanned)} / ${scanned.diff(served)}")
    assert(served.nonEmpty, "corpus should contain cross-split leakage pairs")
  }

  test("editDistancePairs separates the set view from the sequence view") {
    import spark.implicits._
    // blocks of trigram-preserving text; the shuffled copy keeps (most)
    // trigrams — high Jaccard — but a block permutation costs edit distance
    // proportional to the document, so edit_sim collapses
    val blocks = Seq(
      "alpha beta gamma delta epsilon zeta", "eta theta iota kappa lambda mu",
      "nu xi omicron pi rho sigma", "tau upsilon phi chi psi omega")
    val base     = blocks.mkString(" ")
    val shuffled = blocks.reverse.mkString(" ")
    val edited   = base.replace("delta", "delra") // one char: both views high
    val corpus = Seq((0L, base), (1L, shuffled), (2L, edited))
      .toDF("doc_id", "text")
    val jacc = Dedup.ngramJaccardPairs(corpus, 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((0L, 1L), (0L, 2L)).subsetOf(jacc),
      s"set view should accept the shuffled AND the edited copy, got $jacc")
    val ed = Dedup.editDistancePairs(corpus, 3, 0.5, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ed == Set((0L, 2L)),
      s"sequence view should keep only the character-edited copy, got $ed")
    // and the kept pair's numbers are the exact DP: one substitution
    val row = Dedup.editDistancePairs(corpus, 3, 0.5, 0.6)
      .filter(col("doc_a") === 0L && col("doc_b") === 2L).head()
    assert(row.getAs[Long]("edit_dist") == 1L)
  }
}
