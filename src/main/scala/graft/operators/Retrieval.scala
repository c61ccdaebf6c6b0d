package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid lexical + semantic retrieval — the fusion step every modern
  * data-curation / RAG stack runs on top of its two ranker families
  * (keyword search and vector search), combined with reciprocal-rank fusion
  * (Cormack, Clarke & Buettcher, "Reciprocal Rank Fusion outperforms Condorcet
  * and individual Rank Learning Methods", SIGIR'09 — the public method:
  * score(d) = Σ_lists 1/(K + rank_list(d)), K = 60).
  *
  * RRF is rank arithmetic, not score arithmetic — it needs no calibration
  * between the BM25/TF-IDF score scale and the cosine scale, which is exactly
  * why it is the production default for hybrid search. Because both input
  * ranks are integers and the fusion is two IEEE double divisions added in a
  * fixed order, the whole operator is bitwise-portable and oracle-checkable.
  */
object Retrieval {

  /** Hybrid top-`kOut` fusion of a TF-IDF keyword ranking (over `terms`) and
    * an exact cosine ranking (for query vector `vec_id = 0`), via RRF with
    * the standard K = 60. Output: one row per fused doc with its (nullable)
    * per-list ranks, the fused score, and the fused rank.
    *
    * Scale shape: each leg is its own proven scale path —
    * [[TextOps.tfidfSearch]] (one token scan, map-side-combined wide counts,
    * TakeOrdered top-k) and [[Similarity.bruteForceTopK]] (broadcast query,
    * one corpus scan, k-bounded fold). The fusion itself then runs on two
    * k-row lists: a k-sized full-outer join and a k-bounded global
    * [[Scale.topKPerKey]] fold — nothing corpus-sized happens after the
    * legs, and swapping a leg for its indexed sibling (BM25, IVF/PQ serve)
    * changes nothing downstream. */
  def hybridRrf(docs: DataFrame, emb: DataFrame, terms: Seq[String],
                kEach: Int = 50, rrfK: Int = 60, kOut: Int = 20): DataFrame = {
    // lexical leg: tfidfSearch is already a deterministic total order
    // (score desc, doc_id) LIMIT kEach; the global k-bounded fold assigns
    // the 1-based ranks RRF consumes (k rows in, k rows out — no Window)
    val lex = Scale.topKPerKey(
        TextOps.tfidfSearch(docs, terms, kEach).select("doc_id", "score"),
        Seq.empty, Seq(("score", true), ("doc_id", false)), kEach, Seq.empty)
      .select(col("doc_id"), col("rnk").as("lex_rnk"))
    // semantic leg: exact cosine top-k for the single query vector 0
    val sem = Similarity.bruteForceTopK(emb, nQueries = 1, k = kEach)
      .select(col("neighbor_id").as("doc_id"), col("rnk").as("sem_rnk"))
    rrfFuse(lex, sem, rrfK, kOut)
  }

  /** [[hybridRrf]] SERVED from the production-side legs: BM25 (the
    * full-scoring lexical ranker) fused with cosine ranks read back from
    * the PERSISTED IVF index — the deployment topology, where the vector
    * leg is an index lookup (probed-cell volume), not a corpus scan. The
    * fusion is [[rrfFuse]], shared verbatim with the scan-side variant:
    * RRF is leg-agnostic by construction, and this gate proves it where it
    * matters (swapping both legs changes nothing downstream of the k-row
    * lists). */
  def hybridRrfIndexed(spark: org.apache.spark.sql.SparkSession,
                       lake: graft.lake.ParquetDirFormat,
                       docs: DataFrame, emb: DataFrame, terms: Seq[String],
                       kEach: Int = 50, rrfK: Int = 60, kOut: Int = 20): DataFrame = {
    val lex = Scale.topKPerKey(
        TextOps.bm25Search(docs, terms, topK = kEach).select("doc_id", "score"),
        Seq.empty, Seq(("score", true), ("doc_id", false)), kEach, Seq.empty)
      .select(col("doc_id"), col("rnk").as("lex_rnk"))
    val sem = Similarity.queryIvfIndex(spark, lake, emb, "ivf",
        nQueries = 1, k = kEach)
      .select(col("neighbor_id").as("doc_id"), col("rnk").as("sem_rnk"))
    rrfFuse(lex, sem, rrfK, kOut)
  }

  /** The leg-agnostic RRF fusion: two k-row rank lists in (doc_id +
    * lex_rnk / sem_rnk), fused top-kOut out — a k-sized full-outer join and
    * a k-bounded global [[Scale.topKPerKey]] fold. Coalesce each leg's
    * reciprocal term to 0 for list-absent docs; both divisions and the
    * addition are written in the same order the oracles state them, so the
    * fused doubles are bitwise. */
  private def rrfFuse(lex: DataFrame, sem: DataFrame, rrfK: Int,
                      kOut: Int): DataFrame = {
    val fused = lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("lex_rnk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("sem_rnk")), lit(0.0)))
    Scale.topKPerKey(fused, Seq.empty,
        Seq(("rrf", true), ("doc_id", false)), kOut, Seq("lex_rnk", "sem_rnk"))
      .select("doc_id", "lex_rnk", "sem_rnk", "rrf", "rnk")
  }

  /** Maximal-marginal-relevance diversification of a vector search result
    * (Carbonell & Goldstein, "The Use of MMR, Diversity-Based Reranking...",
    * SIGIR'98 — the public method): greedily pick
    * argmax_c λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s), so each pick is
    * relevant to the query AND far from what is already selected — the
    * standard dedup-aware retrieval / diverse-few-shot-selection step.
    *
    * Scale shape: this is the SHORTLIST stage of a retrieval stack, by
    * construction — candidates come from the proven corpus-scale search
    * path ([[Similarity.bruteForceTopK]] here; any indexed sibling slots
    * in), and the greedy fold runs on the k-bounded candidate list
    * (`kCand` rows of id+vector — a report-sized driver fold, the same
    * bounded-probe class as the ANN probe-cell collects; MMR is inherently
    * sequential, so distributing it would serialize anyway). Ties break by
    * lowest doc id; cosine and the λ-blend are fixed-order double
    * arithmetic, so the ranking is deterministic run-to-run. */
  def mmrDiversify(emb: DataFrame, kCand: Int = 50, kOut: Int = 10,
                   lambda: Double = 0.7): DataFrame = {
    require(kOut <= kCand, "kOut must not exceed the candidate pool")
    val spark = emb.sparkSession
    import spark.implicits._
    val cand = Similarity.bruteForceTopK(emb, nQueries = 1, k = kCand)
      .select(col("neighbor_id").as("doc_id"), col("cosine").as("rel"))
    // candidate vectors, unit-normalized once: kCand rows to the driver
    // (columns selected by NAME before the collect — a caller's column
    // order must not change what the fold reads)
    val vecs = Similarity.l2Normalize(emb)
      .select(col("vec_id"), col("embedding"))
      .join(cand.select(col("doc_id").as("vec_id")), "vec_id")
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray)
      .toMap
    val rels = cand.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rel"))
    greedy(rels.map { case (id, rel) => (id, rel, vecs(id)) }, kOut, lambda)
      .toDF("doc_id", "rel", "mmr_score", "rank")
  }

  /** Batch MMR — [[mmrDiversify]] for MANY queries at once, the production
    * fan-in (rerank every search in a query log / build diverse few-shot
    * pools per prompt). Same greedy, same arithmetic, same tie-breaks, but
    * the per-query fold runs INSIDE `flatMapGroups` over per-query ANN
    * shortlists, so thousands of queries rerank in parallel and nothing
    * query-log-sized ever serializes on the driver.
    *
    * Scale shape: candidates come from the proven multi-query search path
    * ([[Similarity.bruteForceTopK]]; any indexed sibling slots in); the
    * candidate list (nQueries × kCand rows) broadcasts into an id-keyed
    * hash join that streams the corpus ONCE to attach unit vectors — no
    * corpus exchange, no Window — and only shortlist rows reach the
    * query-keyed exchange feeding the grouped fold (kCand rows per group,
    * bounded state). For query logs too large to broadcast, the same plan
    * holds with a shuffled id join — the grouped fold is unchanged.
    * Determinism: the fold sorts each group by doc_id before folding, so
    * the result is independent of arrival order and bitwise-equal to the
    * single-query driver fold per query (RetrievalSpec pins the parity). */
  def mmrDiversifyBatch(emb: DataFrame, nQueries: Int = 20, kCand: Int = 50,
                        kOut: Int = 10, lambda: Double = 0.7): DataFrame = {
    require(kOut <= kCand, "kOut must not exceed the candidate pool")
    val spark = emb.sparkSession
    import spark.implicits._
    val cand = Similarity.bruteForceTopK(emb, nQueries, kCand)
      .select(col("query_id"), col("neighbor_id").as("vec_id"),
        col("cosine").as("rel"))
    val lam = lambda
    val kO = kOut
    Similarity.l2Normalize(emb).select(col("vec_id"), col("embedding"))
      .join(broadcast(cand), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"), col("rel"), col("embedding"))
      .as[(Long, Long, Double, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        greedy(it.map(t => (t._2, t._3, t._4)).toArray, kO, lam)
          .map { case (id, rel, mmr, rk) => (qid, id, rel, mmr, rk) }
      }
      .toDF("query_id", "doc_id", "rel", "mmr_score", "rank")
  }

  /** The shared per-query MMR greedy: candidates (doc_id, rel, unit vector)
    * in ANY order — the fold iterates remaining candidates in ascending
    * doc_id order and breaks score ties by lowest id, so the output is a
    * pure function of the candidate SET. Double arithmetic in fixed order;
    * identical between the driver and grouped paths by construction. */
  private def greedy(cands: Array[(Long, Double, Array[Float])], kOut: Int,
                     lambda: Double): Seq[(Long, Double, Double, Int)] = {
    val vecs = cands.map(c => c._1 -> c._3).toMap
    val rels = cands.map(c => c._1 -> c._2).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    val remaining = scala.collection.mutable.SortedSet.empty[Long] ++ rels.keys
    while (selected.length < kOut && remaining.nonEmpty) {
      val scoredStep = remaining.toSeq.map { c =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.map(s => dot(vecs(c), vecs(s._1))).max
        (c, rels(c), lambda * rels(c) - (1 - lambda) * maxSim)
      }
      val best = scoredStep.minBy { case (id, _, m) => (-m, id) }
      selected += best
      remaining -= best._1
    }
    selected.zipWithIndex.toSeq
      .map { case ((id, rel, mmr), i) => (id, rel, mmr, i + 1) }
  }

  /** HARD-NEGATIVE MINING for contrastive embedding training: for each
    * anchor (vec_id < `nQueries`), the top-`k` highest-cosine corpus vectors
    * whose DOCUMENTS are NOT duplicates of the anchor's document — the
    * negatives that teach a bi-encoder the most (high similarity, genuinely
    * different content), with the known failure mode filtered out: a near-
    * or exact-duplicate ranked as a "negative" is a FALSE negative that
    * actively corrupts the contrastive objective (the dedup-before-mining
    * step the public dense-retrieval recipes document — e.g. Gao & Chen,
    * SimCSE, arXiv:2104.08821; Wang et al., E5, arXiv:2212.03533 §3).
    *
    * Exclusion is PAIRWISE: an md5-identical twin or a verified n-gram
    * Jaccard >= `tauJ` near-dup of the anchor (the
    * [[Dedup.minhashAnchoredPairs]] contract — banded candidates restricted
    * to anchor-side × corpus-side BEFORE the bucket explode, exact verify,
    * equal to a corpus-wide pair table filtered to anchors). Embeddings and
    * documents share the id space (vec_id = doc_id, the same join the
    * filtered-ANN gate rides).
    *
    * Scale shape: the exclusion table is anchor-bounded END TO END — pair
    * GENERATION explodes only anchors × their bucket mates (candidate
    * volume ∝ anchor bucket memberships, independent of how many non-anchor
    * documents resemble each other; ScaleRehearsalSpec pins the slope), so
    * a 20-anchor query set never pays a corpus-dedup candidate bill; the
    * md5-twin self-join keys on the anchors' md5 set only, so a 100 TB dup
    * cohort costs anchor-rows, never cohort²; ranking is the k-bounded
    * [[Scale.topKPerKey]] fold over one corpus scan — never a Window.
    *
    * Production reuse: when the curation chain has ALREADY produced a
    * verified near-dup pair table (the dedup stage's output), pass it as
    * `pairs` — any orientation, columns (doc_a, doc_b) — and the mining run
    * pays zero signature work (the [[Dedup.dedupFamiliesFromPairs]]
    * injection precedent). */
  def hardNegatives(docs: DataFrame, emb: DataFrame, nQueries: Int = 20,
                    k: Int = 10, tauJ: Double = 0.5,
                    pairs: Option[DataFrame] = None): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val anchor = col("query_id") < nQueries
    // near-dup leg of the exclusion: anchor-oriented by construction when
    // generated here; injected pair tables are oriented both ways first
    val nearEx = pairs match {
      case Some(p) =>
        p.select(col("doc_a").as("query_id"), col("doc_b").as("neighbor_id"))
          .union(p.select(col("doc_b").as("query_id"), col("doc_a").as("neighbor_id")))
          .filter(anchor)
      case None =>
        Dedup.minhashAnchoredPairs(docs, col("doc_id") < nQueries, 3, 42, 3, tauJ)
          .select(col("doc_a").as("query_id"), col("doc_b").as("neighbor_id"))
    }
    // exact-twin leg: md5 keys of the ANCHOR docs only, joined back against
    // the corpus keys (anchor-bounded — never a full dup-cohort self-join)
    val keys = docs.select(col("doc_id"), md5(col("text")).as("kk"))
    val exactEx = keys.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("kk"))
      .join(keys.select(col("doc_id").as("neighbor_id"), col("kk")), "kk")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
    val excluded = nearEx.union(exactEx).distinct()
    def nrm = sqrt(expr("graft_dot(embedding, embedding)"))
    val q = Scale.fanOutScan(emb).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("emb_q"), nrm.as("norm_q"))
    val v = Scale.fanOutScan(emb)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("emb_v"), nrm.as("norm_v"))
    val scored = v.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .join(excluded, Seq("query_id", "neighbor_id"), "left_anti")
      .withColumn("cosine",
        expr("graft_dot(emb_q, emb_v)") / (col("norm_q") * col("norm_v")))
    Scale.topKPerKey(scored.select("query_id", "neighbor_id", "cosine"),
        Seq("query_id"), Seq(("cosine", true), ("neighbor_id", false)), k, Seq.empty)
      .select("query_id", "neighbor_id", "cosine", "rnk")
  }
}
