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
    // RRF: coalesce each leg's reciprocal term to 0 for list-absent docs;
    // both divisions and the addition are written in the same order the
    // oracle states them, so the doubles are bitwise
    val fused = lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("lex_rnk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("sem_rnk")), lit(0.0)))
    Scale.topKPerKey(fused, Seq.empty,
        Seq(("rrf", true), ("doc_id", false)), kOut, Seq("lex_rnk", "sem_rnk"))
      .select("doc_id", "lex_rnk", "sem_rnk", "rrf", "rnk")
  }
}
