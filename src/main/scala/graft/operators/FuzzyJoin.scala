package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Approximate string matching between two tables — the entity-resolution
  * primitive behind "same customer, typo'd name" dedup/linking that the
  * reference's cleaning stage hands to an LLM per batch (see
  * services/data-cleaning-agent: free-text column repair); here it is a
  * deterministic, oracle-checkable join.
  *
  * Scale shape: NEVER |a|x|b|. Candidates come from a character-bigram
  * equi-join (each string explodes into its distinct bigrams; pairs must
  * share at least one) pre-filtered by a length band (|len(a) - len(b)| <=
  * maxDist — an edit changes length by at most one), then exact
  * `levenshtein` verifies candidates only. Both blocking predicates are
  * IMPLIED by the verified condition for all but degenerate strings, so the
  * output CONTRACT is: all pairs with edit distance <= maxDist that share a
  * non-hot bigram — a string shorter than 2 characters, or a pair whose
  * edits destroy every shared bigram (possible only when min length <=
  * 2*maxDist+1), can be missed. Real identifier/name corpora sit far inside
  * the contract. Heavy-tailed bigram sharing (stopword bigrams) is guarded
  * by the same df-cap + warn-on-trim pattern as
  * [[Dedup.ngramJaccardPairs]] — see [[fuzzyJoin]]'s contract note.
  */
object FuzzyJoin {

  /** Distinct character bigrams of `s` as an array column (empty for
    * length < 2 — sequence(1, 0) would run DESCENDING in Spark, so the
    * short-string case is explicit). */
  private def bigrams(s: String): org.apache.spark.sql.Column =
    when(length(col(s)) >= 2,
      array_distinct(expr(s"transform(sequence(1, length($s) - 1), i -> substring($s, i, 2))")))
      .otherwise(array().cast("array<string>"))

  /** Candidate rows — one per shared NON-HOT bigram, pre-levenshtein,
    * length-banded. Package-visible so the spec can assert the df-cap bounds
    * the candidate volume without touching the public contract. */
  private[graft] def candidates(a: DataFrame, b: DataFrame,
                                    aId: String, aStr: String, bId: String, bStr: String,
                                    maxDist: Int, dfCap: Int): DataFrame = {
    // CPU-dense operator entry: a small parquet input scans as ONE partition,
    // which would run the entire candidate fan-out + levenshtein stage on a
    // single thread; fan the scan out first (no-op on cluster-sized inputs)
    val av = Scale.fanOutScan(a).select(col(aId).as("id_a"), col(aStr).as("s_a"),
      explode(bigrams(aStr)).as("bg"))
    val bv = Scale.fanOutScan(b).select(col(bId).as("id_b"), col(bStr).as("s_b"),
      explode(bigrams(bStr)).as("bg"))
    // Skew guard (same pattern as Dedup.ngramJaccardPairs): a bigram carried
    // by dfA docs left and dfB right emits dfA*dfB candidate rows, so one
    // stopword bigram in a natural-language corpus is a quadratic blowup.
    // Bigrams whose COMBINED df exceeds dfCap are dropped from candidate
    // generation; the hot list is at most |bigram rows| / dfCap entries, so
    // it broadcasts, and the k²-generating equi-join runs on rare bigrams
    // only. When the cap trims, the exclusion is logged — a corpus leaning
    // on the contract's edge should not do so silently. dfCap <= 0 disables.
    if (dfCap <= 0) av.join(bv, "bg")
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
    else {
      val hot = av.select("bg").unionAll(bv.select("bg"))
        .groupBy("bg").agg(count(lit(1)).as("df"))
        .filter(col("df") > dfCap).select("bg")
        .persist(StorageLevel.MEMORY_AND_DISK)
      Dedup.warnOnTrim("fuzzyJoin", hot, dfCap)
      av.join(broadcast(hot), Seq("bg"), "left_anti")
        .join(bv.join(broadcast(hot), Seq("bg"), "left_anti"), "bg")
        .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
    }
  }

  /** All (idA, idB, strA, strB, dist) pairs with levenshtein(strA, strB) <=
    * maxDist that share a character bigram with combined document frequency
    * <= `dfCap`. Column names in the output are exactly
    * (id_a, id_b, s_a, s_b, dist).
    *
    * Precise contract: output equals the uncapped result on any corpus where
    * every qualifying pair shares at least one bigram with combined df <=
    * dfCap — a pair linked exclusively through hot stopword bigrams is
    * missed (and the trim is logged). An edit destroys at most 2 bigrams, so
    * a qualifying pair of length-L strings shares >= L-1-3*maxDist bigrams;
    * ONLY when all of them are hot is the pair lost. The oracle gate corpus
    * (8-char md5 hex ids) peaks at df ≈ 270 at sf0.1 vs the default cap
    * 1000 — far inside the no-trim regime, so the gate stays bitwise equal
    * to its uncapped DuckDB twin. `dfCap <= 0` restores the unguarded join. */
  def fuzzyJoin(a: DataFrame, b: DataFrame,
                aId: String, aStr: String, bId: String, bStr: String,
                maxDist: Int = 2, dfCap: Int = 1000): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    // Verify BEFORE dedup: levenshtein runs once per shared bigram (average
    // duplication ~1.2x on varied strings) and the distinct then shuffles
    // only the surviving matches instead of every candidate pair — on the
    // sf0.1 gate ~6k rows deduped instead of ~5M.
    graft.plans.GraftFunctions.register(a.sparkSession)
    candidates(a, b, aId, aStr, bId, bStr, maxDist, dfCap)
      // graft_opaque fence (r17): the maxDist filter otherwise duplicates
      // the Levenshtein DP into the candidate join's condition — twice per
      // shared-bigram row (guide §4.4); the plan's levenshtein count is
      // pinned by PlanSpec
      .withColumn("dist", expr("graft_opaque(levenshtein(s_a, s_b))"))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "s_a", "s_b", "dist")
      .distinct() // one row per matched pair, not per shared bigram
  }
}
