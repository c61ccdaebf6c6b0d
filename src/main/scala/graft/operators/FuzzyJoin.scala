package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * bigram — a string shorter than 2 characters, or a pair whose edits
  * destroy every shared bigram (possible only when min length <=
  * 2*maxDist+1), can be missed. Real identifier/name corpora sit far inside
  * the contract; the df-cap discussion on [[Dedup.ngramJaccardPairs]] is the
  * same honesty pattern.
  */
object FuzzyJoin {

  /** Distinct character bigrams of `s` as an array column (empty for
    * length < 2 — sequence(1, 0) would run DESCENDING in Spark, so the
    * short-string case is explicit). */
  private def bigrams(s: String): org.apache.spark.sql.Column =
    when(length(col(s)) >= 2,
      array_distinct(expr(s"transform(sequence(1, length($s) - 1), i -> substring($s, i, 2))")))
      .otherwise(array().cast("array<string>"))

  /** All (idA, idB, strA, strB, dist) pairs with levenshtein(strA, strB) <=
    * maxDist that share a character bigram. Column names in the output are
    * exactly (id_a, id_b, s_a, s_b, dist). */
  def fuzzyJoin(a: DataFrame, b: DataFrame,
                aId: String, aStr: String, bId: String, bStr: String,
                maxDist: Int = 2): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    // CPU-dense operator entry: a small parquet input scans as ONE partition,
    // which would run the entire candidate fan-out + levenshtein stage on a
    // single thread; fan the scan out first (no-op on cluster-sized inputs)
    val av = Scale.fanOutScan(a).select(col(aId).as("id_a"), col(aStr).as("s_a"),
      explode(bigrams(aStr)).as("bg"))
    val bv = Scale.fanOutScan(b).select(col(bId).as("id_b"), col(bStr).as("s_b"),
      explode(bigrams(bStr)).as("bg"))
    // Verify BEFORE dedup: levenshtein runs once per shared bigram (average
    // duplication ~1.2x on varied strings) and the distinct then shuffles
    // only the surviving matches instead of every candidate pair — on the
    // sf0.1 gate ~6k rows deduped instead of ~5M. The dominant cost stays
    // the candidate-verify stage itself (bigram fan-out x levenshtein),
    // which is the irreducible work of the contract. If a corpus has
    // heavy-tailed bigram sharing (natural-language stopword bigrams), the
    // duplication factor grows and a dedup-first variant (or a bigram
    // df-cap, losing the blocking guarantee) becomes the better trade.
    av.join(bv, "bg")
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "s_a", "s_b", "dist")
      .distinct() // one row per matched pair, not per shared bigram
  }
}
