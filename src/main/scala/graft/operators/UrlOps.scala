package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain curation operators — the provenance-based filtering stage of a
  * web-scale training corpus (the C4 / RefinedWeb recipe: parse the source URL,
  * drop blocklisted domains, cap how many documents any one domain may
  * contribute so megasites don't dominate the mixture).
  *
  * All parsing is codegen'd `regexp_extract` over RE2-safe patterns (no
  * backtracking constructs), so the scan stays inside whole-stage codegen; the
  * blocklist is a broadcast `isin`; the per-domain cap is a skew-safe two-phase
  * top-N (see [[topNPerKey]]) rather than a single window, because at 100 TB
  * one hot domain would otherwise serialize into a single sort partition.
  */
object UrlOps {

  private val SchemeRe = "^([a-z][a-z0-9+.-]*)://"
  private val HostRe   = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
  private val PathRe   = "^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"

  /** Appends `scheme`, `host` (lowercased, port kept), `path` (query/fragment
    * excluded) and `registrable_domain` (last two dot-labels — a deliberate
    * simplification of the public-suffix list, which is a versioned external
    * artifact; swap the regex for a suffix-table join when operating on real
    * web crawl). The port is stripped BEFORE deriving `registrable_domain`:
    * otherwise 'cdn.site.org:8080' yields 'site.org:8080' and a blocklisted
    * domain slips through [[blocklistFilter]] on any URL carrying an explicit
    * port. Pure projection: zero shuffle, scan-fused. */
  def parseUrls(df: DataFrame, urlCol: String = "url"): DataFrame =
    df.withColumn("scheme", regexp_extract(col(urlCol), SchemeRe, 1))
      .withColumn("host", lower(regexp_extract(col(urlCol), HostRe, 1)))
      .withColumn("path", regexp_extract(col(urlCol), PathRe, 1))
      .withColumn("registrable_domain",
        regexp_extract(regexp_extract(col("host"), "^([^:]+)", 1),
          "([^.]+\\.[^.]+)$", 1))

  /** Drops rows whose `registrable_domain` is on the blocklist. The list is a
    * literal `isin` (a broadcast-sized in-filter that pushes into the scan);
    * for blocklists beyond a few thousand entries use a broadcast anti-join
    * instead. */
  def blocklistFilter(df: DataFrame, blocked: Seq[String]): DataFrame =
    df.filter(!col("registrable_domain").isin(blocked: _*))

  /** Skew-safe top-N per key: keep at most `n` rows per `key`, the first `n`
    * under `ordering` (which MUST be a total order — include a unique
    * tiebreaker — or the two phases can disagree with a plain window).
    *
    * Phase 1 ranks within (key, salt) and keeps `n` per salt bucket; since the
    * global top-n of a key is contained in the union of its per-bucket top-n
    * for ANY bucketing, phase 2's rank over the ≤ `salts`·`n` survivors equals
    * the rank a single window over the full key would produce — but no sort
    * partition ever holds more than a bucket of one key, so a domain with 10^9
    * rows costs the same as `salts` domains with 10^9/`salts` rows. */
  def topNPerKey(df: DataFrame, key: Column, n: Int, ordering: Seq[Column],
                 saltCol: Column, salts: Int = 16): DataFrame = {
    val phase1 = Window.partitionBy(key, pmod(saltCol, lit(salts)))
      .orderBy(ordering: _*)
    val phase2 = Window.partitionBy(key).orderBy(ordering: _*)
    df.withColumn("rank_in_salt", row_number().over(phase1))
      .filter(col("rank_in_salt") <= n)
      .withColumn("rank_in_key", row_number().over(phase2))
      .filter(col("rank_in_key") <= n)
      .drop("rank_in_salt")
  }

  /** The full curation pass: parse, blocklist, then cap each registrable
    * domain's contribution at `cap` documents, preferring longer documents
    * (`n_chars` DESC) with `doc_id` as the unique tiebreaker. Emits the kept
    * rows with their within-domain rank. */
  def domainCap(docsWithUrl: DataFrame, blocked: Seq[String], cap: Int = 10): DataFrame = {
    val parsed = blocklistFilter(parseUrls(docsWithUrl), blocked)
    topNPerKey(
      parsed, col("registrable_domain"), cap,
      Seq(col("n_chars").desc, col("doc_id").asc),
      saltCol = col("doc_id"))
      .select(col("doc_id"), col("url"), col("host"), col("path"),
        col("registrable_domain"), col("rank_in_key").as("domain_rank"))
  }
}
