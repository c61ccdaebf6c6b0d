package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pure-JVM replacements for the reference's two LLM call-outs, keeping the
  * same result-shape contracts (SURVEY §7.3):
  *
  *  - header detection (reference tools/ingestion.py:67-113 asks a model
  *    whether row 1 is a header): compare the type profile of row 1 against
  *    the body — a header row is textual where the body is numeric/date-like.
  *    Falls back to "has header" on ambiguity, like the reference.
  *  - PII detection (reference tools/cleaning.py:694-776): column-name lexicon
  *    + value regexes (email/phone/ssn-shaped), sampled with a LIMIT cap the
  *    way the reference samples 5 distinct values per column.
  */
object Heuristics {

  /** Does the first row look like a header for the body below it?
    * `rows` are raw string cells (first N lines, pre-parsed). */
  def looksLikeHeader(first: Seq[String], body: Seq[Seq[String]]): Boolean = {
    if (first.isEmpty || body.isEmpty) return true
    def numericish(s: String): Boolean =
      s != null && s.nonEmpty && s.matches("-?[0-9][0-9.,/%$-]*")
    val headerNumeric = first.count(numericish).toDouble / first.size
    val bodyNumeric = {
      val cells = body.flatten.filter(c => c != null && c.nonEmpty)
      if (cells.isEmpty) 0.0 else cells.count(numericish).toDouble / cells.size
    }
    // a real header is mostly non-numeric while the body has numeric signal;
    // when both profiles agree, default to header=true (reference fallback)
    if (bodyNumeric >= 0.3 && headerNumeric <= 0.2) true
    else if (headerNumeric >= 0.5 && bodyNumeric >= 0.5) false
    else true
  }

  /** Matched as WHOLE snake_case tokens of the normalized column name —
    * substring matching flags 'population' for 'lat' or 'adobe' for 'dob'. */
  val PiiNameLexicon: Set[String] = Set(
    "email", "phone", "mobile", "ssn", "passport", "dob",
    "address", "street", "zip", "zipcode", "postal",
    "lat", "latitude", "lon", "lng", "longitude")
  /** Multi-token markers matched as consecutive token pairs. */
  val PiiNamePairs: Set[(String, String)] = Set(
    ("e", "mail"), ("social", "security"), ("credit", "card"),
    ("card", "number"), ("date", "of"), ("first", "name"), ("last", "name"),
    ("full", "name"), ("ip", "address"))

  val EmailRe = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"
  val PhoneRe = "^\\+?[0-9][0-9()\\s.-]{6,18}[0-9]$"
  val SsnRe = "^[0-9]{3}-[0-9]{2}-[0-9]{4}$"

  final case class PiiFinding(column: String, reason: String)

  /** Flag likely-PII columns: name lexicon match, or >50% of a small distinct
    * value sample matching a PII value shape. One LIMIT-capped pass/column on
    * only the string columns — never a full scan. */
  def detectPii(df: DataFrame, sampleSize: Int = 5): Seq[PiiFinding] = {
    val byName = df.columns.toSeq.flatMap { c =>
      val toks = c.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val tokenHit = toks.exists(PiiNameLexicon.contains)
      val pairHit = toks.sliding(2).exists {
        case Seq(a, b) => PiiNamePairs.contains((a, b))
        case _ => false
      }
      if (tokenHit || pairHit) Some(PiiFinding(c, "column_name")) else None
    }
    val named = byName.map(_.column).toSet
    val stringCols = df.schema.fields
      .filter(f => f.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name).filterNot(named.contains)
    val byValue = stringCols.flatMap { c =>
      val sample = df.select(col(c)).filter(col(c).isNotNull)
        .distinct().limit(sampleSize).collect().map(_.getString(0))
      if (sample.isEmpty) None
      else {
        val hits = sample.count(v =>
          v.matches(EmailRe) || v.matches(PhoneRe) || v.matches(SsnRe))
        if (hits.toDouble / sample.length > 0.5)
          Some(PiiFinding(c, "value_pattern"))
        else None
      }
    }
    byName ++ byValue
  }
}
