package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables
import graft.functions.Portable
import graft.operators.Cleaning

/** Cleaning-protocol queries: deterministic dirty data is CONSTRUCTED from the
  * clean test tables (key-modulo dirt injection — whitespace padding, null
  * sentinels, mojibake, mixed genders, broken emails, multi-format dates,
  * currency-prefixed prices), then repaired by the [[Cleaning]] operators.
  * The DuckDB oracle performs the identical construction + repair, so the gate
  * proves transform semantics, not just plumbing.
  *
  * DuckDB has no initcap; the oracle inlines an exact emulation of Spark's
  * (split on single space, first char upper, rest lower, empties preserved).
  */
object Clean {
  type Q = (SparkSession, String) => DataFrame

  /** DuckDB text of Spark's initcap semantics. */
  private def icDuck(x: String): String =
    s"array_to_string(list_transform(string_split(lower($x), ' '), w -> upper(w[1:1]) || w[2:]), ' ')"

  // ---- customer pipeline ---------------------------------------------------

  def customerPipeline(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .withColumn("k", col("c_custkey"))
      // dirt injection (deterministic by key)
      .withColumn("dirty_name", concat(lit("  "), col("c_name"), lit("  ")))
      .withColumn("dirty_seg", expr(
        """CASE CAST(k % 11 AS INT)
          |  WHEN 0 THEN 'N/A' WHEN 1 THEN 'null' WHEN 2 THEN ' ' WHEN 3 THEN 'MISSING'
          |  ELSE c_mktsegment END""".stripMargin))
      .withColumn("dirty_city", expr(
        s"CASE WHEN k % 7 = 0 THEN concat('CafÃ© ', c_name) ELSE c_name END"))
      .withColumn("dirty_gender", expr(
        """CASE CAST(k % 6 AS INT)
          |  WHEN 0 THEN 'M' WHEN 1 THEN 'MALE' WHEN 2 THEN 'f' WHEN 3 THEN 'Female'
          |  WHEN 4 THEN 'nonbinary' ELSE 'F' END""".stripMargin))
      .withColumn("dirty_email", expr(
        """CASE CAST(k % 4 AS INT)
          |  WHEN 0 THEN concat('User', CAST(k AS STRING), '@Example.COM')
          |  WHEN 1 THEN concat('  user', CAST(k AS STRING), '@test.org  ')
          |  ELSE concat('not an email ', CAST(k AS STRING)) END""".stripMargin))
      .withColumn("dirty_state", expr(
        """CASE CAST(k % 5 AS INT)
          |  WHEN 0 THEN 'ca' WHEN 1 THEN 'TX' WHEN 2 THEN 'new york'
          |  WHEN 3 THEN ' wa ' ELSE 'north carolina' END""".stripMargin))
    // repair via the cleaning protocol
    c.select(
      col("c_custkey"),
      Cleaning.trimWs(col("dirty_name")).as("clean_name"),
      Cleaning.caseNormalize(Cleaning.protocol(col("dirty_seg"))).as("clean_seg"),
      Cleaning.mojibakeRepair(col("dirty_city")).as("clean_city"),
      Cleaning.genderExpand(col("dirty_gender")).as("clean_gender"),
      Cleaning.emailClean(col("dirty_email")).as("clean_email"),
      Cleaning.stateFormat(col("dirty_state")).as("clean_state"))
  }

  private val customerPipelineSql = {
    val ic = icDuck _
    s"""WITH d AS (
       |  SELECT c_custkey, c_custkey AS k, c_name, c_mktsegment,
       |    '  ' || c_name || '  ' AS dirty_name,
       |    CASE CAST(k % 11 AS INT) WHEN 0 THEN 'N/A' WHEN 1 THEN 'null' WHEN 2 THEN ' '
       |      WHEN 3 THEN 'MISSING' ELSE c_mktsegment END AS dirty_seg,
       |    CASE WHEN k % 7 = 0 THEN 'CafÃ© ' || c_name ELSE c_name END AS dirty_city,
       |    CASE CAST(k % 6 AS INT) WHEN 0 THEN 'M' WHEN 1 THEN 'MALE' WHEN 2 THEN 'f'
       |      WHEN 3 THEN 'Female' WHEN 4 THEN 'nonbinary' ELSE 'F' END AS dirty_gender,
       |    CASE CAST(k % 4 AS INT)
       |      WHEN 0 THEN 'User' || CAST(k AS VARCHAR) || '@Example.COM'
       |      WHEN 1 THEN '  user' || CAST(k AS VARCHAR) || '@test.org  '
       |      ELSE 'not an email ' || CAST(k AS VARCHAR) END AS dirty_email,
       |    CASE CAST(k % 5 AS INT) WHEN 0 THEN 'ca' WHEN 1 THEN 'TX' WHEN 2 THEN 'new york'
       |      WHEN 3 THEN ' wa ' ELSE 'north carolina' END AS dirty_state
       |  FROM customer)
       |SELECT c_custkey,
       |  trim(dirty_name) AS clean_name,
       |  lower(CASE WHEN lower(trim(dirty_seg)) IN (${Cleaning.NullSentinels.map(x => s"'$x'").mkString(", ")})
       |    OR trim(dirty_seg) = '' THEN NULL ELSE trim(dirty_seg) END) AS clean_seg,
       |  replace(dirty_city, 'CafÃ©', 'Café') AS clean_city,
       |  CASE WHEN upper(trim(dirty_gender)) IN (${Cleaning.NullSentinels.map(_.toUpperCase).map(x => s"'$x'").mkString(", ")}) THEN NULL
       |    WHEN upper(trim(dirty_gender)) IN ('M', 'MALE') THEN 'Male'
       |    WHEN upper(trim(dirty_gender)) IN ('F', 'FEMALE') THEN 'Female'
       |    ELSE ${ic("trim(dirty_gender)")} END AS clean_gender,
       |  CASE WHEN regexp_full_match(trim(dirty_email), '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')
       |    THEN lower(trim(dirty_email)) ELSE NULL END AS clean_email,
       |  CASE WHEN upper(trim(dirty_state)) IN (${Cleaning.NullSentinels.map(_.toUpperCase).map(x => s"'$x'").mkString(", ")}) THEN NULL
       |    WHEN length(trim(dirty_state)) = 2 THEN upper(trim(dirty_state))
       |    ELSE ${ic("trim(dirty_state)")} END AS clean_state
       |FROM d""".stripMargin
  }

  // ---- currency extraction -------------------------------------------------

  def currencyExtract(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .withColumn("dec_str",
        col("o_totalprice").cast("decimal(12,2)").cast("string"))
      .withColumn("price_str", expr(
        s"""CASE CAST(o_orderkey % 5 AS INT)
           |  WHEN 0 THEN concat('$$', dec_str)
           |  WHEN 1 THEN concat('EUR ', dec_str)
           |  WHEN 2 THEN concat('£', dec_str)
           |  WHEN 3 THEN concat('¥', dec_str)
           |  ELSE dec_str END""".stripMargin))
      .withColumn("value_type", Cleaning.currencyCode(col("price_str")))
      .withColumn("value", Cleaning.currencyValue("price_str"))
    o.groupBy("value_type")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
  }

  private val currencyExtractSql =
    s"""WITH d AS (
       |  SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS dec_str
       |  FROM orders),
       |p AS (SELECT o_orderkey,
       |  CASE CAST(o_orderkey % 5 AS INT)
       |    WHEN 0 THEN '$$' || dec_str WHEN 1 THEN 'EUR ' || dec_str
       |    WHEN 2 THEN '£' || dec_str WHEN 3 THEN '¥' || dec_str
       |    ELSE dec_str END AS price_str
       |  FROM d),
       |e AS (SELECT
       |  CASE regexp_extract(trim(price_str), '^(\\$$|EUR |£|¥)', 1)
       |    WHEN '$$' THEN 'USD' WHEN 'EUR ' THEN 'EUR' WHEN '£' THEN 'GBP'
       |    WHEN '¥' THEN 'JPY' ELSE NULL END AS value_type,
       |  TRY_CAST(regexp_replace(trim(price_str), '^(\\$$|EUR |£|¥)', '') AS DOUBLE) AS value
       |  FROM p)
       |SELECT value_type, COUNT(*) AS n,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
       |FROM e GROUP BY value_type""".stripMargin

  // ---- multi-format date standardization -----------------------------------

  def datesMultiformat(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .withColumn("d", to_date(col("o_orderdate")))
      .withColumn("dirty_date", expr(
        """CASE CAST(o_orderkey % 4 AS INT)
          |  WHEN 0 THEN date_format(d, 'yyyy-MM-dd')
          |  WHEN 1 THEN date_format(d, 'M/d/yyyy')
          |  WHEN 2 THEN date_format(d, 'dd.MM.yyyy')
          |  ELSE date_format(d, 'yyyyMMdd') END""".stripMargin))
    o.select(
      col("o_orderkey"),
      col("dirty_date"),
      Cleaning.parseDateMulti("dirty_date").as("parsed_date"),
      Cleaning.dateStandardize("dirty_date").as("std_date"))
  }

  private val datesMultiformatSql =
    s"""WITH d AS (
       |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders),
       |p AS (SELECT o_orderkey,
       |  CASE CAST(o_orderkey % 4 AS INT)
       |    WHEN 0 THEN strftime(d, '%Y-%m-%d')
       |    WHEN 1 THEN strftime(d, '%-m/%-d/%Y')
       |    WHEN 2 THEN strftime(d, '%d.%m.%Y')
       |    ELSE strftime(d, '%Y%m%d') END AS dirty_date
       |  FROM d),
       |q AS (SELECT o_orderkey, dirty_date,
       |  ${Portable.dateMultiDuck("dirty_date")} AS parsed_date
       |  FROM p)
       |SELECT o_orderkey, dirty_date, parsed_date,
       |  strftime(parsed_date, '%Y-%m-%d') AS std_date
       |FROM q""".stripMargin

  // ---- fuzzy join ----------------------------------------------------------

  /** Fuzzy-join gate corpus: the clean side derives an 8-hex-char identifier
    * per document (md5 of doc_id — varied strings, so bigram blocking is
    * exercised for real, unlike the constant-prefix TPC-H names); the dirty
    * side deletes one character at a doc_id-determined position. The join
    * must link every dirty id back to its source at distance 1 (plus any
    * coincidental <= 1 pairs — both engines report the same set). */
  def fuzzyJoinIds(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val id8 = "substring(md5(CAST(doc_id AS STRING)), 1, 8)"
    val clean = docs.select(col("doc_id").as("cid"), expr(id8).as("cs"))
    val dirty = docs.select(col("doc_id").as("did"),
      expr(s"concat(substring($id8, 1, CAST(doc_id % 8 AS INT)), " +
        s"substring($id8, CAST(doc_id % 8 AS INT) + 2))").as("ds"))
    graft.operators.FuzzyJoin.fuzzyJoin(clean, dirty, "cid", "cs", "did", "ds",
      maxDist = 1)
  }

  /** Mirror of [[graft.operators.FuzzyJoin.fuzzyJoin]] over the same
    * construction: identical bigram blocking (so the oracle is tractable at
    * sf0.1 too), identical length band, identical levenshtein verify. */
  private val fuzzyJoinSql =
    """WITH c AS (SELECT doc_id AS id_a,
      |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS s_a FROM documents),
      |d0 AS (SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS s,
      |    CAST(doc_id % 8 AS INT) AS p0 FROM documents),
      |d AS (SELECT doc_id AS id_b, substr(s, 1, p0) || substr(s, p0 + 2) AS s_b FROM d0),
      |ca AS (SELECT id_a, s_a, unnest(list_distinct(list_transform(
      |    generate_series(1, length(s_a) - 1), i -> substr(s_a, i, 2)))) AS bg FROM c),
      |cb AS (SELECT id_b, s_b, unnest(list_distinct(list_transform(
      |    generate_series(1, length(s_b) - 1), i -> substr(s_b, i, 2)))) AS bg FROM d),
      |cand AS (SELECT DISTINCT id_a, s_a, id_b, s_b FROM ca JOIN cb USING (bg)
      |  WHERE abs(length(s_a) - length(s_b)) <= 1)
      |SELECT id_a, id_b, s_a, s_b, CAST(levenshtein(s_a, s_b) AS INT) AS dist
      |FROM cand WHERE levenshtein(s_a, s_b) <= 1""".stripMargin

  // ---- PII redaction -------------------------------------------------------

  /** PII-bearing text is CONSTRUCTED deterministically from customer keys
    * (emails, +1 phone numbers, SSN-shaped ids, dotted-quad IPs appear on
    * key-modular subsets), then scrubbed by [[Cleaning.redactPii]] with
    * per-category counts from [[Cleaning.piiCounts]] — the
    * redact-before-training step, gate-proven against the identical DuckDB
    * construction + RE2 regexes. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .withColumn("contact_note", expr(PiiTextSpark))
    val counts = Cleaning.piiCounts(col("contact_note"))
      .map { case (cat, n) => n.as(s"n_$cat") }
    c.select(Seq(col("c_custkey"), col("contact_note"),
      Cleaning.redactPii(col("contact_note")).as("redacted")) ++ counts: _*)
  }

  /** The dirty-text construction, Spark dialect (k = c_custkey). */
  private val PiiTextSpark =
    """concat(c_name, ' (', c_mktsegment, ') contact: ',
      |  CASE WHEN c_custkey % 3 = 0 THEN concat('user', CAST(c_custkey AS STRING),
      |    CASE CAST(c_custkey % 2 AS INT) WHEN 0 THEN '@example.com' ELSE '@mail.test.org' END)
      |    ELSE 'none' END,
      |  CASE WHEN c_custkey % 4 = 0 THEN concat(' tel +1-',
      |    CAST(100 + c_custkey % 900 AS STRING), '-',
      |    lpad(CAST(c_custkey % 1000 AS STRING), 3, '0'), '-',
      |    lpad(CAST(c_custkey % 10000 AS STRING), 4, '0')) ELSE '' END,
      |  CASE WHEN c_custkey % 5 = 0 THEN concat(' ssn ',
      |    CAST(100 + c_custkey % 900 AS STRING), '-',
      |    lpad(CAST(c_custkey % 100 AS STRING), 2, '0'), '-',
      |    lpad(CAST(c_custkey % 10000 AS STRING), 4, '0')) ELSE '' END,
      |  CASE WHEN c_custkey % 2 = 0 THEN concat(' last-ip 10.',
      |    CAST(c_custkey % 256 AS STRING), '.',
      |    CAST((c_custkey div 7) % 256 AS STRING), '.',
      |    CAST((c_custkey div 13) % 256 AS STRING)) ELSE '' END)""".stripMargin

  private val piiRedactSql = {
    // identical construction in DuckDB dialect
    val text =
      """c_name || ' (' || c_mktsegment || ') contact: ' ||
        |  CASE WHEN c_custkey % 3 = 0 THEN 'user' || CAST(c_custkey AS VARCHAR) ||
        |    (CASE CAST(c_custkey % 2 AS INT) WHEN 0 THEN '@example.com' ELSE '@mail.test.org' END)
        |    ELSE 'none' END ||
        |  CASE WHEN c_custkey % 4 = 0 THEN ' tel +1-' ||
        |    CAST(100 + c_custkey % 900 AS VARCHAR) || '-' ||
        |    lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
        |    lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
        |  CASE WHEN c_custkey % 5 = 0 THEN ' ssn ' ||
        |    CAST(100 + c_custkey % 900 AS VARCHAR) || '-' ||
        |    lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') || '-' ||
        |    lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
        |  CASE WHEN c_custkey % 2 = 0 THEN ' last-ip 10.' ||
        |    CAST(c_custkey % 256 AS VARCHAR) || '.' ||
        |    CAST((c_custkey // 7) % 256 AS VARCHAR) || '.' ||
        |    CAST((c_custkey // 13) % 256 AS VARCHAR) ELSE '' END""".stripMargin
    // progressive mask/count chain, one CTE per category in redaction order
    val stages = Cleaning.PiiPatterns.zipWithIndex.map {
      case ((cat, pat, mask), i) =>
        s"""p${i + 1} AS (SELECT c_custkey, contact_note,
           |  CAST(len(regexp_extract_all(t, '$pat')) AS BIGINT) AS n_$cat,
           |  regexp_replace(t, '$pat', '$mask', 'g') AS t
           |  ${(1 to i).map(j => s", n_${Cleaning.PiiPatterns(j - 1)._1}").mkString(" ")}
           |  FROM p$i)""".stripMargin
    }
    val names = Cleaning.PiiPatterns.map { case (cat, _, _) => s"n_$cat" }
    s"""WITH p0 AS (SELECT c_custkey, $text AS contact_note, $text AS t FROM customer),
       |${stages.mkString(",\n")}
       |SELECT c_custkey, contact_note, t AS redacted, ${names.mkString(", ")}
       |FROM p${Cleaning.PiiPatterns.size}""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "clean_customer_pipeline" -> (customerPipeline _),
    "clean_currency_extract"  -> (currencyExtract _),
    "clean_dates_multiformat" -> (datesMultiformat _),
    "clean_fuzzy_join"        -> (fuzzyJoinIds _),
    "clean_pii_redact"        -> (piiRedact _))

  val oracle: Map[String, String] = Map(
    "clean_customer_pipeline" -> customerPipelineSql,
    "clean_currency_extract"  -> currencyExtractSql,
    "clean_dates_multiformat" -> datesMultiformatSql,
    "clean_fuzzy_join"        -> fuzzyJoinSql,
    "clean_pii_redact"        -> piiRedactSql)
}
