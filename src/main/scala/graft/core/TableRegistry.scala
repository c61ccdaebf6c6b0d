package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** In-session table registry — the reference's DuckDB session table map
  * (core/duckdb_session.py:37-74: register, describe, row-count, destructive
  * guard) as typed metadata over temp views.
  */
final case class TableMetadata(name: String, source: String, registeredAtMs: Long,
                               columns: Seq[(String, String)])

class TableRegistry(spark: SparkSession) {
  private val tables = scala.collection.mutable.LinkedHashMap.empty[String, TableMetadata]

  private val NamePattern = "[a-zA-Z_][a-zA-Z0-9_]*".r

  /** Register a DataFrame as a queryable view (reference validates
    * identifiers before interpolating them into SQL — same guard here). */
  def register(name: String, df: DataFrame, source: String = ""): TableMetadata = {
    require(NamePattern.matches(name), s"invalid table name: $name")
    df.createOrReplaceTempView(name)
    val meta = TableMetadata(name, source, System.currentTimeMillis(),
      df.schema.fields.map(f =>
        f.name -> graft.operators.SchemaOps.canonicalTypeName(f.dataType)).toSeq)
    tables(name) = meta
    meta
  }

  def get(name: String): Option[TableMetadata] = tables.get(name)
  def list(): Seq[TableMetadata] = tables.values.toSeq
  def describe(name: String): Seq[(String, String)] =
    tables.getOrElse(name, throw new NoSuchElementException(name)).columns
  def table(name: String): DataFrame = spark.table(name)
  def rowCount(name: String): Long = spark.table(name).count()

  def drop(name: String): Unit = {
    spark.catalog.dropTempView(name)
    tables.remove(name)
  }

  /** Reject raw destructive SQL — the reference's session guard
    * (duckdb_session.py reject_destructive). Queries must go through the
    * typed API; this only screens the SQL passthrough. */
  def sql(q: String): DataFrame = {
    // strip leading comments/whitespace before inspecting the first token —
    // a "/* x */ DROP ..." or "DROP\nTABLE" must not slip past the guard
    val stripped = q.replaceAll("(?s)\\A(\\s*(/\\*.*?\\*/|--[^\\n]*(\\n|\\z)))*\\s*", "")
    val firstToken = stripped.takeWhile(c => !c.isWhitespace && c != '(' && c != ';').toLowerCase
    val destructive = Set("drop", "delete", "truncate", "insert", "update", "alter", "create")
    require(!destructive.contains(firstToken),
      s"destructive statements are not allowed through the registry: $q")
    spark.sql(q)
  }
}
