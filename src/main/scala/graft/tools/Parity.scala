package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-only scratch main: prints candidate portable-primitive values so
  * tools/parity.py can diff them against DuckDB. Not part of the library API.
  */
object Parity {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val toks = Seq("example", "spark", "a", "hash", "部分", "Zürich").toDF("tok")
    // polynomial rolling hash over codepoints, mod 1e9+7
    val ph = toks.select(
      col("tok"),
      expr("aggregate(transform(sequence(1, length(tok)), i -> ascii(substr(tok, i, 1))), 7L, (acc, c) -> (acc * 131 + c) % 1000000007)").as("ph"),
      expr("split(tok, '')").as("chars"))
    ph.collect().foreach(r => println(s"PH\t${r.getString(0)}\t${r.getLong(1)}\t${r.getSeq[String](2).mkString("|")}"))

    // fixed-order dot product over a float array cast to double
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .orderBy("vec_id").limit(3)
    val dot = (1 to 64).map(i =>
      expr(s"cast(element_at(embedding, $i) as double) * cast(element_at(embedding, $i) as double)"))
      .reduce(_ + _)
    emb.select(col("vec_id"), dot.as("norm2"))
      .collect().foreach(r => println(s"NORM2\t${r.getLong(0)}\t${java.lang.Double.toHexString(r.getDouble(1))}"))

    // tokenization parity: split on single space, drop empties
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .orderBy("doc_id").limit(2)
    docs.select(col("doc_id"),
      expr("filter(split(text, ' '), x -> x <> '')").as("toks"))
      .collect().foreach(r => println(s"TOKS\t${r.getLong(0)}\t${r.getSeq[String](1).take(8).mkString("|")}\t${r.getSeq[String](1).size}"))

    // exact percentile (interpolated) on a double column
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    li.select(
      expr("percentile(l_extendedprice, 0.25)").as("q1"),
      expr("percentile(l_extendedprice, 0.75)").as("q3"))
      .collect().foreach(r => println(s"PCT\t${java.lang.Double.toHexString(r.getDouble(0))}\t${java.lang.Double.toHexString(r.getDouble(1))}"))

    // json extraction
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").orderBy("event_id").limit(3)
    ev.select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .collect().foreach(r => println(s"JSON\t${r.getLong(0)}\t${r.getLong(1)}"))
    spark.stop()
  }
}
