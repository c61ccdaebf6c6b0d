package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers, mirroring how a 100 TB training-data pipeline would run:
  *  - [[bruteForceTopK]]: exact cosine top-k of a (small, broadcast) query set
  *    against the full vector table. One pass over the vectors, per-partition
  *    top-k heaps via TakeOrdered-style window + filter. This is the
  *    correctness baseline and the oracle-checked path.
  *  - [[lshAnnTopK]]: random-hyperplane LSH bucketing — vectors and queries
  *    are signed against `nBits` fixed pseudo-random hyperplanes; candidates
  *    are vectors sharing a bucket with the query in any of `nTables` hash
  *    tables; exact cosine re-ranks candidates. Probe cost scales with bucket
  *    occupancy, not table size; buckets are an equi-join key so the probe is
  *    a shuffle join, not a cross join.
  */
object Similarity {

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding"),
      expr(Portable.normSpark("embedding")).as("nrm"))

  /** Exact cosine top-k for queries `vec_id < nQueries` (self excluded). */
  def bruteForceTopK(emb: DataFrame, nQueries: Int = 20, k: Int = 10): DataFrame = {
    val e = withNorm(emb)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("emb_q"), col("nrm").as("norm_q"))
    val v = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("emb_v"), col("nrm").as("norm_v"))
    val scored = v.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        expr(s"(${Portable.dotSpark("emb_q", "emb_v")})") / (col("norm_q") * col("norm_v")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "cosine", "rnk")
  }

  /** Deterministic pseudo-random hyperplane component for (bit, dim) — cheap
    * integer mix mapped to [-1, 1); shared with tests, never with an oracle
    * (ANN answers are approximate by design). */
  private def plane(bit: Int, d: Int): Double = {
    val h = math.floorMod(1103515245L * (bit * 131L + d * 31L + 17L) + 12345L, 1L << 31)
    h.toDouble / (1L << 30).toDouble - 1.0
  }

  /** LSH signature: for each table, an `nBits`-bit bucket id from hyperplane
    * signs. Returns (vec_id, table, bucket). */
  def lshBuckets(emb: DataFrame, nTables: Int = 8, nBits: Int = 12): DataFrame = {
    val buckets = (0 until nTables).map { t =>
      val bits = (0 until nBits).map { b =>
        val dot = (1 to Portable.Dim).map { d =>
          s"cast(element_at(embedding, $d) as double) * ${plane(t * nBits + b, d)}"
        }.mkString(" + ")
        s"(CASE WHEN ($dot) >= 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString(" + ")
      expr(s"cast($bits as bigint)")
    }
    emb.select(col("vec_id"), col("embedding"),
        posexplode(array(buckets: _*)).as(Seq("table", "bucket")))
      .select("vec_id", "embedding", "table", "bucket")
  }

  /** ANN top-k via LSH candidate generation + exact cosine re-rank. */
  def lshAnnTopK(emb: DataFrame, nQueries: Int = 20, k: Int = 10,
                 nTables: Int = 8, nBits: Int = 12): DataFrame = {
    val e = withNorm(emb)
    val bk = lshBuckets(emb, nTables, nBits)
    val qb = bk.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("table"), col("bucket"))
    val cand = bk.join(qb, Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    val q = e.select(col("vec_id").as("query_id"), col("embedding").as("emb_q"), col("nrm").as("norm_q"))
    val v = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("emb_v"), col("nrm").as("norm_v"))
    val scored = cand.join(broadcast(q), "query_id").join(v, "neighbor_id")
      .withColumn("cosine",
        expr(s"(${Portable.dotSpark("emb_q", "emb_v")})") / (col("norm_q") * col("norm_v")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "cosine", "rnk")
  }
}
