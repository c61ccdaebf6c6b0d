package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Distributed k-means clustering over the embedding corpus — the curation
  * primitive behind cluster-balanced data mixing, SemDeDup cell structure,
  * and per-topic corpus accounting (reference analogue: the corpus-profiling
  * stage of services/loader; clustering itself is beyond the reference,
  * prompt-mandated training-data tooling).
  *
  * Oracle-checkability is the design constraint: parallel FLOAT centroid
  * means are association-order nondeterministic, so a naive k-means can
  * never hash-match a DuckDB twin. Instead the corpus is snapped onto an
  * integer grid once ([[Portable.quantVecSpark]], exact in double), and from
  * there every step is pure integer arithmetic:
  *
  *  - assignment: unrolled BIGINT squared-L2 (the [[graft.plans.QL2Argmin]]
  *    native fold of [[Portable.qL2Spark]]) against the driver-held literal
  *    centroid grid, ties to the lowest cell id — a pure projection, zero
  *    exchanges;
  *  - update: per-(cell, dim) BIGINT sums (order-independent), centroid
  *    components re-snapped to the grid via one IEEE division
  *    ([[Portable.qMeanSpark]]);
  *  - init: the same deterministic stride sample as
  *    [[Similarity.ivfCentroids]].
  *
  * Cells that lose every member simply disappear (documented; stride init on
  * a shuffled corpus makes this rare). The result is a bitwise-portable
  * k-means whose DuckDB oracle replays the identical unrolled iterations.
  *
  * Scale shape: each iteration is ONE corpus scan (literal-centroid argmin
  * projection, zero exchanges) feeding a map-side-combined (cell, dim)
  * aggregate whose exchange is k·Dim partial rows per task — no all-pairs
  * stage, no corpus-sized shuffle, no driver-side loop over rows. Iteration
  * count is a constant; the k·Dim-BIGINT centroid collect per round is the
  * driver-bounded action that keeps lineage flat (plans are rebuilt from
  * literals, so no checkpoint chain grows).
  */
object Clustering {

  /** vec_id + BIGINT grid coordinates, materialized so projection collapse
    * cannot inline the 64-term quantization into every downstream consumer. */
  private[operators] def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), expr(Portable.quantVecSpark("embedding")).as("q"))
      .localCheckpoint(false)

  /** Stride-sampled initial centroids on the grid: cell j = the quantized
    * vector at vec_id j*stride (stride = n/k) — zero-iteration start shared
    * with the IVF oracle family. */
  private def initCentroids(q: DataFrame, k: Int): DataFrame = {
    val stats = q.agg(greatest((count(lit(1)) / k).cast("long"), lit(1L)).as("stride"))
    q.crossJoin(broadcast(stats))
      .filter(col("vec_id") % col("stride") === 0 && expr("vec_id div stride") < k)
      .select(expr("vec_id div stride").as("cell"), col("q").as("c"))
  }

  /** Nearest-centroid assignment against a DRIVER-HELD centroid table:
    * (vec_id, cell, dist, q) — one [[graft.plans.QL2Argmin]] projection with
    * the k·Dim centroid grid inlined as BIGINT literals. ZERO exchanges (the
    * map-side assignment every production k-means ships — guide §2.1,
    * remove shuffles outright); before r16 this was crossJoin(broadcast) +
    * a groupBy(vec_id) argmin fold, a corpus-sized hash exchange per Lloyd
    * iteration. Same unrolled integer L2, same (dist asc, cell asc) tie
    * rule, so the kept rows are bitwise-identical to the aggregate twin
    * (PortableParitySpec pins native-vs-SQL-chain equality; the oracle
    * gates re-prove the end-to-end result at both SFs). The `ac` struct is
    * split in a SECOND projection so CollapseProject keeps the
    * multi-referenced non-cheap argmin un-inlined (one eval per row). */
  private def assign(q: DataFrame, cent: Seq[(Long, Seq[Long])]): DataFrame = {
    val centsSql = cent.map(_._2.mkString("array(", "L, ", "L)"))
      .mkString("array(", ", ", ")")
    val cellsSql = cent.map(_._1).mkString("array(", "L, ", "L)")
    q.select(col("vec_id"),
        expr(s"graft_ql2_argmin(q, $centsSql, $cellsSql)").as("ac"), col("q"))
      .select(col("vec_id"), col("ac.cell").as("cell"),
        col("ac.dist").as("dist"), col("q"))
  }

  /** k rows × (cell, Dim grid coords) to the driver — k·Dim BIGINTs, the
    * |domains|-sized-frame class; this collect IS the per-round action (it
    * replaces the former eager localCheckpoint), and building the next
    * round's plan from literals keeps lineage flat without checkpoints. */
  private def collectCent(df: DataFrame): Seq[(Long, Seq[Long])] =
    df.collect().toSeq.map(r => (r.getLong(0), r.getSeq[Long](1)))

  /** Mean-update on the integer grid: per-(cell, dim) BIGINT sums, re-snapped
    * componentwise; the array is rebuilt in dim order. k·Dim rows total —
    * broadcast-sized by construction. */
  private def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cell"), posexplode(col("q")).as(Seq("d", "x")))
      .groupBy("cell", "d")
      .agg(sum("x").as("sx"), count(lit(1)).as("cnt"))
      .withColumn("cv", expr(Portable.qMeanSpark("sx", "cnt")))
      .groupBy("cell")
      .agg(expr("transform(array_sort(collect_list(struct(d, cv))), s -> s.cv)").as("c"))

  /** Lloyd iterations on the integer grid; returns the final assignment with
    * its cluster size: (vec_id, cluster, dist, cluster_size), all BIGINT —
    * a float-free result that hash-checks against the DuckDB replay. */
  def kmeans(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 1, s"need k >= 1, iters >= 1; got k=$k iters=$iters")
    graft.plans.GraftFunctions.register(emb.sparkSession)
    val q = quantized(emb)
    var cent = collectCent(initCentroids(q, k))
    // degenerate: stride init found no rows — empty corpus, or non-contiguous
    // vec_ids the stride filter misses entirely. Return an EMPTY frame (the
    // pre-r16 crossJoin-with-empty-broadcast semantics); the r16 shape
    // returned every row with vec_id garbage in dist/cluster_size (r16 ADVICE)
    if (cent.isEmpty)
      return q.filter(lit(false)).select(col("vec_id"),
        col("vec_id").as("cluster"), col("vec_id").as("dist"),
        col("vec_id").as("cluster_size"))
    for (_ <- 1 to iters)
      cent = collectCent(update(assign(q, cent)))
    val fin = assign(q, cent)
    val sizes = fin.groupBy("cell").agg(count(lit(1)).as("cluster_size"))
    fin.join(broadcast(sizes), "cell")
      .select(col("vec_id"), col("cell").as("cluster"), col("dist"),
        col("cluster_size"))
  }

  /** Prototype pruning (the published data-pruning recipe: Sorscher et al.,
    * "Beyond neural scaling laws — beating power law scaling via data
    * pruning", NeurIPS 2022: with abundant data, drop the EASIEST examples —
    * the ones closest to their cluster centroid — and keep the informative
    * margin): from a [[kmeans]] assignment, drop the `dropNum/dropDen`
    * closest fraction of each cluster and keep the rest.
    *
    * The cut is exact integer arithmetic — rank by (dist ASC, id ASC; the id
    * tiebreak makes the window total, so ties at the cut cannot flap
    * between runs) and drop rank <= cluster_size * dropNum div dropDen —
    * bitwise-portable against a window replay. The per-cluster window sorts
    * one cluster per partition: exact-rank semantics, right at this
    * report's k-bounded scale; a 100 TB corpus with billion-member clusters
    * would trade exactness for a distance THRESHOLD from the mergeable
    * histogram-quantile sketch (`Profiling.quantileByGroup`) and a
    * codegen'd filter — same decision, no global sort (documented path). */
  def prototypePrune(clustered: DataFrame, dropNum: Long, dropDen: Long,
                     idCol: String = "vec_id"): DataFrame = {
    require(dropDen > 0 && dropNum >= 0 && dropNum <= dropDen,
      s"need 0 <= dropNum <= dropDen, got $dropNum/$dropDen")
    val w = Window.partitionBy("cluster").orderBy(col("dist").asc, col(idCol).asc)
    clustered.withColumn("rn", row_number().over(w))
      .filter(col("rn") > expr(s"cluster_size * $dropNum div $dropDen"))
      .select(col(idCol), col("cluster"), col("dist"))
  }
}
