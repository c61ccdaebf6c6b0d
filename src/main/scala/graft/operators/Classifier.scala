package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Trainable text-quality classification — the fastText-style linear
  * classifier every production curation stack distills its heuristics into
  * (CCNet trains wiki-vs-crawl, GPT-3 WebText-vs-crawl; Joulin et al.,
  * "Bag of Tricks for Efficient Text Classification", arXiv 1607.01759 —
  * public method): hashed bag-of-words features into a fixed bucket space,
  * a linear model trained by iterative updates, margins as quality scores.
  *
  * The trainer is the INTEGER batch perceptron rather than logistic SGD,
  * deliberately: every update is y·count arithmetic on BIGINTs (no
  * learning-rate float, no sigmoid — `exp` is not bitwise-portable), so
  * training is exactly reproducible run-to-run, cluster-to-cluster, and
  * ENGINE-to-engine — the whole training trajectory (per-epoch weight
  * vectors) hash-checks against an unrolled SQL replay of the same epochs.
  */
object Classifier {

  /** Batch-perceptron training over hashed bag-of-words features.
    *
    * Input `labeled`: (doc_id, text, y) with y ∈ {+1, −1} (BIGINT) — or
    * (doc_id, toks, y) with the tokens precomputed (see [[features]]).
    * Features
    * x_{d,b} = count of document d's tokens hashing into bucket b
    * (portable polynomial hash mod `buckets`). Per epoch, over the WHOLE
    * batch (classic batch perceptron): margin m_d = Σ_b x_{d,b}·w_b; every
    * doc with y·m ≤ 0 is misclassified (w = 0 start ⇒ epoch 1 updates on
    * every doc); w += Σ_misclassified y·x. Fixed `epochs`, no convergence
    * test — determinism over asymptotics.
    *
    * Output: one row per bucket with the weight AFTER each epoch
    * (bucket, w1 … wE) — the full training trajectory, report-sized.
    *
    * Scale shape: the feature table is built once (one corpus scan + one
    * map-side-combined token aggregate) then contracted to ONE row per doc
    * — (doc_id, y, feats: array<(b, x)>), ≤ `buckets` entries each — and
    * persisted. Each epoch is then a SINGLE scan of that doc-level cache
    * with no join and no second fx read: the margin folds the per-doc array
    * against the weight vector inlined as a codegen'd literal-array lookup
    * (`buckets` longs — driver-sized by construction), misclassified docs'
    * features explode into a map-side-combined `buckets`-row delta
    * aggregate, and only those deltas reach the driver (the BPE-argmax
    * bounded-probe pattern). The interpreted HOF fold is per-doc over a
    * ≤`buckets`-entry array — bounded work per row, evaluated once (the
    * margin feeds only the filter), not a corpus-token hot path. A/B'd vs
    * the broadcast-join two-read epoch: 2× faster per epoch, bitwise equal
    * (tools/ClassifierProbe). Docs whose tokens hash nowhere (empty text)
    * carry no features: they update nothing and are consistently absent
    * from both engines' margin tables. */
  def trainPerceptron(labeled: DataFrame, buckets: Int = 64,
                      epochs: Int = 3): DataFrame = {
    require(buckets > 0 && buckets <= 65536, "buckets must be in [1, 65536]")
    require(epochs > 0 && epochs <= 16, "epochs must be in [1, 16]")
    val spark = labeled.sparkSession
    graft.plans.GraftFunctions.register(spark)
    // One row per doc: integer sums are order-independent, so collect_list's
    // nondeterministic ordering cannot leak into the weights.
    val fd = features(labeled, buckets)
      .groupBy("doc_id", "y")
      .agg(collect_list(struct(col("b"), col("x"))).as("feats"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val w = Array.fill(buckets)(0L)
    val history = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    try {
      (1 to epochs).foreach { _ =>
        // ONE array literal, not a CreateArray with `buckets` children: at
        // the upper bucket bounds a 65536-child expression tree would blow
        // codegen's method-size limit and stall the analyzer; a single
        // typed literal is a constant reference at any bucket count
        val wlit = typedlit(w.toSeq)
        fd.withColumn("m", aggregate(col("feats"), lit(0L),
            (acc, f) => acc + f.getField("x") *
              element_at(wlit, f.getField("b").cast("int") + 1)))
          .filter(col("y") * col("m") <= 0)
          .select(col("y"), explode(col("feats")).as("f"))
          .groupBy(col("f.b").as("b")).agg(sum(col("y") * col("f.x")).as("dw"))
          .collect().foreach(r => w(r.getLong(0).toInt) += r.getLong(1))
        history += w.clone()
      }
    } finally fd.unpersist()
    val schema = StructType(StructField("bucket", LongType, nullable = false) +:
      (1 to epochs).map(e => StructField(s"w$e", LongType, nullable = false)))
    val rows = (0 until buckets).map(b =>
      Row.fromSeq(b.toLong +: history.map(_(b)).toSeq))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Score documents with a trained weight table (bucket, w): per-doc margin
    * and keep/drop prediction — the serve side, one corpus scan + one
    * broadcast join. Docs with no features score margin 0 (pred = false). */
  def scorePerceptron(docs: DataFrame, weights: DataFrame,
                      buckets: Int = 64): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    // a weight table trained in a different bucket space would silently
    // score against the wrong buckets — fail loudly instead (the table is
    // weights-sized, so the count is a report-sized probe)
    val nw = weights.count()
    require(nw == buckets,
      s"weight table has $nw rows but scorePerceptron was given buckets=$buckets " +
        "— score with the bucket count the model was trained with")
    val fx = features(docs.withColumn("y", lit(1L)), buckets)
    val margins = fx
      .join(broadcast(weights.select(col("bucket").as("b"), col("w"))), Seq("b"), "left")
      .groupBy("doc_id")
      .agg(sum(col("x") * coalesce(col("w"), lit(0L))).as("margin"))
    docs.select("doc_id").join(margins, Seq("doc_id"), "left")
      .withColumn("margin", coalesce(col("margin"), lit(0L)))
      .withColumn("pred", col("margin") > 0)
  }

  /** The quality-classifier wrapper ([[trainPerceptron]] with labels
    * DISTILLED from the portable heuristic): y = +1 iff
    * [[TextOps.qualityScore]] ≥ `thr` — the standard bootstrap when no human
    * labels exist (train on a trusted signal, serve the cheap linear model).
    * Both the label chain and the training are bitwise-portable, so the
    * full trajectory is oracle-checked. */
  def qualityPerceptron(docs: DataFrame, buckets: Int = 64, epochs: Int = 3,
                        thr: Double = 2.0): DataFrame =
    // labels arrive inline ([[TextOps.qualityLabels]] is a pure projection):
    // one corpus scan feeds both the label and the feature build — no
    // second scan, no doc_id join
    trainPerceptron(TextOps.qualityLabels(docs, thr), buckets, epochs)

  /** Hashed bag-of-words: (doc_id, y, bucket, count). The hash is the NATIVE
    * codegen'd `graft_phash` (bitwise-pinned to [[Portable.phashSpark]] by
    * `PortableParitySpec`) — this projection runs once per corpus TOKEN, the
    * hot path where the CLAUDE.md rule bans the interpreted HOF chain; same
    * formulation as the DSIR bucket hash. Non-negative, so plain `%` agrees
    * across engines. A `toks` column (the tokenizer's output, e.g. from
    * [[TextOps.qualityLabels]]'s label projection) passes through instead of
    * re-tokenizing `text` — same-scan projection sharing. */
  private def features(labeled: DataFrame, buckets: Int): DataFrame = {
    // a toks passthrough means the frame already went through the label
    // projection's fanOutScan — fanning out AGAIN would re-shuffle the
    // materialized token arrays corpus-wide for nothing (fanOutScan only
    // inspects the file-scan leaf width, so it cannot see the upstream
    // repartition)
    val (src, toksCol) =
      if (labeled.columns.contains("toks")) (labeled, col("toks"))
      else (Scale.fanOutScan(labeled), expr("graft_tokens(text)"))
    src
      .select(col("doc_id"), col("y"), explode(toksCol).as("tok"))
      .select(col("doc_id"), col("y"),
        pmod(expr("graft_phash(tok)"), lit(buckets.toLong)).as("b"))
      .groupBy("doc_id", "y", "b")
      .agg(count(lit(1)).cast("bigint").as("x"))
  }
}
