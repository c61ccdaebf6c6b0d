package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Pluggable model-enrichment slot — the engine-side twin of the reference's
  * LLM enrichment surface (DEMO.md:127-147 `AI.GENERATE_TEXT` /
  * `ML.GENERATE_EMBEDDING`; services/data-cleaning-agent/main.py:140-166
  * header/PII model calls): the user hands a BATCH function (their model
  * client), the engine owns the distributed plumbing —
  *
  *  - per-PARTITION client init (connection/model load amortized across
  *    rows: the same batch shape `mapInPandas` gives Python UDFs);
  *  - bounded batch size, so a remote endpoint sees requests it can serve
  *    and an OOM-prone local model sees bounded inputs;
  *  - graceful per-row degradation: a failing batch retries row-by-row and
  *    a failing ROW degrades through [[Enricher.onFailure]] — one poison
  *    document cannot kill a 100 TB job (quarantine semantics, same
  *    contract as the decode paths);
  *  - a typed output column declared up front, so Catalyst plans the
  *    downstream, not a blob.
  *
  * The heuristic twins ([[Heuristics]], `Cleaning.redactPii`) remain the
  * in-engine semantics the gates verify; this trait is the seam where a real
  * embedder/classifier/generator drops in without touching any caller. Specs
  * pin the plumbing with a deterministic fake (batch boundaries, init-once,
  * failure paths) — exactly the stub-the-model / verify-the-plumbing recipe
  * the multimodal decode layer uses.
  */
object Enrich {

  /** User contract. `init` runs once per partition before the first batch
    * (load the client there, NOT in the constructor — the instance is
    * serialized from the driver); `enrichBatch` receives 1..maxBatch inputs
    * and must return EXACTLY one output per input, positionally;
    * `onFailure` maps a row that failed even solo to a degraded output. */
  trait Enricher[I, O] extends Serializable {
    def init(): Unit = ()
    def enrichBatch(in: Seq[I]): Seq[O]
    def onFailure(in: I, e: Throwable): O
  }

  private def runBatches[O](batches: Iterator[Seq[(Long, String)]],
                            enricher: Enricher[String, O]): Iterator[(Long, O)] =
    batches.flatMap { batch =>
      val texts = batch.map(_._2)
      val outs =
        try {
          val o = enricher.enrichBatch(texts)
          require(o.length == batch.length,
            s"enricher returned ${o.length} outputs for ${batch.length} inputs")
          o
        } catch {
          case scala.util.control.NonFatal(_) =>
            // batch failed: isolate the poison row(s) — retry each alone,
            // degrade only what still fails
            texts.map { t =>
              try {
                val o = enricher.enrichBatch(Seq(t))
                require(o.length == 1, "enricher must return 1 output for 1 input")
                o.head
              } catch { case scala.util.control.NonFatal(e) => enricher.onFailure(t, e) }
            }
        }
      batch.map(_._1).zip(outs)
    }

  /** Text-to-text enrichment (classification labels, rewrites, generated
    * fields): returns (id, `outCol` string). One corpus pass; the enrichment
    * cost IS the model call, the engine adds a partition-local batching
    * iterator and nothing else. */
  def enrichText(docs: DataFrame, idCol: String, textCol: String,
                 enricher: Enricher[String, String], maxBatch: Int = 32,
                 outCol: String = "enrichment"): DataFrame = {
    require(maxBatch >= 1, s"maxBatch must be >= 1, got $maxBatch")
    val spark = docs.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, String)] = Scale.fanOutScan(docs)
      .select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
    in.mapPartitions { it =>
      enricher.init()
      runBatches(it.grouped(maxBatch), enricher)
    }.toDF(idCol, outCol)
  }

  /** Text-to-embedding enrichment: returns (id, `outCol` array<float>),
    * dimension-checked against `dim` so a misbehaving model fails loudly at
    * the row it broke instead of poisoning a downstream ANN build. */
  def enrichEmbedding(docs: DataFrame, idCol: String, textCol: String,
                      enricher: Enricher[String, Array[Float]], dim: Int,
                      maxBatch: Int = 32,
                      outCol: String = "embedding"): DataFrame = {
    require(maxBatch >= 1 && dim >= 1, s"need maxBatch >= 1 and dim >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, String)] = Scale.fanOutScan(docs)
      .select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
    in.mapPartitions { it =>
      enricher.init()
      runBatches(it.grouped(maxBatch), enricher).map { case (id, v) =>
        require(v == null || v.length == dim,
          s"enricher returned a ${if (v == null) "null" else v.length.toString}-dim " +
            s"vector for id $id, expected $dim")
        (id, v)
      }
    }.toDF(idCol, outCol)
  }
}
