package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media travels as opaque `binary` columns with typed metadata;
  * decode / feature-extract / frame-sample run as `mapPartitions` stages so a
  * real codec drops in per-partition (amortizing library init across rows,
  * the same batch shape `mapInPandas` gives Python).
  *
  * The decode step itself is STUBBED — no image/audio codecs ship in this
  * container — with a deterministic fake that parses our synthetic header
  * layout. Everything around it (schema, batching, partitioning, feature
  * shapes) is real and tested; swap [[decodeStub]] for a JNI/codec call and
  * nothing else changes.
  */
object Multimodal {

  /** media row schema: (media_id long, modality string, content binary). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true)))

  /** Deterministic fake decode: our synthetic header is
    * [w_hi, w_lo, h_hi, h_lo, payload...]; checksum = polynomial hash of the
    * payload bytes (same constants as graft_phash). */
  def decodeStub(content: Array[Byte]): (Int, Int, Long) = {
    val w = if (content.length >= 2) ((content(0) & 0xff) << 8) | (content(1) & 0xff) else 0
    val h = if (content.length >= 4) ((content(2) & 0xff) << 8) | (content(3) & 0xff) else 0
    var acc = 7L
    var i = 4
    while (i < content.length) {
      acc = (acc * 131L + (content(i) & 0xff)) % 1000000007L
      i += 1
    }
    (w, h, acc)
  }

  /** Deterministic binary media table derived from the documents corpus — the
    * harness that lets the decode PLUMBING be oracle-checked without real
    * codecs: content = [w_hi, w_lo, h_hi, h_lo] header (big-endian, from
    * doc_id arithmetic) followed by the document's UTF-8 bytes. The corpus is
    * pure ASCII (verified: strlen == length for every row at both scale
    * factors), so a byte-wise checksum over the payload equals the
    * codepoint-wise portable hash and DuckDB can reproduce every decoded
    * field with plain arithmetic — no BLOB construction needed on the oracle
    * side. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
        .as("modality"),
      expr("concat(unhex(concat(lpad(hex((doc_id % 1024) + 16), 4, '0'), " +
        "lpad(hex((doc_id % 768) + 16), 4, '0'))), cast(text as binary))")
        .as("content"))

  // public: encoder codegen instantiates these from generated Java
  case class MediaIn(media_id: Long, modality: String, content: Array[Byte])
  case class MediaContent(media_id: Long, content: Array[Byte])
  case class MediaMeta(media_id: Long, modality: String, width: Int,
                       height: Int, n_bytes: Long, checksum: Long)
  case class MediaFeature(media_id: Long, feature: Array[Float])

  /** Decode metadata per partition — one stub "codec init" per partition, not
    * per row (the pattern that matters when the codec is a real library).
    * Typed Dataset mapPartitions, not `.rdd`: encoder serialization is
    * codegen'd, so the only per-row cost beyond the codec call is the
    * case-class materialization — no Row boxing, no driver-side
    * createDataFrame re-analysis. */
  def extractMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    Scale.fanOutScan(media).select("media_id", "modality", "content").as[MediaIn]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { m =>
          val content = Option(m.content).getOrElse(Array.emptyByteArray)
          val (w, h, sum) = decodeStub(content)
          MediaMeta(m.media_id, m.modality, w, h, content.length.toLong, sum)
        }
      }.toDF()
  }

  /** Fixed-size float feature vector from payload bytes (deterministic fake
    * featurizer standing in for an embedding model; correct batch shape). */
  def featurize(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    Scale.fanOutScan(media).select("media_id", "content").as[MediaContent]
      .mapPartitions { it =>
        it.map { m =>
          val content = Option(m.content).getOrElse(Array.emptyByteArray)
          val acc = new Array[Float](dim)
          var i = 0
          while (i < content.length) {
            acc(i % dim) += (content(i) & 0xff) / 255.0f
            i += 1
          }
          MediaFeature(m.media_id, acc)
        }
      }.toDF()
  }

  /** Pseudo frame sampling for video-modality rows: emit `n` evenly spaced
    * byte-window "frames" per media item (explode keeps it distributed). */
  def frameSample(media: DataFrame, n: Int = 4, frameBytes: Int = 64): DataFrame =
    media
      .filter(col("modality") === "video")
      .withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_offset",
        (col("frame_idx") * greatest(length(col("content")) - frameBytes, lit(1)) / n).cast("int"))
      .withColumn("frame", expr(s"substring(content, frame_offset + 1, $frameBytes)"))
      .select("media_id", "frame_idx", "frame_offset", "frame")
}
