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
  * Header decode is REAL byte-level parsing of three public container
  * formats — PNG (IHDR, big-endian), JPEG (segment walk to SOF0/SOF2,
  * big-endian), WAV (RIFF chunk walk to `fmt `, little-endian) — from the
  * published format specs; no codec library involved, so it runs anywhere.
  * Only pixel/sample DECODING (which needs a real codec) is out of scope:
  * [[featurize]]'s byte featurizer stands in for it with the correct batch
  * shape, and a JNI/codec call drops into the same `mapPartitions` slot.
  */
object Multimodal {

  /** media row schema: (media_id long, modality string, content binary). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true)))

  /** Parsed container header: `width`/`height` are the two primary numeric
    * fields of the format (PNG/JPEG: pixel dims; WAV: sample rate and channel
    * count), `payloadOffset` is where the body starts. */
  final case class MediaHeader(format: String, width: Int, height: Int,
                               payloadOffset: Int)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    (be16(b, i) << 16) | be16(b, i + 2)
  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def le32(b: Array[Byte], i: Int): Int =
    (le16(b, i + 2) << 16) | le16(b, i)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    b.length >= i + s.length && s.indices.forall(j => b(i + j) == s.charAt(j).toByte)

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Sniff the container magic and parse the header fields at their
    * spec-mandated offsets. Unknown/truncated content degrades to
    * ("unknown", 0, 0, payload from 0) instead of throwing — a 100 TB media
    * scan must quarantine bad rows, not die on them. */
  def parseHeader(content: Array[Byte]): MediaHeader = {
    val n = content.length
    if (n >= 33 && content.startsWith(PngSig) && ascii(content, 12, "IHDR")) {
      // PNG: 8-byte signature, then the IHDR chunk (len+type+13 data+CRC).
      // Width/height are big-endian int32 at data offsets 0/4 (bytes 16/20).
      MediaHeader("png", be32(content, 16), be32(content, 20), 33)
    } else if (n >= 4 && (content(0) & 0xff) == 0xff && (content(1) & 0xff) == 0xd8) {
      // JPEG: walk marker segments from SOI until a start-of-frame marker
      // (C0-CF minus C4/C8/CC which are tables); dims are big-endian int16
      // at frame-data offsets 1 (height) and 3 (width). Per the spec, a
      // marker may be preceded by any number of 0xFF fill bytes (consume the
      // run, the marker code is the first non-FF), and FF 00 is a stuffed
      // data byte, not a length-bearing segment.
      var i = 2
      while (i + 1 < n && (content(i) & 0xff) == 0xff) {
        var j = i + 1
        while (j < n && (content(j) & 0xff) == 0xff) j += 1 // fill bytes
        if (j >= n) return MediaHeader("jpeg", 0, 0, 2)
        val marker = content(j) & 0xff
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof && j + 7 < n)
          return MediaHeader("jpeg", be16(content, j + 6), be16(content, j + 4),
            j + 1 + be16(content, j + 1))
        else if (marker == 0x00 || marker == 0x01 ||
          (marker >= 0xd0 && marker <= 0xd9)) i = j + 1 // stuffed/standalone
        else if (j + 2 < n) i = j + 1 + be16(content, j + 1)
        else return MediaHeader("jpeg", 0, 0, 2)
      }
      MediaHeader("jpeg", 0, 0, 2)
    } else if (ascii(content, 0, "RIFF") && ascii(content, 8, "WAVE")) {
      // WAV: RIFF chunk walk from byte 12; `fmt ` holds channels (LE16 at
      // data offset 2) and sample rate (LE32 at 4); `data` starts the body.
      var rate = 0; var channels = 0; var payload = n; var i = 12
      var done = false
      while (!done && i + 8 <= n) {
        // chunk size is UNSIGNED le32: a crafted/corrupt size like
        // 0xFFFFFFF8 read signed is -8, freezing the walk at one offset —
        // an executor task that never ends. Unsigned, next > i always holds
        // (the walk strictly advances) and an oversized chunk simply runs
        // past n, exiting to the degraded header.
        val size = le32(content, i + 4) & 0xffffffffL
        if (ascii(content, i, "fmt ") && i + 16 <= n) {
          channels = le16(content, i + 10); rate = le32(content, i + 12)
        } else if (ascii(content, i, "data")) { payload = i + 8; done = true }
        val next = i + 8L + size + (size & 1L) // chunks are word-aligned
        if (next > n) done = true else i = next.toInt
      }
      MediaHeader("wav", rate, channels, payload)
    } else MediaHeader("unknown", 0, 0, 0)
  }

  /** Polynomial checksum of the payload bytes (same constants as
    * graft_phash, so a pure-ASCII payload is oracle-reproducible from its
    * codepoints). */
  def payloadChecksum(content: Array[Byte], from: Int): Long = {
    var acc = 7L
    var i = math.max(from, 0)
    while (i < content.length) {
      acc = (acc * 131L + (content(i) & 0xff)) % 1000000007L
      i += 1
    }
    acc
  }

  /** Deterministic binary media table derived from the documents corpus — the
    * harness that lets the decode path be oracle-checked: content is a REAL
    * container header (PNG for image, WAV for audio, JPEG/MJPEG frame for
    * video — every magic byte, chunk length, and endianness per the public
    * specs) followed by the document's UTF-8 bytes as the body. All numeric
    * header fields derive from doc_id arithmetic, so DuckDB reproduces every
    * decoded field with plain arithmetic — no BLOB parsing on the oracle
    * side — while Spark must parse the actual bytes it built. The corpus is
    * pure ASCII (verified: strlen == length for every row at both scale
    * factors), so the byte-wise payload checksum equals the codepoint-wise
    * portable hash. */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    // header-field arithmetic shared with the oracle SQL
    val w = "((doc_id % 1024) + 16)" // PNG/JPEG width; WAV sample rate
    val h = "((doc_id % 768) + 16)"  // PNG/JPEG height; WAV channel count
    def beHex(e: String, digits: Int) = s"lpad(hex($e), $digits, '0')"
    // little-endian byte order = byte-swapped hex (values here fit 16 bits)
    def le16Hex(e: String) =
      s"concat(lpad(hex($e % 256), 2, '0'), lpad(hex(($e DIV 256) % 256), 2, '0'))"
    def le32Hex(e: String) = s"concat(${le16Hex(e)}, ${le16Hex(s"($e DIV 65536)")})"
    val png = "concat('89504E470D0A1A0A', '0000000D', '49484452', " +
      s"${beHex(w, 8)}, ${beHex(h, 8)}, '0806000000', '00000000')"
    val jpeg = "concat('FFD8', 'FFE0', '0010', '4A46494600', '0101', '00', " +
      s"'0001', '0001', '00', '00', 'FFC0', '0011', '08', ${beHex(h, 4)}, " +
      s"${beHex(w, 4)}, '03', '012200', '021101', '031101')"
    val wav = s"concat('52494646', ${le32Hex("(36 + length(text))")}, " +
      "'57415645', '666D7420', '10000000', '0100', " +
      s"${le16Hex(h)}, ${le32Hex(w)}, ${le32Hex(s"($w * $h * 2)")}, " +
      s"${le16Hex(s"($h * 2)")}, '1000', '64617461', ${le32Hex("length(text)")})"
    docs.select(
      col("doc_id").as("media_id"),
      expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
        .as("modality"),
      expr("concat(unhex(CASE CAST(doc_id % 3 AS INT) " +
        s"WHEN 0 THEN $png WHEN 1 THEN $wav ELSE $jpeg END), " +
        "cast(text as binary))").as("content"))
  }

  // ---- pixel/sample-level decode -------------------------------------------
  //
  // The r7 codec-slot boundary, filled for the two containers a JDK can
  // decode without an external codec: PNG pixel data (IDAT is zlib —
  // java.util.zip.Inflater IS the reference decompressor) and WAV PCM16
  // (raw little-endian samples). JPEG stays header-only: entropy-coded DCT
  // needs a real codec library, which this container does not ship.

  /** Deterministic pixel model for the synthetic PNG corpus: grayscale 8-bit,
    * pixel(r, c) = (id*31 + r*17 + c*7) mod 256 — plain integer arithmetic,
    * so the oracle reproduces every decoded pixel without parsing a byte. */
  private[graft] def pngPixel(id: Long, r: Int, c: Int): Int =
    ((id * 31L + r * 17L + c * 7L) % 256L).toInt
  /** Deterministic PCM model for the synthetic WAV corpus: signed 16-bit,
    * sample(i) = ((id*131 + i*17) mod 4096) - 2048. */
  private[graft] def wavSample(id: Long, i: Int): Int =
    ((id * 131L + i * 17L) % 4096L).toInt - 2048

  private def crc32(bs: Array[Byte]*): Long = {
    val c = new java.util.zip.CRC32
    bs.foreach(c.update)
    c.getValue
  }
  private def be32Bytes(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** A REAL PNG: signature, IHDR (grayscale-8), one IDAT holding the
    * zlib-DEFLATEd filter-0 scanlines, IEND — every chunk CRC32-correct, so
    * any standards-compliant decoder (not just ours) reads it back. */
  private[graft] def encodePng(id: Long, w: Int = 16, h: Int = 8): Array[Byte] = {
    val raw = new Array[Byte](h * (1 + w))
    var r = 0
    while (r < h) {
      raw(r * (1 + w)) = 0 // filter type 0 (None) per scanline
      var c = 0
      while (c < w) { raw(r * (1 + w) + 1 + c) = pngPixel(id, r, c).toByte; c += 1 }
      r += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = defl.deflate(buf); defl.end()
    val idat = java.util.Arrays.copyOf(buf, n)
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val t = typ.getBytes("US-ASCII")
      out.write(be32Bytes(data.length.toLong)); out.write(t); out.write(data)
      out.write(be32Bytes(crc32(t, data)))
    }
    chunk("IHDR", be32Bytes(w.toLong) ++ be32Bytes(h.toLong) ++
      Array[Byte](8, 0, 0, 0, 0)) // depth 8, greyscale, deflate, filter 0, no interlace
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** A REAL WAV: RIFF/fmt/data with `n` little-endian PCM16 mono samples. */
  private[graft] def encodeWav(id: Long, n: Int = 64, rate: Int = 8000): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    out.write("RIFF".getBytes("US-ASCII")); le32(36 + n * 2)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(1); le16(1); le32(rate); le32(rate * 2); le16(2); le16(16)
    out.write("data".getBytes("US-ASCII")); le32(n * 2)
    var i = 0
    while (i < n) { le16(wavSample(id, i) & 0xffff); i += 1 }
    out.toByteArray
  }

  /** Pixel-carrying synthetic media table: PNG for doc_id % 3 == 0, WAV for
    * % 3 == 1 (the % 3 == 2 "video" slot is header-only — JPEG pixel decode
    * needs a codec library). Unlike [[syntheticMedia]]'s SQL-built headers,
    * these bodies need zlib, so the encoder is a typed mapPartitions — the
    * same batch shape the decoder uses. */
  def syntheticPixelMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    Scale.fanOutScan(docs).filter(col("doc_id") % 3 =!= 2)
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          if (id % 3 == 0) MediaIn(id, "image", encodePng(id))
          else MediaIn(id, "audio", encodeWav(id))
        }
      }.toDF()
  }

  /** Inflate all IDAT chunks and strip the per-scanline filter bytes;
    * None for anything that is not a filter-0 grayscale-8 PNG (degrade,
    * don't throw — quarantine semantics, same as [[parseHeader]]). */
  private[graft] def decodePngPixels(content: Array[Byte]): Option[Array[Int]] =
    decodePngDims(content).map(_._3)

  /** Like [[decodePngPixels]] but keeps the IHDR geometry: (w, h, row-major
    * pixels) — the shape transforms (resize) need. */
  private[graft] def decodePngDims(content: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (content.length < 33 || !content.startsWith(PngSig)) return None
    var w = 0; var h = 0
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    while (i + 8 <= content.length) {
      val len = be32(content, i)
      if (len < 0 || i + 12 + len > content.length) return None
      val typ = new String(content, i + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          w = be32(content, i + 8); h = be32(content, i + 12)
          // only the layout we wrote: depth 8, color type 0 (grayscale)
          if (content(i + 16) != 8 || content(i + 17) != 0) return None
        case "IDAT" => idat.write(content, i + 8, len)
        case _ => ()
      }
      i += 12 + len
    }
    if (w <= 0 || h <= 0 || idat.size == 0) return None
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    val raw = new Array[Byte](h * (1 + w))
    try {
      val n = infl.inflate(raw)
      if (n != raw.length || !infl.finished()) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally infl.end()
    val px = new Array[Int](h * w)
    var r = 0
    while (r < h) {
      if (raw(r * (1 + w)) != 0) return None // only filter None decodable here
      var c = 0
      while (c < w) { px(r * w + c) = raw(r * (1 + w) + 1 + c) & 0xff; c += 1 }
      r += 1
    }
    Some((w, h, px))
  }

  /** Signed PCM16 samples from the data chunk located by [[parseHeader]]'s
    * RIFF walk; None for non-WAV or odd-length bodies. */
  private[graft] def decodeWavSamples(content: Array[Byte]): Option[Array[Int]] = {
    val hdr = parseHeader(content)
    if (hdr.format != "wav" || hdr.payloadOffset >= content.length) return None
    val body = content.length - hdr.payloadOffset
    if (body % 2 != 0) return None
    val s = new Array[Int](body / 2)
    var i = 0
    while (i < s.length) {
      s(i) = (le16(content, hdr.payloadOffset + 2 * i) << 16) >> 16 // sign-extend
      i += 1
    }
    Some(s)
  }

  case class MediaValues(media_id: Long, kind: String, n_values: Long,
                         val_sum: Long, val_min: Long, val_max: Long,
                         checksum: Long)

  /** Decode pixel/sample VALUES per partition and reduce each media item to
    * integer stats + a polynomial value checksum (same constants as
    * graft_phash; negative samples hash as their unsigned-16 representation,
    * so every hashed value is non-negative and the modular arithmetic is
    * engine-portable). Undecodable rows degrade to kind='undecoded' with
    * zero stats — visible downstream, never dropped silently. */
  private def stats(id: Long, kind: String, vals: Array[Int]): MediaValues = {
    var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue; var acc = 7L
    var i = 0
    while (i < vals.length) {
      val v = vals(i)
      sum += v; if (v < mn) mn = v; if (v > mx) mx = v
      acc = (acc * 131L + (v & 0xffff)) % 1000000007L
      i += 1
    }
    if (vals.isEmpty) MediaValues(id, kind, 0L, 0L, 0L, 0L, 7L)
    else MediaValues(id, kind, vals.length.toLong, sum, mn, mx, acc)
  }

  def decodeSamples(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    Scale.fanOutScan(media).select("media_id", "content").as[MediaContent]
      .mapPartitions { it =>
        it.map { m =>
          val content = Option(m.content).getOrElse(Array.emptyByteArray)
          decodePngPixels(content).map(stats(m.media_id, "png", _))
            .orElse(decodeWavSamples(content).map(stats(m.media_id, "wav", _)))
            .getOrElse(MediaValues(m.media_id, "undecoded", 0L, 0L, 0L, 0L, 7L))
        }
      }.toDF()
  }

  /** Decode-then-TRANSFORM: nearest-neighbor downscale for images (every
    * `scale`-th pixel on both axes — the top-left-anchor convention, integer
    * index arithmetic only, so the oracle replays it without resampling
    * theory) and sample-decimation for audio (every `decim`-th sample — the
    * rate/`decim` downsample without an interpolation filter). Reduces each
    * transformed item to the same integer stats as [[decodeSamples]]: a
    * transform bug (wrong stride, off-by-one anchor, lost row) lands on
    * stats the arithmetic twin won't produce. Same typed mapPartitions
    * shape — decode, transform, and reduce fuse into one pass per item, no
    * intermediate pixel table is ever materialized or shuffled. */
  def transformSamples(media: DataFrame, scale: Int = 2, decim: Int = 4): DataFrame = {
    require(scale >= 1 && decim >= 1, s"scale=$scale decim=$decim must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    Scale.fanOutScan(media).select("media_id", "content").as[MediaContent]
      .mapPartitions { it =>
        it.map { m =>
          val content = Option(m.content).getOrElse(Array.emptyByteArray)
          decodePngDims(content).map { case (w, h, px) =>
            val ow = w / scale; val oh = h / scale
            val out = new Array[Int](ow * oh)
            var r = 0
            while (r < oh) {
              var c = 0
              while (c < ow) { out(r * ow + c) = px(r * scale * w + c * scale); c += 1 }
              r += 1
            }
            stats(m.media_id, "png_resized", out)
          }.orElse(decodeWavSamples(content).map { s =>
            val out = Array.tabulate((s.length + decim - 1) / decim)(i => s(i * decim))
            stats(m.media_id, "wav_decimated", out)
          }).getOrElse(MediaValues(m.media_id, "undecoded", 0L, 0L, 0L, 0L, 7L))
        }
      }.toDF()
  }

  /** 64-bit difference hash (dHash — the public perceptual-hash family:
    * Krawetz's "Kind of Like That" description; each sampled pixel compared
    * with its right neighbor on an 8x8 sample grid) over a row-major
    * grayscale grid. Returned SPLIT into two 32-bit halves so downstream
    * integer arithmetic never touches a BIGINT sign bit in either engine
    * (DuckDB BIGINT overflow throws; a bit-63 shift would). Sample rows are
    * floor(i*h/8), cols floor(j*w/8) with the right neighbor clamped to the
    * grid — on the synthetic 16x8 corpus that is rows i and column pairs
    * (2j, 2j+1), the concrete form the arithmetic oracle replays.
    * Invariances (pinned by MultimodalSpec, claimed nowhere stronger):
    * EXACT under any brightness shift or positive contrast scale that
    * preserves pixel ORDER (no clipping/wrap); 180-degree rotation of a
    * strictly horizontally-monotone grid complements every bit; a 2x
    * nearest-neighbor downscale of a horizontally-monotone grid preserves
    * every non-clamped bit (a width-8 result clamps sample column 7's
    * neighbor to itself — those 8 bits read 0). No rotation/crop robustness
    * beyond that is claimed — dHash is a near-dup hash, not an invariant
    * descriptor. */
  private[graft] def dHash(w: Int, h: Int, px: Array[Int]): (Long, Long) = {
    require(w >= 2 && h >= 1 && px.length == w * h, s"bad grid ${w}x$h/${px.length}")
    var lo = 0L; var hi = 0L
    var k = 0; var i = 0
    while (i < 8) {
      val r = (i * h) / 8
      var j = 0
      while (j < 8) {
        val c0 = (j * w) / 8
        val c1 = math.min(c0 + 1, w - 1)
        if (px(r * w + c0) < px(r * w + c1)) {
          if (k < 32) lo |= (1L << k) else hi |= (1L << (k - 32))
        }
        k += 1; j += 1
      }
      i += 1
    }
    (hi, lo)
  }

  case class MediaHash(media_id: Long, dhash_hi: Long, dhash_lo: Long)

  /** Perceptual image near-dup REPORT: decode every PNG (real zlib inflate —
    * non-images and undecodable content degrade out, quarantine semantics),
    * dHash the pixel grid, generate candidate pairs by PIGEONHOLE BANDING
    * (4 disjoint 16-bit bands: two hashes within Hamming distance
    * `maxHamming` <= 3 of each other must agree exactly on >= 1 band — the
    * same blocking [[Dedup.simhashPairs]] uses, never an all-pairs join),
    * verify candidates with the exact popcount distance, and fold to ONE ROW
    * PER IMAGE: its hash halves, how many near-dups it has, and its smallest
    * partner id. The per-image fold keeps the report corpus-sized even when
    * the corpus carries large mutually-similar cohorts (where the pair LIST
    * is quadratic by definition).
    *
    * Scale shape: hash table is image-count-sized and persists once; the
    * band self-join is bounded by band-bucket occupancy (near-dup-sized on
    * real corpora); verification is a codegen'd projection on candidates. */
  def perceptualNearDups(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "pigeonhole banding with 4 bands covers maxHamming <= 3")
    val spark = media.sparkSession
    import spark.implicits._
    val hashes = Scale.fanOutScan(media).select("media_id", "content").as[MediaContent]
      .mapPartitions { it =>
        it.flatMap { m =>
          decodePngDims(Option(m.content).getOrElse(Array.emptyByteArray)).map {
            case (w, h, px) =>
              val (hiB, loB) = dHash(w, h, px)
              MediaHash(m.media_id, hiB, loB)
          }
        }
      }.toDF().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandExprs = Seq(
      expr("dhash_lo & 65535"), expr("(dhash_lo >> 16) & 65535"),
      expr("dhash_hi & 65535"), expr("(dhash_hi >> 16) & 65535"))
    val bands = hashes.select(col("media_id"), col("dhash_hi"), col("dhash_lo"),
      posexplode(array(bandExprs: _*)).as(Seq("band", "bv")))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.media_id") =!= col("y.media_id"))
      .select(col("x.media_id").as("a"),
        col("x.dhash_hi").as("ah"), col("x.dhash_lo").as("al"),
        col("y.media_id").as("b"),
        col("y.dhash_hi").as("bh"), col("y.dhash_lo").as("bl"))
      .distinct()
    val verified = cand.filter(
      (bit_count(expr("ah ^ bh")) + bit_count(expr("al ^ bl"))) <= maxHamming)
    val perImage = verified.groupBy(col("a").as("media_id"))
      .agg(count(lit(1)).cast("bigint").as("n_near_dups"),
        min(col("b")).as("min_dup_id"))
    hashes.join(perImage, Seq("media_id"), "left")
      .select(col("media_id"), col("dhash_hi"), col("dhash_lo"),
        coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"),
        col("min_dup_id"))
  }

  /** 32-bit audio fingerprint over decoded PCM samples — the integer-only
    * shape of the published band-energy fingerprint family (Haitsma &
    * Kalker, "A Highly Robust Audio Fingerprinting System", ISMIR 2002:
    * frame the signal, compare band-energy differences, emit one bit per
    * (frame, band)). No FFT is available from arithmetic both engines can
    * replay, so the four "bands" are the Haar pyramid of each frame —
    * exact integer sub-band energies, coarsest (DC magnitude) to finest
    * (pairwise deltas):
    *
    *  - the waveform is sampled onto a fixed 64-point grid (stride n/64 —
    *    the audio analogue of dHash's 8x8 pixel grid), 8 frames x 8 points;
    *  - frame t's band energies: E0 = |sum of all 8|, E1 = |first4 - last4|,
    *    E2 = |p0+p1-p2-p3| + |p4+p5-p6-p7|, E3 = sum of |pairwise deltas|;
    *  - bit (t, b) = E(t, b) > E((t+1) mod 8, b) — energy rising into the
    *    next frame, the Haitsma-Kalker time-delta sign, packed LSB-first at
    *    k = t*4 + b. The result is < 2^32, so downstream XOR/popcount
    *    arithmetic never touches a BIGINT sign bit in either engine.
    *
    * None for clips shorter than the grid or not grid-divisible (degrade,
    * don't throw — quarantine semantics, same as the decoders). Invariance
    * (pinned by MultimodalSpec): EXACT under gain scaling that preserves
    * energy ORDER (any positive integer gain without clipping); amplitude
    * inversion (negation) preserves every bit (energies are magnitudes). */
  private[graft] def audioFingerprint(s: Array[Int]): Option[Long] = {
    if (s.length < 64 || s.length % 64 != 0) return None
    val stride = s.length / 64
    val g = new Array[Long](64)
    var k = 0
    while (k < 64) { g(k) = s(k * stride).toLong; k += 1 }
    val e = Array.ofDim[Long](8, 4)
    var t = 0
    while (t < 8) {
      val o = t * 8
      var sum = 0L; var d4 = 0L
      var j = 0
      while (j < 8) {
        sum += g(o + j)
        d4 += (if (j < 4) g(o + j) else -g(o + j))
        j += 1
      }
      e(t)(0) = math.abs(sum)
      e(t)(1) = math.abs(d4)
      e(t)(2) = math.abs(g(o) + g(o + 1) - g(o + 2) - g(o + 3)) +
        math.abs(g(o + 4) + g(o + 5) - g(o + 6) - g(o + 7))
      e(t)(3) = math.abs(g(o) - g(o + 1)) + math.abs(g(o + 2) - g(o + 3)) +
        math.abs(g(o + 4) - g(o + 5)) + math.abs(g(o + 6) - g(o + 7))
      t += 1
    }
    var fp = 0L
    t = 0
    while (t < 8) {
      var b = 0
      while (b < 4) {
        if (e(t)(b) > e((t + 1) % 8)(b)) fp |= (1L << (t * 4 + b))
        b += 1
      }
      t += 1
    }
    Some(fp)
  }

  /** Audio near-dup REPORT — one row per decodable clip: its fingerprint,
    * how many near-dups (Hamming <= maxHamming) it has, and its smallest
    * partner id. Same report contract as [[perceptualNearDups]], different
    * scale shape: audio fingerprints COLLAPSE onto shared values far more
    * than image hashes (silence, loops, re-encodes of one master), so the
    * naive banded self-join over clips is quadratic in cohort size. This
    * path contracts to DISTINCT fingerprints first:
    *
    *  1. cohort fold — group clips by fingerprint: size, min id, second-min
    *     id (two node-sized passes; second-min needs the min first);
    *  2. banded join across DISTINCT fingerprints only (4 disjoint 8-bit
    *     pigeonhole bands — two fingerprints within Hamming <= 3 must agree
    *     exactly on >= 1 band), popcount-verified: cohort-count-sized, not
    *     clip-count-sized;
    *  3. per-clip algebra — n_near_dups = (own cohort size - 1) + sum of
    *     near cohorts' sizes; min partner = least of (own cohort's min id
    *     excluding self, near cohorts' min id). No quadratic pair list is
    *     ever materialized; a million identical clips cost one cohort row.
    *
    * The verified OUTPUT is identical to brute force — the contraction is
    * invisible in the report, which is what the oracle replays. */
  def audioNearDups(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "pigeonhole banding with 4 bands covers maxHamming <= 3")
    val spark = media.sparkSession
    import spark.implicits._
    val sigs = Scale.fanOutScan(media).select("media_id", "content").as[MediaContent]
      .mapPartitions { it =>
        it.flatMap { m =>
          decodeWavSamples(Option(m.content).getOrElse(Array.emptyByteArray))
            .flatMap(audioFingerprint).map(fp => (m.media_id, fp))
        }
      }.toDF("media_id", "afp")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m1 = sigs.groupBy("afp")
      .agg(count(lit(1)).cast("bigint").as("n_same"), min("media_id").as("m1"))
    val coh = sigs.join(m1, "afp")
      .groupBy("afp")
      .agg(first("n_same").as("n_same"), first("m1").as("m1"),
        min(when(col("media_id") =!= col("m1"), col("media_id"))).as("m2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandExprs = Seq(
      expr("afp & 255"), expr("(afp >> 8) & 255"),
      expr("(afp >> 16) & 255"), expr("(afp >> 24) & 255"))
    val bands = coh.select(col("afp"), col("n_same"), col("m1"),
      posexplode(array(bandExprs: _*)).as(Seq("band", "bv")))
    val near = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.afp") =!= col("y.afp"))
      .select(col("x.afp").as("afp"), col("y.afp").as("bfp"),
        col("y.n_same").as("bn"), col("y.m1").as("bm1"))
      .distinct()
      .filter(bit_count(expr("afp ^ bfp")) <= maxHamming)
      .groupBy("afp")
      .agg(sum(col("bn")).cast("bigint").as("cross_n"), min(col("bm1")).as("cross_min"))
    sigs.join(coh, "afp").join(near, Seq("afp"), "left")
      .select(col("media_id"), col("afp"),
        (col("n_same") - lit(1L) + coalesce(col("cross_n"), lit(0L)))
          .cast("bigint").as("n_near_dups"),
        least(when(col("media_id") === col("m1"), col("m2")).otherwise(col("m1")),
          col("cross_min")).as("min_dup_id"))
  }

  // public: encoder codegen instantiates these from generated Java
  case class MediaIn(media_id: Long, modality: String, content: Array[Byte])
  case class MediaContent(media_id: Long, content: Array[Byte])
  case class MediaMeta(media_id: Long, modality: String, format: String,
                       width: Int, height: Int, n_bytes: Long, checksum: Long)
  case class MediaFeature(media_id: Long, feature: Array[Float])

  /** Decode metadata per partition — one codec/parser init per partition, not
    * per row (the pattern that matters when the codec is a real library).
    * Typed Dataset mapPartitions, not `.rdd`: encoder serialization is
    * codegen'd, so the only per-row cost beyond the parse is the case-class
    * materialization — no Row boxing, no driver-side createDataFrame
    * re-analysis. The format column comes from magic-byte sniffing, NOT the
    * claimed modality — mislabeled media shows up as a modality/format
    * mismatch instead of silently decoding wrong. */
  def extractMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    Scale.fanOutScan(media).select("media_id", "modality", "content").as[MediaIn]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { m =>
          val content = Option(m.content).getOrElse(Array.emptyByteArray)
          val hdr = parseHeader(content)
          MediaMeta(m.media_id, m.modality, hdr.format, hdr.width, hdr.height,
            content.length.toLong, payloadChecksum(content, hdr.payloadOffset))
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
