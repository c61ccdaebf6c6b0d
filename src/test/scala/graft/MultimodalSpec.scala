package graft

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // real container headers, built independently of syntheticMedia's SQL
  private def png(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(33).order(ByteOrder.BIG_ENDIAN)
    b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
    b.put(Array[Byte](8, 6, 0, 0, 0)).putInt(0) // bit depth..interlace, CRC
    b.array() ++ payload
  }
  private def jpeg(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(39).order(ByteOrder.BIG_ENDIAN)
    b.put(Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)).putShort(16)
    b.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    b.put(Array[Byte](1, 1, 0)).putShort(1).putShort(1).put(Array[Byte](0, 0))
    b.put(Array(0xff, 0xc0).map(_.toByte)).putShort(17).put(8.toByte)
    b.putShort(h.toShort).putShort(w.toShort)
    b.put(3.toByte).put(Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    b.array() ++ payload
  }
  private def wav(rate: Int, channels: Int, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + payload.length)
    b.put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
    b.putInt(16).putShort(1).putShort(channels.toShort).putInt(rate)
    b.putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(payload.length)
    b.array() ++ payload
  }

  private def media() = {
    val rows = Seq(
      Row(1L, "image", png(640, 480, Array.tabulate(32)(_.toByte))),
      Row(2L, "audio", wav(44100, 2, Array.tabulate(8)(i => (i * 3).toByte))),
      Row(3L, "video", jpeg(1280, 720, Array.tabulate(512)(i => (i % 251).toByte))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
  }

  test("parseHeader reads PNG/JPEG dims and WAV fmt at spec offsets") {
    val p = Multimodal.parseHeader(png(2000, 1125, Array[Byte](1, 2)))
    assert(p == Multimodal.MediaHeader("png", 2000, 1125, 33))
    val j = Multimodal.parseHeader(jpeg(4096, 2160, Array.emptyByteArray))
    assert(j == Multimodal.MediaHeader("jpeg", 4096, 2160, 39))
    val a = Multimodal.parseHeader(wav(16000, 1, Array[Byte](9)))
    assert(a == Multimodal.MediaHeader("wav", 16000, 1, 44))
  }

  test("parseHeader degrades on unknown or truncated content, never throws") {
    assert(Multimodal.parseHeader("not media".getBytes) ==
      Multimodal.MediaHeader("unknown", 0, 0, 0))
    assert(Multimodal.parseHeader(Array.emptyByteArray) ==
      Multimodal.MediaHeader("unknown", 0, 0, 0))
    // SOI but no SOF segment: jpeg with no dims rather than a crash
    val j = Multimodal.parseHeader(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte))
    assert(j.format == "jpeg" && j.width == 0 && j.height == 0)
    // PNG signature but truncated before IHDR completes
    assert(Multimodal.parseHeader(png(1, 1, Array.emptyByteArray).take(20))
      .format == "unknown")
  }

  test("JPEG fill bytes and stuffed FF 00 pairs parse per spec") {
    // fill bytes: FF D8, then a run of padding FFs before the SOF marker
    val fill = Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xc0).map(_.toByte) ++
      Array[Byte](0, 17, 8) ++ // len=17, precision
      Array[Byte](0, 16, 0, 32) ++ // height 16, width 32
      Array.fill[Byte](12)(0)
    val f = Multimodal.parseHeader(fill)
    assert(f.format == "jpeg" && f.width == 32 && f.height == 16,
      s"fill bytes misparsed: $f")
    // stuffed byte: FF 00 must advance by 2, not read a garbage length
    val stuffed = Array(0xff, 0xd8, 0xff, 0x00, 0xff, 0xc0).map(_.toByte) ++
      Array[Byte](0, 17, 8) ++ Array[Byte](0, 8, 0, 9) ++ Array.fill[Byte](12)(0)
    val s = Multimodal.parseHeader(stuffed)
    assert(s.format == "jpeg" && s.width == 9 && s.height == 8,
      s"stuffed byte misparsed: $s")
    // all-FF tail degrades instead of running off the buffer
    val ffTail = Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xff).map(_.toByte)
    assert(Multimodal.parseHeader(ffTail) == Multimodal.MediaHeader("jpeg", 0, 0, 2))
  }

  test("WAV chunk walk terminates on corrupt/crafted chunk sizes") {
    // a chunk size of 0xFFFFFFF8 is -8 signed: the old walk advanced by
    // zero and hung the task forever; unsigned it runs past n and degrades
    val b = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(16)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("junk".getBytes("US-ASCII")).putInt(0xfffffff8)
    val h = Multimodal.parseHeader(b.array()) // must return, not hang
    assert(h.format == "wav" && h.width == 0 && h.height == 0)
    // size that lands the next offset exactly at n still parses fine
    val ok = wav(8000, 2, Array[Byte](1, 2, 3, 4))
    assert(Multimodal.parseHeader(ok) == Multimodal.MediaHeader("wav", 8000, 2, 44))
  }

  test("extractMeta sniffs format and decodes dims + deterministic checksum") {
    val m = Multimodal.extractMeta(media()).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getString(2) == "png" && m(1L).getInt(3) == 640 && m(1L).getInt(4) == 480)
    assert(m(2L).getString(2) == "wav" && m(2L).getInt(3) == 44100 && m(2L).getInt(4) == 2)
    assert(m(3L).getString(2) == "jpeg" && m(3L).getInt(3) == 1280 && m(3L).getInt(4) == 720)
    // checksum covers the payload only and is stable across runs
    val expect1 = Multimodal.payloadChecksum(
      png(640, 480, Array.tabulate(32)(_.toByte)), 33)
    assert(m(1L).getLong(6) == expect1)
    val again = Multimodal.extractMeta(media()).collect()
      .map(r => r.getLong(0) -> r.getLong(6)).toMap
    m.foreach { case (id, r) => assert(again(id) == r.getLong(6)) }
  }

  test("syntheticMedia bytes parse back to the arithmetic header fields") {
    import spark.implicits._
    val docs = Seq((300L, "alpha beta gamma"), (301L, "delta"), (302L, "epsilon zeta"))
      .toDF("doc_id", "text")
    val meta = Multimodal.extractMeta(Multimodal.syntheticMedia(docs)).collect()
      .map(r => r.getLong(0) -> r).toMap
    Seq(300L -> "png", 301L -> "wav", 302L -> "jpeg").foreach { case (id, fmt) =>
      val r = meta(id)
      assert(r.getString(2) == fmt, s"doc $id format")
      assert(r.getInt(3) == (id % 1024 + 16).toInt, s"doc $id width")
      assert(r.getInt(4) == (id % 768 + 16).toInt, s"doc $id height")
    }
    val hdrLen = Map(300L -> 33, 301L -> 44, 302L -> 39)
    Seq("alpha beta gamma" -> 300L, "delta" -> 301L, "epsilon zeta" -> 302L)
      .foreach { case (text, id) =>
        assert(meta(id).getLong(5) == hdrLen(id) + text.length, s"doc $id n_bytes")
        assert(meta(id).getLong(6) ==
          Multimodal.payloadChecksum(text.getBytes("US-ASCII"), 0), s"doc $id checksum")
      }
  }

  test("featurize emits fixed-dim float vectors") {
    val f = Multimodal.featurize(media(), dim = 16).collect()
    assert(f.length == 3)
    f.foreach(r => assert(r.getSeq[Float](1).length == 16))
  }

  test("frameSample explodes video rows into n frames") {
    val fr = Multimodal.frameSample(media(), n = 4, frameBytes = 64).collect()
    assert(fr.length == 4)
    assert(fr.map(_.getInt(1)).toSet == Set(0, 1, 2, 3))
    fr.foreach(r => assert(r.getAs[Array[Byte]]("frame").length == 64))
  }

  test("encodePng is a SPEC-compliant PNG: the JDK's own ImageIO decodes it " +
    "to the same pixels our Inflater path reads back") {
    for (id <- Seq(0L, 3L, 999L)) {
      val bytes = Multimodal.encodePng(id)
      // independent decoder: javax.imageio's full PNG pipeline (zlib, CRC,
      // filters) — if our chunk lengths, CRCs, or IDAT stream were wrong in
      // any byte, this read returns null or garbage
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected the PNG for id $id")
      assert(img.getWidth == 16 && img.getHeight == 8)
      for (r <- 0 until 8; c <- 0 until 16) {
        val expected = Multimodal.pngPixel(id, r, c)
        assert((img.getRaster.getSample(c, r, 0)) == expected, s"px($r,$c) id $id")
      }
      // and our own decoder agrees with the generating model
      val own = Multimodal.decodePngPixels(bytes).get
      assert(own.length == 128)
      for (r <- 0 until 8; c <- 0 until 16)
        assert(own(r * 16 + c) == Multimodal.pngPixel(id, r, c))
    }
  }

  test("encodeWav round-trips signed PCM16 through the RIFF walk") {
    for (id <- Seq(1L, 4L, 1000L)) {
      val s = Multimodal.decodeWavSamples(Multimodal.encodeWav(id)).get
      assert(s.length == 64)
      for (i <- 0 until 64) assert(s(i) == Multimodal.wavSample(id, i), s"sample $i id $id")
      assert(s.exists(_ < 0), "sample model must exercise sign extension")
    }
  }

  test("decodeSamples degrades undecodable content instead of throwing") {
    import spark.implicits._
    val junk = Seq(
      (1L, "image", Array[Byte](1, 2, 3)),                       // not a container
      (2L, "image", Multimodal.encodePng(7L).dropRight(30)),     // truncated into IDAT
      (3L, "audio", "RIFFxxxxWAVE".getBytes("US-ASCII")),        // WAV with no data chunk
      (4L, "audio", null.asInstanceOf[Array[Byte]]))             // null content
      .toDF("media_id", "modality", "content")
    val out = Multimodal.decodeSamples(junk).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.values.forall(_ == "undecoded"), s"expected degrade, got $out")
  }

  test("transformSamples: exact nearest-neighbor anchor, decimation stride, degrade") {
    import spark.implicits._
    val media = Seq(
      (3L, "image", Multimodal.encodePng(3L)),   // 16x8 grayscale
      (4L, "audio", Multimodal.encodeWav(4L)),   // 64 samples
      (5L, "image", Array[Byte](1, 2, 3)))       // junk degrades
      .toDF("media_id", "modality", "content")
    val rows = Multimodal.transformSamples(media, scale = 2, decim = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(6))).toMap
    // replay the value model through the same index substitution
    val px = for (r <- 0 until 4; c <- 0 until 8)
      yield Multimodal.pngPixel(3L, r * 2, c * 2)
    val wv = (0 until 16).map(i => Multimodal.wavSample(4L, i * 4))
    def chk(vals: Seq[Int]) =
      vals.foldLeft(7L)((a, v) => (a * 131L + (v & 0xffff)) % 1000000007L)
    assert(rows(3L) == (("png_resized", 32L, px.map(_.toLong).sum, chk(px))))
    assert(rows(4L) == (("wav_decimated", 16L, wv.map(_.toLong).sum, chk(wv))))
    assert(rows(5L)._1 == "undecoded")
    // scale=1/decim=1 is the identity: same stats as the plain decode
    val id = Multimodal.transformSamples(media, scale = 1, decim = 1)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(2)).toMap
    val plain = Multimodal.decodeSamples(media)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(2)).toMap
    assert(id(3L) == plain(3L) && id(4L) == plain(4L))
  }

  test("dHash invariance bounds: brightness/contrast exact, rot180 complement, 2x scale") {
    def grid(w: Int, h: Int)(f: (Int, Int) => Int): Array[Int] =
      Array.tabulate(w * h)(k => f(k / w, k % w))
    val w = 16; val h = 8
    // order-preserving pixel maps leave every comparison — hence the hash —
    // EXACTLY unchanged: +shift (no clip) and positive contrast scale
    val base = grid(w, h)((r, c) => 10 + r * 3 + c * 5) // strictly increasing per row
    val hBase = Multimodal.dHash(w, h, base)
    assert(Multimodal.dHash(w, h, base.map(_ + 40)) == hBase, "brightness shift")
    assert(Multimodal.dHash(w, h, base.map(_ * 2)) == hBase, "contrast scale")
    // 180-degree rotation of a strictly horizontally-monotone grid reverses
    // every left<right comparison: the 64-bit hash complements exactly
    val rot = grid(w, h)((r, c) => base((h - 1 - r) * w + (w - 1 - c)))
    val (rh, rl) = Multimodal.dHash(w, h, rot)
    val (bh, bl) = hBase
    assert((rh ^ bh) == 0xFFFFFFFFL && (rl ^ bl) == 0xFFFFFFFFL, "rot180 complement")
    // 2x nearest-neighbor downscale of a horizontally-monotone grid keeps
    // every NON-CLAMPED bit (on an exactly-8-wide grid, sample column j=7
    // clamps its neighbor to itself and reads 0 — the documented bound):
    // 56 of 64 bits identical, Hamming distance exactly the 8 clamped bits
    val down = grid(w / 2, h / 2)((r, c) => base((r * 2) * w + c * 2))
    val (dh, dl) = Multimodal.dHash(w / 2, h / 2, down)
    val mask = 0x7F7F7F7FL // drops bit j=7 of each sampled row half
    assert((dh & mask) == (bh & mask) && (dl & mask) == (bl & mask),
      "2x downscale preserves non-clamped bits")
    assert(java.lang.Long.bitCount(dh ^ bh) + java.lang.Long.bitCount(dl ^ bl) == 8,
      "distance is exactly the clamped column")
    // and the documented NON-invariance: a wrap (mod-256 overflow mid-row)
    // flips the wrapped comparison — dHash is a near-dup hash, not an
    // invariant descriptor; this is the failure mode the bound excludes
    val wrapped = base.map(v => (v + 200) % 256)
    assert(Multimodal.dHash(w, h, wrapped) != hBase, "wrap breaks order-preservation")
  }

  test("audioFingerprint invariance bounds: gain exact, negation exact, grid gate") {
    val base = Array.tabulate(64)(i => ((i * 37 + 11) % 4096) - 2048)
    val fp = Multimodal.audioFingerprint(base)
    assert(fp.isDefined && fp.get >= 0L && fp.get < (1L << 32), "32-bit, sign-safe")
    // positive gain scales every band energy by the same factor — every
    // E(t,b) > E(t+1,b) comparison, hence the fingerprint, is unchanged
    assert(Multimodal.audioFingerprint(base.map(_ * 3)) == fp, "gain invariant")
    // amplitude inversion: energies are magnitudes — exact
    assert(Multimodal.audioFingerprint(base.map(-_)) == fp, "negation invariant")
    // a 2x oversampled clip (each sample repeated) hits the same 64-point
    // grid positions 0,2,4,... — i.e. the original samples — so the
    // fingerprint is EXACT under integer-stride upsampling
    assert(Multimodal.audioFingerprint(base.flatMap(v => Array(v, v))) == fp,
      "2x sample-repeat hits the same grid")
    // degrade gates: short clips and non-divisible lengths return None
    assert(Multimodal.audioFingerprint(base.take(63)).isEmpty, "short clip")
    assert(Multimodal.audioFingerprint(base ++ Array(1)).isEmpty, "non-divisible")
    // documented NON-invariance: a DC shift changes magnitude energies
    assert(Multimodal.audioFingerprint(base.map(_ + 500)) != fp ||
      base.forall(_ == base.head), "DC shift is not claimed invariant")
  }

  test("audioNearDups cohort contraction equals brute force on a degenerate corpus") {
    import spark.implicits._
    // 30 clips but only 3 distinct waveforms (10-clip cohorts) plus one
    // near-miss: the quadratic-cohort regime the contraction exists for
    val media = (0L until 30L).map { id =>
      val master = id % 3 // three identical-waveform cohorts
      Multimodal.MediaIn(id, "audio",
        Multimodal.encodeWav(master * 1000L, n = 64))
    }.toDF()
    val rep = Multimodal.audioNearDups(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(rep.length == 30)
    // brute force the expectation from the fingerprints themselves
    val fps = (0L until 30L).map { id =>
      val s = Array.tabulate(64)(i => Multimodal.wavSample((id % 3) * 1000L, i))
      id -> Multimodal.audioFingerprint(s).get
    }.toMap
    rep.foreach { case (id, n, minDup) =>
      val near = (0L until 30L).filter(o => o != id &&
        java.lang.Long.bitCount(fps(id) ^ fps(o)) <= 3)
      assert(n == near.length.toLong, s"clip $id: n_near_dups $n vs brute ${near.length}")
      assert(minDup == near.sorted.headOption, s"clip $id min partner")
    }
    // the within-cohort floor: every clip has at least its 9 cohort-mates
    assert(rep.forall(_._2 >= 9L), "cohort mates counted without a pair join")
  }
}
