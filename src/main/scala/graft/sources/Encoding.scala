package graft.sources

import java.nio.charset.{CharacterCodingException, Charset, StandardCharsets}
import java.nio.file.{Files, Path, Paths}

/** Encoding detection + UTF-8 transcoding (reference:
  * datagrunt_agent/core/file_detector.py:127-165 `ensure_utf8`): BOM sniff,
  * strict UTF-8 validation over a head sample, Windows-1252/Latin-1 fallback.
  * Driver-side over file heads only — the transcode streams the file once.
  */
object Encoding {

  sealed trait Detected { def charset: Charset }
  case object Utf8 extends Detected { val charset = StandardCharsets.UTF_8 }
  case object Utf8Bom extends Detected { val charset = StandardCharsets.UTF_8 }
  case object Utf16Le extends Detected { val charset = StandardCharsets.UTF_16LE }
  case object Utf16Be extends Detected { val charset = StandardCharsets.UTF_16BE }
  case object Windows1252 extends Detected { val charset = Charset.forName("windows-1252") }

  def detect(path: String, sampleBytes: Int = 64 * 1024): Detected = {
    val head = {
      val in = new java.io.FileInputStream(path)
      try {
        val buf = new Array[Byte](sampleBytes)
        val n = in.read(buf)
        buf.take(math.max(n, 0))
      } finally in.close()
    }
    if (head.length >= 3 && head(0) == 0xEF.toByte && head(1) == 0xBB.toByte && head(2) == 0xBF.toByte)
      Utf8Bom
    else if (head.length >= 2 && head(0) == 0xFF.toByte && head(1) == 0xFE.toByte)
      Utf16Le
    else if (head.length >= 2 && head(0) == 0xFE.toByte && head(1) == 0xFF.toByte)
      Utf16Be
    else {
      // a multi-byte character straddling the sample boundary must not
      // misclassify a valid UTF-8 file: trim any incomplete trailing sequence
      // (up to 3 continuation bytes + 1 lead byte) before strict validation
      val trimmed =
        if (head.length < sampleBytes) head
        else {
          var end = head.length
          var dropped = 0
          while (end > 0 && dropped < 3 && (head(end - 1) & 0xC0) == 0x80) {
            end -= 1; dropped += 1
          }
          if (end > 0 && (head(end - 1) & 0xC0) == 0xC0) end -= 1
          head.take(end)
        }
      val dec = StandardCharsets.UTF_8.newDecoder()
      try { dec.decode(java.nio.ByteBuffer.wrap(trimmed)); Utf8 }
      catch { case _: CharacterCodingException => Windows1252 }
    }
  }

  /** Return a path whose contents are valid UTF-8 without BOM — the input
    * itself when already clean, else a transcoded sibling `<name>.utf8`. */
  def ensureUtf8(path: String): Path = {
    detect(path) match {
      case Utf8 => Paths.get(path)
      case d =>
        val src = Paths.get(path)
        val out = src.resolveSibling(src.getFileName.toString + ".utf8")
        val bytes = Files.readAllBytes(src)
        val skip = d match {
          case Utf8Bom => 3
          case Utf16Le | Utf16Be => 2
          case _ => 0
        }
        val text = new String(bytes, skip, bytes.length - skip, d.charset)
        Files.write(out, text.getBytes(StandardCharsets.UTF_8))
        out
    }
  }
}
