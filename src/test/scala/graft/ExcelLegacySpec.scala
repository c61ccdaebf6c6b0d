package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Excel, ExcelLegacy}

/** Legacy .xls (BIFF8-in-CFB) pins: both container paths (mini-stream under
  * the 4096-byte cutoff, regular FAT above it), RK/MULRK/NUMBER/BOOLERR/
  * FORMULA decoding via forged records, SST strings split across CONTINUE
  * boundaries, sparse rows, unicode, and the Excel.read magic dispatch. */
class ExcelLegacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(suffix: String): String = {
    val p = java.nio.file.Files.createTempFile("graft-xls", suffix)
    p.toFile.deleteOnExit()
    p.toString
  }

  test("round trip SMALL workbook: mini-stream container path") {
    import spark.implicits._
    val df = Seq(("1", "ann", "ümlaut π"), ("2", null, "b"))
      .toDF("id", "name", "note")
    val path = tmp(".xls")
    ExcelLegacy.write(df, path)
    // under the cutoff -> the workbook must live in the mini-stream
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Path.of(path))
    assert(ExcelLegacy.workbookStream(bytes).length < 4096)
    val back = ExcelLegacy.read(spark, path)
    assert(back.columns.toSeq == Seq("id", "name", "note"))
    val rows = back.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(rows == Seq(("1", "ann", "ümlaut π"), ("2", null, "b")))
  }

  test("round trip LARGE workbook: regular-FAT container path") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toString, s"value_$i" * 3)).toDF("k", "v")
    val path = tmp(".xls")
    ExcelLegacy.write(df, path)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Path.of(path))
    assert(ExcelLegacy.workbookStream(bytes).length >= 4096)
    val back = ExcelLegacy.read(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1.toInt).toSeq
    assert(back == (1 to 500).map(i => (i.toString, s"value_$i" * 3)))
  }

  test("Excel.read dispatches .xls by OLE2 magic") {
    import spark.implicits._
    val df = Seq(("7", "legacy")).toDF("a", "b")
    val path = tmp(".xls")
    ExcelLegacy.write(df, path)
    val viaDispatch = Excel.read(spark, path).collect()
    assert(viaDispatch.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("7", "legacy")))
    // junk that is neither zip nor OLE2 still refuses loudly
    val junk = tmp(".xls")
    java.nio.file.Files.write(java.nio.file.Path.of(junk), "not a workbook".getBytes)
    intercept[IllegalArgumentException](Excel.read(spark, junk))
  }

  test("forged NUMBER / RK / MULRK / BOOLERR / FORMULA records decode exactly") {
    // header row via LABEL, then one row per numeric record family
    def u16b(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def u32b(v: Int) = u16b(v & 0xFFFF) ++ u16b((v >>> 16) & 0xFFFF)
    val intRk = (12345 << 2) | 0x02                  // 30-bit int form
    val int100Rk = (-987654 << 2) | 0x02 | 0x01      // int / 100 (negative)
    val dblRk = {                                    // truncated double form
      val bits = java.lang.Double.doubleToLongBits(2.5)
      ((bits >>> 32) & 0xFFFFFFFCL).toInt
    }
    val cells = Seq(
      (0x0204, ExcelLegacy.labelBody(0, 0, "x")),
      (0x0203, ExcelLegacy.numberBody(1, 0, 3.75)),               // NUMBER
      (0x027E, u16b(2) ++ u16b(0) ++ u16b(0) ++ u32b(intRk)),     // RK int
      (0x027E, u16b(3) ++ u16b(0) ++ u16b(0) ++ u32b(int100Rk)),  // RK int/100
      (0x027E, u16b(4) ++ u16b(0) ++ u16b(0) ++ u32b(dblRk)),     // RK double
      // MULRK writes cols 0..1 of row 5: values 7 and 0.07
      (0x00BD, u16b(5) ++ u16b(0) ++
        (u16b(0) ++ u32b((7 << 2) | 0x02)) ++
        (u16b(0) ++ u32b((7 << 2) | 0x02 | 0x01)) ++ u16b(1)),
      (0x0205, u16b(6) ++ u16b(0) ++ u16b(0) ++ Array[Byte](1, 0)), // BOOLERR true
      // FORMULA with cached numeric result 41.5
      (0x0006, u16b(7) ++ u16b(0) ++ u16b(0) ++ {
        val bb = java.nio.ByteBuffer.allocate(8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(41.5)
        bb.array()
      } ++ u16b(0) ++ u32b(0) ++ u16b(0)),
      // FORMULA with cached STRING result
      (0x0006, u16b(8) ++ u16b(0) ++ u16b(0) ++
        Array[Byte](0, 0, 0, 0, 0, 0, -1, -1) ++ u16b(0) ++ u32b(0) ++ u16b(0)),
      (0x0207, u16b(5) ++ Array[Byte](0) ++ "hello".getBytes("ISO-8859-1"))
    )
    val path = tmp(".xls")
    java.nio.file.Files.write(java.nio.file.Path.of(path),
      ExcelLegacy.cfbContainer(ExcelLegacy.biffStream(cells)))
    val got = ExcelLegacy.read(spark, path).collect().map(_.getString(0)).toSeq
    assert(got(0) == "3.75")
    assert(got(1) == "12345")
    assert(got(2) == "-9876.54")
    assert(got(3) == "2.5")
    assert(got(5) == "true")
    assert(got(6) == "41.5")
    assert(got(7) == "hello")
    // MULRK row: col 0 = 7, col 1 = 0.07 — second column only exists there
    val row5 = ExcelLegacy.read(spark, path).collect()(4)
    assert(row5.getString(0) == "7" && row5.getString(1) == "0.07")
  }

  test("property: BIFF cell strings survive the byte round trip exactly") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // unicode-heavy strings (BMP only — BIFF8 is UTF-16 code units; the
    // writer stores raw units, so surrogate PAIRS round-trip too, but
    // unpaired surrogates are not valid strings to begin with)
    val genChar = Gen.frequency(
      (8, Gen.alphaNumChar),
      (2, Gen.oneOf('ü', 'π', '—', '中', '日', '€', '\t')),
      (1, Gen.const(' ')))
    val genStr = Gen.nonEmptyListOf(genChar).map(_.mkString.take(100))
    val prop = Prop.forAll(Gen.nonEmptyListOf(genStr).map(_.take(20))) { vals =>
      val cells = (0x0204, ExcelLegacy.labelBody(0, 0, "h")) +:
        vals.zipWithIndex.map { case (v, i) =>
          (0x0204, ExcelLegacy.labelBody(i + 1, 0, v))
        }
      val path = tmp(".xls")
      java.nio.file.Files.write(java.nio.file.Path.of(path),
        ExcelLegacy.cfbContainer(ExcelLegacy.biffStream(cells)))
      val got = ExcelLegacy.read(spark, path).collect().map(_.getString(0)).toSeq
      got == vals
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, result.status.toString)
  }

  test("corrupt containers refuse loudly — no hangs, no garbage frames") {
    import spark.implicits._
    val good = tmp(".xls")
    ExcelLegacy.write(Seq(("1", "a")).toDF("id", "v"), good)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Path.of(good))
    def expectFailure(mutate: Array[Byte] => Array[Byte]): Unit = {
      val p = tmp(".xls")
      java.nio.file.Files.write(java.nio.file.Path.of(p), mutate(bytes.clone()))
      intercept[Exception](ExcelLegacy.read(spark, p))
    }
    // truncated mid-sector
    expectFailure(b => java.util.Arrays.copyOfRange(b, 0, b.length / 2))
    // FAT chain cycle: point the directory sector's FAT entry at itself
    expectFailure { b =>
      val firstDir = (b(48) & 0xFF) | ((b(49) & 0xFF) << 8)
      val fatOff = 512 + firstDir * 4 // FAT sector 0 starts at byte 512
      b(fatOff) = (firstDir & 0xFF).toByte
      b(fatOff + 1) = ((firstDir >> 8) & 0xFF).toByte
      b(fatOff + 2) = 0; b(fatOff + 3) = 0
      b
    }
    // wrong container version
    expectFailure { b => b(26) = 4; b }
    // magic intact but the directory holds no Workbook stream: blank out
    // the directory sector entirely
    expectFailure { b =>
      val firstDir = (b(48) & 0xFF) | ((b(49) & 0xFF) << 8)
      java.util.Arrays.fill(b, 512 + firstDir * 512, 512 + (firstDir + 1) * 512, 0.toByte)
      b
    }
  }

  test("SST split EXACTLY after a string header: CONTINUE flags byte is not eaten as a char") {
    // real writers split wherever the record fills — including right after
    // cch+flags with ZERO chars emitted; the continuation still re-emits a
    // flags byte, which a naive 'have we read chars yet' test swallows
    def u16b(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def u32b(v: Int) = u16b(v & 0xFFFF) ++ u16b((v >>> 16) & 0xFFFF)
    def rec(typ: Int, body: Array[Byte]) = u16b(typ) ++ u16b(body.length) ++ body
    val sstBody = u32b(1) ++ u32b(1) ++ u16b(5) ++ Array[Byte](0) // header only
    val contBody = Array[Byte](1) ++ // fresh flags: wide
      "hello".getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    val bof5 = rec(0x0809, u16b(0x0600) ++ u16b(0x0005) ++ u16b(0) ++ u16b(0) ++ u32b(0) ++ u32b(0))
    val bof10 = rec(0x0809, u16b(0x0600) ++ u16b(0x0010) ++ u16b(0) ++ u16b(0) ++ u32b(0) ++ u32b(0))
    val eof = rec(0x000A, Array.emptyByteArray)
    val sheet = bof10 ++
      rec(0x00FD, u16b(0) ++ u16b(0) ++ u16b(0) ++ u32b(0)) ++
      rec(0x0204, u16b(1) ++ u16b(0) ++ u16b(0) ++ u16b(1) ++ Array[Byte](0) ++ "r".getBytes("ISO-8859-1")) ++
      eof
    val globalsHead = bof5 ++ rec(0x00FC, sstBody) ++ rec(0x003C, contBody)
    val globals = globalsHead ++
      rec(0x0085, u32b(0) ++ u16b(0) ++ Array[Byte](2, 0) ++ "S1".getBytes("ISO-8859-1")) ++ eof
    val lbOff = globalsHead.length + 4
    val wb = globals ++ sheet
    val pos = globals.length
    wb(lbOff) = (pos & 0xFF).toByte
    wb(lbOff + 1) = ((pos >> 8) & 0xFF).toByte
    val path = tmp(".xls")
    java.nio.file.Files.write(java.nio.file.Path.of(path), ExcelLegacy.cfbContainer(wb))
    val back = ExcelLegacy.read(spark, path)
    assert(back.columns.toSeq == Seq("hello"))
    assert(back.collect().map(_.getString(0)).toSeq == Seq("r"))
  }

  test("SST strings split across CONTINUE records reassemble (LABELSST path)") {
    // build globals with an SST whose single long string splits mid-char
    // stream: SST holds cstTotal/cstUnique + cch/flags + first half of the
    // chars; CONTINUE re-emits a flags byte then the rest
    def u16b(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def u32b(v: Int) = u16b(v & 0xFFFF) ++ u16b((v >>> 16) & 0xFFFF)
    def rec(typ: Int, body: Array[Byte]) = u16b(typ) ++ u16b(body.length) ++ body
    val s = "abcdefghij" * 10 // 100 chars
    val firstHalf = s.substring(0, 40).getBytes("ISO-8859-1")
    val rest = s.substring(40)
    val sstBody = u32b(2) ++ u32b(2) ++
      u16b(s.length) ++ Array[Byte](0) ++ firstHalf
    val contBody = Array[Byte](1) ++ // fresh flags: wide now
      rest.getBytes(java.nio.charset.StandardCharsets.UTF_16LE) ++
      // second SST string entirely inside the CONTINUE
      u16b(3) ++ Array[Byte](0) ++ "two".getBytes("ISO-8859-1")
    val bof5 = rec(0x0809, u16b(0x0600) ++ u16b(0x0005) ++ u16b(0) ++ u16b(0) ++ u32b(0) ++ u32b(0))
    val bof10 = rec(0x0809, u16b(0x0600) ++ u16b(0x0010) ++ u16b(0) ++ u16b(0) ++ u32b(0) ++ u32b(0))
    val eof = rec(0x000A, Array.emptyByteArray)
    val sheet = bof10 ++
      rec(0x00FD, u16b(0) ++ u16b(0) ++ u16b(0) ++ u32b(0)) ++ // header <- sst(0)
      rec(0x00FD, u16b(1) ++ u16b(0) ++ u16b(0) ++ u32b(1)) ++ // row <- sst(1)
      eof
    val globalsHead = bof5 ++ rec(0x00FC, sstBody) ++ rec(0x003C, contBody)
    val bsName = "S1".getBytes("ISO-8859-1")
    val globals = globalsHead ++
      rec(0x0085, u32b(0) ++ u16b(0) ++ Array[Byte](2, 0) ++ bsName) ++ eof
    // fix BOUNDSHEET lbPlyPos: sheet starts right after globals
    val lbOff = globalsHead.length + 4
    val wb = globals ++ sheet
    val pos = globals.length
    wb(lbOff) = (pos & 0xFF).toByte
    wb(lbOff + 1) = ((pos >> 8) & 0xFF).toByte
    wb(lbOff + 2) = ((pos >> 16) & 0xFF).toByte
    wb(lbOff + 3) = ((pos >> 24) & 0xFF).toByte
    val path = tmp(".xls")
    java.nio.file.Files.write(java.nio.file.Path.of(path), ExcelLegacy.cfbContainer(wb))
    val back = ExcelLegacy.read(spark, path)
    assert(back.columns.toSeq == Seq(s)) // the 100-char string is the header
    assert(back.collect().map(_.getString(0)).toSeq == Seq("two"))
  }
}
