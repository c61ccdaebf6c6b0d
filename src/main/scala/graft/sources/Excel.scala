package graft.sources

import java.io.InputStream
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal from-scratch XLSX reader/writer on JDK built-ins (java.util.zip +
  * StAX) — no POI, no external jars.
  *
  * The reference loads Excel through DuckDB's GDAL bridge with forced headers
  * (sql/ingestion/load_excel.sql:1-6) and exports with the xlsx driver
  * (sql/export/to_excel.sql:1). This implementation covers the same surface:
  * first row is the header, every value lands as VARCHAR (the all-string raw
  * ingest philosophy — schema tightening is Coercion's job), and the writer
  * emits a spec-complete single-sheet workbook.
  *
  * Excel workbooks are report-sized by construction (the format caps at ~1M
  * rows and the files are single blobs), so both directions are driver-side
  * like [[Sinks.jsonArray]], with an explicit row guard on write. Reader
  * supports shared strings (`t="s"`), inline strings (`t="inlineStr"`),
  * formula-cached strings (`t="str"`), booleans, and raw numbers; sparse rows
  * null-pad by cell reference.
  */
object Excel {

  private val xif = {
    val f = XMLInputFactory.newInstance()
    // hardening: no DTDs / external entities in workbook parts
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty("javax.xml.stream.isSupportingExternalEntities", false)
    f
  }

  /** Column letters of a cell ref ("BC12" -> 54, 0-based). */
  private[sources] def colIndex(cellRef: String): Int = {
    var i = 0
    var acc = 0
    while (i < cellRef.length && cellRef.charAt(i).isLetter) {
      acc = acc * 26 + (cellRef.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    math.max(acc - 1, 0)
  }

  private def slurp(zip: ZipFile, entry: ZipEntry): InputStream = zip.getInputStream(entry)

  /** Parse xl/sharedStrings.xml: one string per <si>, rich-text runs
    * concatenated. */
  private def sharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val entry = zip.getEntry("xl/sharedStrings.xml")
    if (entry == null) return IndexedSeq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val r = xif.createXMLStreamReader(slurp(zip, entry))
    try {
      val sb = new StringBuilder
      var inSi = false
      var inT = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; sb.clear()
              case "t" if inSi => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inT =>
            sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => inSi = false; out += sb.toString
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.toIndexedSeq
  }

  /** First worksheet part name, via workbook order when resolvable. */
  private def firstSheet(zip: ZipFile): String = {
    import scala.jdk.CollectionConverters._
    val sheets = zip.entries().asScala.map(_.getName)
      .filter(n => n.startsWith("xl/worksheets/") && n.endsWith(".xml"))
      .toSeq.sorted
    require(sheets.nonEmpty, "xlsx contains no worksheets")
    sheets.find(_ == "xl/worksheets/sheet1.xml").getOrElse(sheets.head)
  }

  /** Parse a worksheet into sparse rows of (colIdx -> raw string value). */
  private def parseSheet(zip: ZipFile, part: String,
                         shared: IndexedSeq[String]): Seq[Map[Int, String]] = {
    val r = xif.createXMLStreamReader(slurp(zip, zip.getEntry(part)))
    val rows = scala.collection.mutable.ArrayBuffer.empty[Map[Int, String]]
    try {
      var row = Map.empty[Int, String]
      var cellCol = 0
      var cellType = ""
      var inV = false
      var inIs = false
      var inT = false
      val v = new StringBuilder
      var nextCol = 0
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => row = Map.empty; nextCol = 0
              case "c" =>
                val ref = Option(r.getAttributeValue(null, "r"))
                cellCol = ref.map(colIndex).getOrElse(nextCol)
                nextCol = cellCol + 1
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                v.clear()
              case "v" => inV = true
              case "is" => inIs = true
              case "t" if inIs => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inV || inT =>
            v.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" => inV = false
              case "t" => inT = false
              case "is" => inIs = false
              case "c" =>
                val raw = v.toString
                val value = cellType match {
                  case "s" => shared.lift(raw.trim.toInt).orNull
                  case "b" => if (raw.trim == "1") "true" else "false"
                  case _ => raw // inlineStr/str collected via t or v; numbers raw
                }
                if (value != null && value.nonEmpty) row += (cellCol -> value)
              case "row" => rows += row
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    rows.toSeq
  }

  /** Read the first worksheet as an all-string DataFrame, first row forced to
    * be the header (empty header cells become column<i>). */
  def read(spark: SparkSession, path: String): DataFrame = {
    // dispatch by magic, like the reference's st_read: zip -> xlsx here,
    // OLE2 -> the from-scratch BIFF8 reader
    val magic = {
      val in = new java.io.FileInputStream(path)
      try { val b = new Array[Byte](2); in.read(b); b } finally in.close()
    }
    if (!magic.sameElements(Array[Byte]('P', 'K'))) {
      require(ExcelLegacy.isOle2(path),
        s"$path is neither an XLSX (zip) nor a legacy .xls (OLE2) workbook")
      return ExcelLegacy.read(spark, path)
    }
    val zip = new ZipFile(path)
    try {
      val shared = sharedStrings(zip)
      val rows = parseSheet(zip, firstSheet(zip), shared)
      require(rows.nonEmpty, s"xlsx $path has no rows")
      val width = rows.map(m => if (m.isEmpty) 0 else m.keys.max + 1).max
      val header = (0 until width).map(i =>
        rows.head.get(i).map(_.trim).filter(_.nonEmpty).getOrElse(s"column$i"))
      val data = rows.tail.map(m =>
        Row.fromSeq((0 until width).map(i => m.get(i).orNull)))
      val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(data.toSeq, math.max(1, data.length / 10000)),
        schema)
    } finally zip.close()
  }

  private def xmlEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def colLetters(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) {
      val rem = (n - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  /** Write `df` as a single-sheet xlsx: header row + all values as inline
    * strings (numbers render via Spark's string cast — the all-VARCHAR
    * interchange the reference's ingest expects back). `maxRows` guards the
    * driver-side collect, like [[Sinks.jsonArray]]. */
  def write(df: DataFrame, path: String, maxRows: Int = 100000): Unit = {
    import org.apache.spark.sql.functions.col
    val stringified = df.select(df.columns.map(c => col(c).cast("string").as(c)): _*)
    val rows = stringified.take(maxRows + 1)
    require(rows.length <= maxRows,
      s"xlsx export is for report-sized outputs (> $maxRows rows); use parquet/csv")
    val names = df.columns.toSeq

    def cell(ref: String, value: String): String =
      s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(value)}</t></is></c>"""
    def rowXml(rIdx: Int, values: Seq[String]): String = {
      val cells = values.zipWithIndex.collect {
        case (v, i) if v != null => cell(s"${colLetters(i)}$rIdx", v)
      }
      s"""<row r="$rIdx">${cells.mkString}</row>"""
    }
    val sheetRows = rowXml(1, names) +:
      rows.toSeq.zipWithIndex.map { case (r, i) =>
        rowXml(i + 2, (0 until r.length).map(j => if (r.isNullAt(j)) null else r.getString(j)))
      }
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        s"""<sheetData>${sheetRows.mkString}</sheetData></worksheet>"""
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
        """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val workbookRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        """</Relationships>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>"""
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """</Types>"""

    val out = new java.io.FileOutputStream(path)
    val zos = new ZipOutputStream(out)
    try {
      def put(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", workbookRels)
      put("xl/worksheets/sheet1.xml", sheet)
    } finally { zos.close(); out.close() }
  }

}
