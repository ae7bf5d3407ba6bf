package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Excel (.xlsx) source/sink — SURVEY.md §2.B4: the reference's sample
  * inputs, checkpoints and recovery lists are Excel-driven
  * (src/run_predictions.py:125-144, src/lch_eligibility.py:471,
  * src/resubmission_recovery.py:432-440), read `dtype=str`.
  *
  * xlsx is a zip of SpreadsheetML parts, so this needs only the JDK
  * (java.util.zip + StAX) — no external library. Scope is deliberately
  * the reference's: a small human-interchange boundary format. Reads
  * happen on the driver (a workbook is one file, inherently
  * single-machine-sized; `maxRows` guards against abuse) and the rows
  * are then distributed; big data belongs in parquet (B2).
  *
  * Fidelity matches pandas `dtype=str`: every cell surfaces as a
  * nullable string column; callers cast (B23 try_cast) downstream.
  * Write emits inline strings / numbers with the first row as header,
  * which round-trips through this reader and opens in spreadsheet
  * apps.
  */
object Excel {

  private val SheetPath = "xl/worksheets/sheet1.xml"

  /** Read sheet1 of an .xlsx as an all-string DataFrame; first row is
    * the header. Empty cells are null.
    */
  def read(spark: SparkSession, path: String, maxRows: Int = 1000000): DataFrame = {
    val zip = new ZipFile(path)
    try {
      val shared = readSharedStrings(zip)
      val rows = readSheet(zip, shared, maxRows)
      require(rows.nonEmpty, s"no rows in $path")
      val header = rows.head.map(h => Option(h).getOrElse(""))
      val width = header.length
      val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
      val data = rows.tail.map { r =>
        Row.fromSeq(r.padTo(width, null).take(width).toIndexedSeq)
      }
      spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
        schema)
    } finally zip.close()
  }

  /** Write `df` (collected to the driver — Excel is a small-file
    * boundary format; `maxRows` fails loudly rather than OOM) as a
    * single-sheet .xlsx with a header row. Numeric columns become
    * number cells, everything else inline strings; nulls are blank.
    *
    * Report formatting matches the reference's openpyxl writer
    * (resubmission_recovery.py:432-440): per-column width = longest
    * cell + 4 capped at 80, and the header row frozen (pane split at
    * A2) — both are worksheet-level XML, so the JDK-only writer needs
    * no styles part.
    */
  def write(df: DataFrame, path: String, maxRows: Int = 1000000): Unit = {
    val schema = df.schema
    val numeric = schema.fields.map(f => f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
    val it = df.limit(maxRows + 1).collect()
    require(it.length <= maxRows, s"refusing to write >$maxRows rows to a single xlsx; use parquet")
    val out = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      def part(name: String, body: String): Unit = {
        out.putNextEntry(new ZipEntry(name))
        out.write(body.getBytes("UTF-8"))
        out.closeEntry()
      }
      part("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin)
      part("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      part("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin)
      part("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)

      // Reference-parity report formatting (schema order matters:
      // sheetViews, then cols, then sheetData). Width unit is Excel's
      // "characters", the same unit openpyxl's column_dimensions uses.
      val colWidths = schema.fieldNames.indices.map { c =>
        val headerLen = schema.fieldNames(c).length
        val maxLen = it.foldLeft(headerLen) { (m, row) =>
          if (row.isNullAt(c)) m else math.max(m, row.get(c).toString.length)
        }
        math.min(maxLen + 4, 80)
      }
      val sheet = new StringBuilder
      sheet ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
      sheet ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">"""
      sheet ++= """<sheetViews><sheetView workbookViewId="0">"""
      sheet ++= """<pane ySplit="1" topLeftCell="A2" activePane="bottomLeft" state="frozen"/>"""
      sheet ++= """</sheetView></sheetViews>"""
      sheet ++= "<cols>"
      colWidths.zipWithIndex.foreach { case (w, c) =>
        sheet ++= s"""<col min="${c + 1}" max="${c + 1}" width="$w" customWidth="1"/>"""
      }
      sheet ++= "</cols><sheetData>"
      def strCell(ref: String, v: String): String =
        s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(v)}</t></is></c>"""
      def numCell(ref: String, v: String): String = s"""<c r="$ref" t="n"><v>$v</v></c>"""
      def rowXml(rowIdx: Int, cells: Seq[String]): Unit = {
        sheet ++= s"""<row r="$rowIdx">"""
        cells.foreach(sheet ++= _)
        sheet ++= "</row>"
      }
      rowXml(1, schema.fieldNames.toIndexedSeq.zipWithIndex.map { case (n, c) =>
        strCell(cellRef(c, 1), n)
      })
      it.zipWithIndex.foreach { case (row, i) =>
        val r = i + 2
        rowXml(r, (0 until schema.length).flatMap { c =>
          if (row.isNullAt(c)) None
          else if (numeric(c)) Some(numCell(cellRef(c, r), row.get(c).toString))
          else Some(strCell(cellRef(c, r), row.get(c).toString))
        })
      }
      sheet ++= "</sheetData></worksheet>"
      part(SheetPath, sheet.toString)
    } finally out.close()
  }

  // ---- internals ----

  /** Characters XML 1.0 cannot carry even escaped (most C0 controls,
    * lone surrogates). Spreadsheet text cells hold arbitrary bytes at
    * corpus scale, so these use the OOXML `_xHHHH_` cell-string
    * encoding — the same convention real Excel writes; literal
    * `_xHHHH_`-looking text escapes its underscore as `_x005F_`.
    */
  private def xmlIllegal(c: Char): Boolean =
    (c < 0x20 && c != '\t' && c != '\n' && c != '\r') || c == 0xFFFE.toChar ||
      c == 0xFFFF.toChar || Character.isSurrogate(c)

  private val ooxmlEscapePattern = java.util.regex.Pattern.compile("_x[0-9A-Fa-f]{4}_")

  private[sources] def encodeCell(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c) && i + 1 < s.length &&
          Character.isLowSurrogate(s.charAt(i + 1))) {
        sb += c += s.charAt(i + 1) // valid pair (emoji etc.) is legal XML
        i += 2
      } else {
        if (xmlIllegal(c)) sb ++= f"_x${c.toInt}%04X_"
        else if (c == '_' && ooxmlEscapePattern.matcher(s).region(i, s.length).lookingAt())
          sb ++= "_x005F_"
        else sb += c
        i += 1
      }
    }
    sb.toString
  }

  private[sources] def decodeCell(s: String): String = {
    if (!s.contains("_x")) return s
    val m = ooxmlEscapePattern.matcher(s)
    val sb = new StringBuilder
    var last = 0
    while (m.find()) {
      sb ++= s.substring(last, m.start())
      sb += Integer.parseInt(s.substring(m.start() + 2, m.end() - 1), 16).toChar
      last = m.end()
    }
    sb ++= s.substring(last)
    sb.toString
  }

  private def xmlEscape(s: String): String =
    encodeCell(s).flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  /** 0-based column + 1-based row → A1-style reference. */
  private[sources] def cellRef(col: Int, row: Int): String = {
    var c = col
    val sb = new StringBuilder
    while (c >= 0) { sb.insert(0, ('A' + c % 26).toChar); c = c / 26 - 1 }
    sb.append(row).toString
  }

  /** A1-style reference → 0-based column index. */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i) - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private def readSharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val entry = zip.getEntry("xl/sharedStrings.xml")
    if (entry == null) return IndexedSeq.empty
    val in = zip.getInputStream(entry)
    try {
      val reader = XMLInputFactory.newInstance().createXMLStreamReader(in)
      val strings = mutable.ArrayBuffer.empty[String]
      val current = new StringBuilder
      var inSi = false
      var inT = false
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            reader.getLocalName match {
              case "si" => inSi = true; current.clear()
              case "t" if inSi => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inT =>
            current ++= reader.getText
          case XMLStreamConstants.END_ELEMENT =>
            reader.getLocalName match {
              case "t" => inT = false
              case "si" => inSi = false; strings += decodeCell(current.toString)
              case _ =>
            }
          case _ =>
        }
      }
      strings.toIndexedSeq
    } finally in.close()
  }

  /** Rows as dense string arrays (null = blank cell), header included. */
  private def readSheet(zip: ZipFile, shared: IndexedSeq[String], maxRows: Int): Seq[Array[String]] = {
    val entry = zip.getEntry(SheetPath)
    require(entry != null, s"$SheetPath missing — not an xlsx workbook?")
    val in = zip.getInputStream(entry)
    try {
      val reader = XMLInputFactory.newInstance().createXMLStreamReader(in)
      val rows = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[(Int, String)]]
      var row: mutable.ArrayBuffer[(Int, String)] = null
      var cellCol = -1
      var cellType = ""
      var inV = false
      var inIsT = false
      val text = new StringBuilder
      var nextAutoCol = 0
      // One row of slack past header + maxRows: reaching it means the
      // sheet is OVER the cap, which must fail loudly below — the old
      // bound returned normally and silently dropped the tail, while
      // the write side refuses loudly at the same cap.
      while (reader.hasNext && rows.length <= maxRows + 1) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            reader.getLocalName match {
              case "row" =>
                row = mutable.ArrayBuffer.empty; nextAutoCol = 0
              case "c" =>
                val ref = reader.getAttributeValue(null, "r")
                cellCol = if (ref != null) colIndex(ref) else nextAutoCol
                nextAutoCol = cellCol + 1
                cellType = Option(reader.getAttributeValue(null, "t")).getOrElse("n")
                text.clear()
              case "v" => inV = true
              case "t" => inIsT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inV || inIsT =>
            text ++= reader.getText
          case XMLStreamConstants.END_ELEMENT =>
            reader.getLocalName match {
              case "v" => inV = false
              case "t" => inIsT = false
              case "c" if row != null =>
                val raw = text.toString
                val value = cellType match {
                  case "s" => raw.toIntOption.flatMap(shared.lift).orNull
                  case _ if raw.isEmpty => null
                  case "inlineStr" | "str" => decodeCell(raw)
                  case _ => raw
                }
                if (value != null) row += ((cellCol, value))
              case "row" =>
                rows += row; row = null
              case _ =>
            }
          case _ =>
        }
      }
      require(rows.length <= maxRows + 1, // header + maxRows data rows
        s"sheet exceeds $maxRows rows — refusing silent truncation; raise maxRows or use parquet")
      rows.map { cells =>
        val width = if (cells.isEmpty) 0 else cells.map(_._1).max + 1
        val arr = new Array[String](width)
        cells.foreach { case (c, v) => if (c < width) arr(c) = v }
        arr
      }.toSeq
    } finally in.close()
  }
}
