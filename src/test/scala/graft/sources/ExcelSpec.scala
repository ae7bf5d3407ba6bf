package graft.sources

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExcelSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory("excel_spec").toString + "/" + name

  test("round-trip: strings (incl. XML specials), numbers, nulls, header") {
    val path = tmp("rt.xlsx")
    val df = Seq(
      (1L, Some("a & <b> \"c\""), Some(10.5)),
      (2L, None, Some(-3.25)),
      (3L, Some("  spaced  "), None)
    ).toDF("id", "note", "amt")
    Excel.write(df, path)
    val back = Excel.read(spark, path)
    assert(back.columns.toSeq == Seq("id", "note", "amt"))
    assert(back.schema.fields.forall(_.dataType.typeName == "string"),
      "reference reads Excel dtype=str; so do we")
    val rows = back.select($"id".cast("long"), $"note", $"amt".cast("double"))
      .as[(Long, Option[String], Option[Double])].collect().toSet
    assert(rows == Set(
      (1L, Some("a & <b> \"c\""), Some(10.5)),
      (2L, None, Some(-3.25)),
      (3L, Some("  spaced  "), None)))
  }

  test("cell reference algebra: A1 ↔ column index, incl. multi-letter") {
    assert(Excel.cellRef(0, 1) == "A1")
    assert(Excel.cellRef(25, 3) == "Z3")
    assert(Excel.cellRef(26, 7) == "AA7")
    assert(Excel.cellRef(27 + 26 * 26, 2) == "AAB2") // 1-based 704 = 1·676 + 1·26 + 2
    for (c <- Seq(0, 1, 25, 26, 51, 700, 16383))
      assert(Excel.colIndex(Excel.cellRef(c, 9)) == c)
  }

  test("reads sharedStrings workbooks (the shape real producers emit)") {
    // Hand-assembled minimal xlsx using the sharedStrings table instead
    // of inline strings — our writer never produces this, real Excel does.
    val path = tmp("shared.xlsx")
    val out = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def part(name: String, body: String): Unit = {
      out.putNextEntry(new java.util.zip.ZipEntry(name)); out.write(body.getBytes("UTF-8")); out.closeEntry()
    }
    part("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
        |<si><t>visit_id</t></si><si><t>status</t></si><si><t>resubmitted</t></si></sst>""".stripMargin)
    part("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="n"><v>42</v></c><c r="B2" t="s"><v>2</v></c></row>
        |<row r="3"><c r="A3"><v>43</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    out.close()
    val back = Excel.read(spark, path)
    assert(back.columns.toSeq == Seq("visit_id", "status"))
    val rows = back.as[(String, Option[String])].collect().toSet
    assert(rows == Set(("42", Some("resubmitted")), ("43", None)),
      "shared-string lookup, bare numeric cells, and ragged rows all read")
  }

  test("write refuses oversize frames instead of silently OOMing the driver") {
    val big = spark.range(0, 50).toDF("x")
    intercept[IllegalArgumentException] { Excel.write(big, tmp("big.xlsx"), maxRows = 10) }
  }
}
