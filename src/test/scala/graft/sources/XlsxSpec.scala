package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the offline XLSX reader against the reference's own data
  * files (read-only fixtures — FIXTURES.md §1).
  */
class XlsxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val ref = "/root/reference"

  test("blacklist day 1: serial dates, shared strings, styled-empty rows") {
    val sheet = Xlsx.readSheet(s"$ref/passport_blacklist_01032021.xlsx")
    assert(sheet.header == Vector("date", "passport"))
    assert(sheet.rows.length == 24) // dimension A1:B25 → 24 data rows
    val real = sheet.rows.filter(_.exists(_.isDefined))
    assert(real.length == 7)
    // serial 44256 = 2021-03-01 (epoch 1899-12-30)
    assert(Xlsx.serialToTimestamp(44256.0).toString == "2021-03-01 00:00:00.0")
    assert(real.head(1).contains("9933 106914")) // inner space preserved
    // trailing styled rows are all-null, present, not dropped
    assert(sheet.rows.count(_.forall(_.isEmpty)) == 17)
  }

  test("terminals day 1/2/3: row counts 150/151/150, Cyrillic survives") {
    val d1 = Xlsx.readSheet(s"$ref/terminals_01032021.xlsx")
    val d2 = Xlsx.readSheet(s"$ref/terminals_02032021.xlsx")
    val d3 = Xlsx.readSheet(s"$ref/terminals_03032021.xlsx")
    assert(d1.header == Vector("terminal_id", "terminal_type", "terminal_city", "terminal_address"))
    assert((d1.rows.length, d2.rows.length, d3.rows.length) == (150, 151, 150))
    val cities = d1.rows.flatMap(_(2)).map(_.toString)
    assert(cities.exists(_.exists(c => c >= 'А' && c <= 'я')), "expected Cyrillic city names")
  }

  test("distributed parse of all 6 reference xlsx equals driver-side parse") {
    val paths = Seq(
      s"$ref/terminals_01032021.xlsx", s"$ref/terminals_02032021.xlsx",
      s"$ref/terminals_03032021.xlsx", s"$ref/passport_blacklist_01032021.xlsx",
      s"$ref/passport_blacklist_02032021.xlsx", s"$ref/passport_blacklist_03032021.xlsx")
    val dist = Xlsx.rowsRdd(spark, paths).collect()
      .groupBy(_._1)
      .map { case (p, rows) =>
        p -> Xlsx.Sheet(rows.head._2, rows.map(_._3).toVector)
      }
    assert(dist.keySet == paths.toSet)
    paths.foreach { p =>
      val local = Xlsx.readSheet(p)
      assert(dist(p).header == local.header, s"$p header")
      assert(dist(p).rows == local.rows, s"$p rows") // order preserved per file
    }
  }

  test("first worksheet resolves via workbook rels, not the literal sheet1 name") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val path = java.nio.file.Files.createTempFile("oddsheet", ".xlsx").toString
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    // first (and only) sheet lives in sheet7.xml; no sheet1.xml exists
    put("xl/workbook.xml",
      """<workbook><sheets><sheet name="data" sheetId="1" r:id="rId9"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<Relationships><Relationship Id="rId9" Target="worksheets/sheet7.xml"/></Relationships>""")
    put("xl/worksheets/sheet7.xml",
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><t>k</t></c><c r="B1" t="inlineStr"><t>v</t></c></row>
        |<row r="2"><c r="A2" t="inlineStr"><t>x</t></c><c r="B2"><v>42</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val sheet = Xlsx.readSheet(path)
    assert(sheet.header == Vector("k", "v"))
    assert(sheet.rows == Vector(Vector(Some("x"), Some(42.0))))
  }

  test("blacklist DataFrame conversion yields typed nullable rows") {
    val df = FileSources.blacklistXlsx(spark, s"$ref/passport_blacklist_02032021.xlsx")
    val n = df.count()
    val real = df.filter("passport_num is not null").count()
    assert(real == 15) // cumulative month-to-date, day 2
    assert(n >= real)
    val first = df.filter("passport_num = '9933 106914'").head
    assert(first.getTimestamp(0).toString.startsWith("2021-03-01"))
  }

  test("transactions CSV: decimal comma, second-precision timestamps") {
    val df = FileSources.transactionsCsv(spark, s"$ref/transactions_01032021.txt")
    assert(df.count() == 15650)
    assert(df.schema.fieldNames.toSeq ==
      Seq("trans_id", "trans_date", "amt", "card_num", "oper_type", "oper_result", "terminal"))
    val r = df.filter("trans_id = '43845789347'").head
    assert(r.getAs[java.math.BigDecimal]("amt").compareTo(new java.math.BigDecimal("1046.40")) == 0)
    assert(r.getAs[String]("card_num") == "4513 5880 2369 1799") // inner spaces kept
    assert(r.getTimestamp(1).getNanos == 0)
  }

  test("drop-folder routing implements the documented intent") {
    import DropFolder._
    assert(route("transactions_01032021.txt").contains(Transactions))
    assert(route("transactions_01032021.csv").contains(Transactions))
    assert(route("terminals_01032021.xlsx").contains(Terminals))
    assert(route("passport_blacklist_01032021.xlsx").contains(Blacklist))
    assert(route("readme.md").isEmpty)
    assert(route("terminals_01032021.txt").isEmpty)
    assert(fileDate("transactions_01032021.txt") == java.time.LocalDate.of(2021, 3, 1))
  }
}
