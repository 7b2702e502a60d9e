package graft.sources

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Element, NodeList}
import scala.collection.mutable

/** Minimal offline XLSX reader — the build has no spark-excel dependency
  * (offline coursier, SURVEY §7 "what's hard" #1), and an xlsx file is
  * just a zip of XML: `xl/worksheets/sheet1.xml` for cells,
  * `xl/sharedStrings.xml` for the string pool.
  *
  * Behavior mirrors what `pandas.read_excel` gives the reference
  * (main.py:120,129):
  *  - first row = header;
  *  - shared (`t="s"`), inline (`t="inlineStr"`), boolean and numeric cell
  *    types; rich-text runs concatenated;
  *  - styled-but-empty cells (`<c s="1"/>` with no `<v>`) → null — the
  *    blacklist fixtures carry trailing styled rows that MUST surface as
  *    all-null rows, not be dropped (FIXTURES.md §1.3);
  *  - Excel serial dates convert via the 1899-12-30 epoch
  *    (44256 → 2021-03-01).
  *
  * Single files parse driver-side (≤ a few hundred rows, BASELINE.md);
  * [[rowsRdd]] is the distributed form for the many-files scenario: file
  * paths are partitioned across executors and each file parses where its
  * task runs. An xlsx zip is not splittable, so the FILE is the unit of
  * parallelism — the right granularity, since the drop-folder pattern
  * scales by file count, not file size.
  */
object Xlsx {

  /** A parsed sheet: header names plus data rows of `Option[Any]`
    * (String | Double | Boolean), padded/truncated to header width.
    */
  final case class Sheet(header: Vector[String], rows: Vector[Vector[Option[Any]]])

  /** Distributed parse: one task per file, rows emitted where they are
    * parsed — `parallelize(paths).flatMap(parse)`, nothing funnels
    * through the driver. Each row carries its source path and header so
    * heterogeneous drops can be routed downstream.
    */
  def rowsRdd(spark: org.apache.spark.sql.SparkSession, paths: Seq[String])
      : org.apache.spark.rdd.RDD[(String, Vector[String], Vector[Option[Any]])] =
    spark.sparkContext
      .parallelize(paths, math.max(1, paths.size))
      .flatMap { p =>
        val s = readSheet(p)
        s.rows.map(r => (p, s.header, r))
      }

  def readSheet(path: String): Sheet = {
    val zip = new ZipFile(path)
    try {
      val shared = sharedStrings(zip)
      val sheetEntry = zip.getEntry(firstSheetEntry(zip))
      require(sheetEntry != null, s"$path: no first worksheet entry")
      val doc = parseXml(zip.getInputStream(sheetEntry))
      val rowNodes = doc.getElementsByTagName("row")
      val parsed = (0 until rowNodes.getLength).map { i =>
        rowElement(rowNodes.item(i).asInstanceOf[Element], shared)
      }.toVector
      if (parsed.isEmpty) return Sheet(Vector.empty, Vector.empty)
      val headerCells = parsed.head
      val header = headerCells.map(_.map(_.toString).getOrElse("")).takeWhile(_.nonEmpty)
      val width = header.length
      val rows = parsed.tail.map { r =>
        if (r.length >= width) r.take(width)
        else r ++ Vector.fill(width - r.length)(None)
      }
      Sheet(header, rows)
    } finally zip.close()
  }

  /** Excel serial day → java.sql.Timestamp (UTC midnight + fractional
    * day). Epoch 1899-12-30 = serial 0; 25569 = 1970-01-01.
    */
  def serialToTimestamp(serial: Double): java.sql.Timestamp = {
    val seconds = math.round((serial - 25569.0) * 86400.0)
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(seconds))
  }

  def serialToDate(serial: Double): java.sql.Date = {
    val days = math.floor(serial - 25569.0).toLong
    java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days))
  }

  // ---- internals -------------------------------------------------------

  /** Resolve the FIRST sheet in workbook order via `xl/workbook.xml` +
    * its relationships — workbooks whose first sheet is not literally
    * `sheet1.xml` (reordered or renamed entries) resolve correctly;
    * anything malformed falls back to the conventional name.
    */
  private def firstSheetEntry(zip: ZipFile): String = {
    val default = "xl/worksheets/sheet1.xml"
    val wb = zip.getEntry("xl/workbook.xml")
    val rels = zip.getEntry("xl/_rels/workbook.xml.rels")
    if (wb == null || rels == null) return default
    try {
      val sheets = parseXml(zip.getInputStream(wb)).getElementsByTagName("sheet")
      if (sheets.getLength == 0) return default
      val rid = sheets.item(0).asInstanceOf[Element].getAttribute("r:id")
      val rs = parseXml(zip.getInputStream(rels)).getElementsByTagName("Relationship")
      (0 until rs.getLength).map(rs.item(_).asInstanceOf[Element])
        .find(_.getAttribute("Id") == rid)
        .map(_.getAttribute("Target"))
        .map(t => if (t.startsWith("/")) t.stripPrefix("/") else "xl/" + t)
        .filter(zip.getEntry(_) != null)
        .getOrElse(default)
    } catch { case _: Exception => default }
  }

  private def parseXml(in: InputStream) = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(in)
  }

  private def sharedStrings(zip: ZipFile): Vector[String] = {
    val e = zip.getEntry("xl/sharedStrings.xml")
    if (e == null) return Vector.empty
    val doc = parseXml(zip.getInputStream(e))
    val sis = doc.getElementsByTagName("si")
    (0 until sis.getLength).map { i =>
      // concat every <t> under the <si> (plain or rich-text runs)
      val ts = sis.item(i).asInstanceOf[Element].getElementsByTagName("t")
      (0 until ts.getLength).map(j => ts.item(j).getTextContent).mkString
    }.toVector
  }

  /** "B12" → 1 (zero-based column index). */
  private def colIndex(ref: String): Int = {
    var idx = 0
    var i = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      idx = idx * 26 + (ref.charAt(i) - 'A' + 1)
      i += 1
    }
    idx - 1
  }

  private def rowElement(row: Element, shared: Vector[String]): Vector[Option[Any]] = {
    val cells = row.getElementsByTagName("c")
    val out = mutable.ArrayBuffer[Option[Any]]()
    (0 until cells.getLength).foreach { i =>
      val c = cells.item(i).asInstanceOf[Element]
      val at = Option(c.getAttribute("r")).filter(_.nonEmpty).map(colIndex).getOrElse(out.length)
      while (out.length < at) out += None // gap cells are absent from XML
      val t = c.getAttribute("t")
      val v: Option[Any] = t match {
        case "s" => firstChildText(c, "v").map(s => shared(s.trim.toInt))
        case "inlineStr" => firstChildText(c, "t")
        case "str" => firstChildText(c, "v")
        case "b" => firstChildText(c, "v").map(_.trim == "1")
        case _ => firstChildText(c, "v").map(_.trim.toDouble) // numeric / dates
      }
      while (out.length <= at) out += None
      out(at) = v
    }
    out.toVector
  }

  private def firstChildText(c: Element, tag: String): Option[String] = {
    val nodes: NodeList = c.getElementsByTagName(tag)
    if (nodes.getLength == 0) None else Some(nodes.item(0).getTextContent)
  }
}
