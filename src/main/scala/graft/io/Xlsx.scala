package graft.io

import java.io.ByteArrayInputStream
import java.util.zip.ZipFile

import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Document, Element}

/** Minimal .xlsx reader for the config plane — the reference reads
  * its study/analyte configuration from Excel workbooks
  * (Configurable_ETL_Python.py:22-26 via pandas.read_excel), and this
  * lets the ORIGINAL workbooks drive [[ConfigReader]] without a
  * one-time CSV conversion. Not a general spreadsheet library: it
  * reads cell text (shared strings, inline strings, raw numeric
  * text) from the standard OOXML layout, which is exactly what a
  * worksheet-sized config plane needs. Driver-side only — workbooks
  * are KBs; the data plane never flows through here.
  *
  * Scope notes: default-namespace OOXML (as produced by Excel and
  * every writer we have seen); formulas are read by their cached
  * value; styles/dates are not interpreted (configs are text).
  */
object Xlsx {

  /** Workbooks are untrusted input: parse with DTDs rejected and all
    * external-entity resolution off, so a malicious DOCTYPE can't do
    * XXE file reads or entity-expansion DoS. Well-formed OOXML never
    * carries a DOCTYPE, so nothing legitimate is lost.
    */
  private def secureBuilderFactory(): DocumentBuilderFactory = {
    val f = DocumentBuilderFactory.newInstance()
    f.setFeature(javax.xml.XMLConstants.FEATURE_SECURE_PROCESSING, true)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f
  }

  private def parse(zip: ZipFile, entry: String): Option[Document] =
    Option(zip.getEntry(entry)).map { e =>
      val bytes = zip.getInputStream(e).readAllBytes()
      secureBuilderFactory().newDocumentBuilder()
        .parse(new ByteArrayInputStream(bytes))
    }

  private def elems(doc: Document, tag: String): Seq[Element] = {
    val nl = doc.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  private def childElems(e: Element, tag: String): Seq[Element] = {
    val nl = e.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  private def directChildElems(e: Element, tag: String): Seq[Element] = {
    val nl = e.getChildNodes
    (0 until nl.getLength).map(nl.item(_)).collect {
      case el: Element if el.getTagName == tag => el
    }
  }

  /** Cell text of a CT_Rst string item: one direct <t>, or the <t> of
    * each rich run <r>. Phonetic runs (<rPh><t>furigana</t></rPh>,
    * written by Japanese Excel) are NOT cell text — openpyxl/pandas
    * exclude them, and a descendant-wide <t> walk would concatenate
    * the furigana onto the value and silently break config matching.
    */
  private def tText(e: Element): String = {
    val direct = directChildElems(e, "t").map(_.getTextContent)
    val runs = directChildElems(e, "r")
      .flatMap(directChildElems(_, "t").map(_.getTextContent))
    (direct ++ runs).mkString
  }

  /** "B7" → 0-based column index 1. */
  def colIndex(cellRef: String): Int =
    cellRef.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  /** Sheet name → cell grid (dense rows, "" for gaps), in workbook
    * sheet order.
    */
  def sheets(path: String): ListMap[String, Seq[Seq[String]]] = {
    val zip = new ZipFile(path)
    try {
      val shared: IndexedSeq[String] = parse(zip, "xl/sharedStrings.xml")
        .map(d => elems(d, "si").map(tText).toIndexedSeq)
        .getOrElse(IndexedSeq.empty)

      val rels: Map[String, String] = parse(zip, "xl/_rels/workbook.xml.rels")
        .map(d => elems(d, "Relationship")
          .map(r => r.getAttribute("Id") -> r.getAttribute("Target")).toMap)
        .getOrElse(Map.empty)

      def targetEntry(t: String): String =
        if (t.startsWith("/")) t.drop(1) else s"xl/$t"

      val wb = parse(zip, "xl/workbook.xml")
        .getOrElse(throw new IllegalArgumentException(s"$path: no xl/workbook.xml"))

      val out = elems(wb, "sheet").map { s =>
        val name = s.getAttribute("name")
        val rid = s.getAttribute("r:id")
        val entry = targetEntry(rels.getOrElse(rid,
          throw new IllegalArgumentException(s"$path: sheet '$name' has unresolved $rid")))
        val doc = parse(zip, entry).getOrElse(
          throw new IllegalArgumentException(s"$path: missing $entry"))
        name -> readGrid(doc, shared)
      }
      ListMap(out: _*)
    } finally zip.close()
  }

  private def readGrid(doc: Document, shared: IndexedSeq[String]): Seq[Seq[String]] = {
    val rows = elems(doc, "row").map { r =>
      var nextIdx = 0 // cells without the optional r= ref are sequential
      val cells = childElems(r, "c").map { c =>
        val ref = c.getAttribute("r")
        val idx = if (ref.nonEmpty) colIndex(ref) else nextIdx
        nextIdx = idx + 1
        val v = c.getAttribute("t") match {
          case "s" =>
            val raw = childElems(c, "v").headOption.map(_.getTextContent.trim).getOrElse("")
            if (raw.isEmpty) "" else shared(raw.toInt)
          case "inlineStr" => childElems(c, "is").headOption.map(tText).getOrElse("")
          // "str" (formula cache), "b", "n"/absent: the raw <v> text
          case _ => childElems(c, "v").headOption.map(_.getTextContent).getOrElse("")
        }
        idx -> v
      }
      val width = cells.map(_._1).maxOption.map(_ + 1).getOrElse(0)
      val dense = Array.fill(width)("")
      cells.foreach { case (i, v) => dense(i) = v }
      dense.toSeq
    }
    rows
  }

  /** Header-keyed row maps (first grid row = header), empty cells
    * absent — the same shape [[ConfigReader]] builds from CSV sheets.
    */
  def headerMaps(grid: Seq[Seq[String]]): Seq[Map[String, String]] = grid match {
    case header +: body =>
      body.map { row =>
        header.zipWithIndex.collect {
          case (h, i) if h.nonEmpty && i < row.length && row(i).nonEmpty => h -> row(i)
        }.toMap
      }
    case _ => Nil
  }
}
