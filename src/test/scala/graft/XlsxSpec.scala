package graft

import graft.io.{ConfigReader, Xlsx}

/** The original reference workbooks (dg_test_*_configuration.xlsx,
  * study_configuration.xlsx) must parse to EXACTLY the specs the
  * transcribed CSV fixtures produce — proving both that the xlsx
  * front-end is faithful and that the fixture transcription was.
  */
class XlsxSpec extends SparkSpec {

  private val refStudy = "/root/reference/study_configuration.xlsx"

  test("colIndex decodes column letters") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("B7") == 1)
    assert(Xlsx.colIndex("Z2") == 25)
    assert(Xlsx.colIndex("AA10") == 26)
    assert(Xlsx.colIndex("AB3") == 27)
  }

  test("workbook sheets read with shared strings and gaps as empty cells") {
    val sheets = Xlsx.sheets("/root/reference/dg_test_last_contact_configuration.xlsx")
    assert(sheets.keySet == Set("GET_DATA", "DF_OPERATIONS"))
    val gd = sheets("GET_DATA")
    assert(gd.head.take(2) == Seq("Object Name", "Data Source"))
    // row 2 of GET_DATA has no Filter cell — the grid pads it empty
    val maps = Xlsx.headerMaps(gd)
    assert(maps.nonEmpty && maps.forall(_.contains("Object Name")))
  }

  test("original reference workbooks parse to the transcribed fixture specs") {
    val fromXlsx = ConfigReader.readStudyXlsx(refStudy)
    val fromCsv = ConfigReader.readStudy(spark, "/root/repo/fixtures/clinical_study")
    assert(fromXlsx.studyCode == fromCsv.studyCode)
    assert(fromXlsx.stitchKey == fromCsv.stitchKey)
    assert(fromXlsx.analytes.map(_.name) == fromCsv.analytes.map(_.name))
    fromXlsx.analytes.zip(fromCsv.analytes).foreach { case (x, c) =>
      assert(x.getData == c.getData, s"analyte ${x.name}: GET_DATA differs")
      assert(x.operations == c.operations, s"analyte ${x.name}: DF_OPERATIONS differs")
      assert(x.decisionTables == c.decisionTables, s"analyte ${x.name}: decision tables differ")
    }
  }
}
