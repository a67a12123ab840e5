package graft.io

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}

import graft.model._
import graft.parse.KvList

/** S4 config reader: the pipeline-spec control plane
  * (read_config / read_study_config / read_config_sheet,
  * Configurable_ETL_Python.py:22-26, 606-612). The reference reads
  * Excel workbooks from S3; we read a directory of CSV "sheets" with
  * the SAME columns (SURVEY §7.1 sanctions the swap — the fields, not
  * the file format, are the contract):
  *
  * {{{
  * <studyDir>/study.csv                     — study_code,Analyte,Config
  * <studyDir>/<Config>/GET_DATA.csv         — Object Name,Data Source,study_code,View,Column,Filter,Distinct
  * <studyDir>/<Config>/DF_OPERATIONS.csv    — Object Name,Type,Data Frames,Condition
  * <studyDir>/<Config>/tables/<NAME>.csv    — decision tables (lookup col + 'output')
  * }}}
  *
  * Spark's CSV reader handles the quoting (cells legitimately contain
  * commas — column lists, conditions); specs are worksheet-sized so
  * collecting them driver-side IS the config plane, not a data path.
  */
object ConfigReader {

  private def readSheet(spark: SparkSession, path: String): Seq[Map[String, String]] = {
    val df = spark.read.option("header", "true").csv(path)
    val cols = df.columns
    df.collect().toSeq.map { (r: Row) =>
      cols.zipWithIndex.collect {
        case (c, i) if !r.isNullAt(i) => c -> r.getString(i)
      }.toMap
    }
  }

  private def get(row: Map[String, String], key: String): Option[String] =
    row.get(key).map(_.trim).filter(_.nonEmpty)

  def readGetData(spark: SparkSession, path: String): Seq[GetDataSpec] =
    getDataFromRows(readSheet(spark, path))

  private def getDataFromRows(rows: Seq[Map[String, String]]): Seq[GetDataSpec] =
    rows.map { r =>
      val objName = get(r, "Object Name").getOrElse(
        throw new IllegalArgumentException(s"GET_DATA row without Object Name: $r"))
      val view = get(r, "View").getOrElse(objName)
      val source = get(r, "Data Source").map(_.toLowerCase) match {
        case Some("analyte") => SourceKind.AnalyteRef
        case Some("parquet") => SourceKind.ParquetTable(view)
        case _ => SourceKind.StoreView(get(r, "study_code").getOrElse(""), view)
      }
      // store rows bind by View, analyte refs by Object Name —
      // mirroring globals()[View] at :447 vs :442-444.
      val bindName = source match {
        case SourceKind.AnalyteRef => objName
        case _ => view
      }
      GetDataSpec(
        objectName = bindName,
        source = source,
        columns = get(r, "Column").map(KvList.csv).getOrElse(Nil),
        filter = get(r, "Filter"),
        distinct = get(r, "Distinct").exists(_.equalsIgnoreCase("Y")))
    }

  def readOperations(spark: SparkSession, path: String): Seq[OperationSpec] =
    operationsFromRows(readSheet(spark, path))

  private def operationsFromRows(rows: Seq[Map[String, String]]): Seq[OperationSpec] =
    rows.map { r =>
      OperationSpec(
        objectName = get(r, "Object Name").getOrElse(""),
        opType = get(r, "Type").getOrElse(""),
        frames = get(r, "Data Frames").map(KvList.csv).getOrElse(Nil),
        condition = get(r, "Condition").getOrElse(""))
    }

  def readDecisionTable(spark: SparkSession, path: String, name: String): DecisionTable = {
    val df = spark.read.option("header", "true").csv(path)
    val lookupCol = df.columns.head
    val mapping = df.collect().toSeq.map { r =>
      (Option(r.getAs[String](lookupCol)).getOrElse(""),
       Option(r.getAs[String]("output")).getOrElse(""))
    }
    DecisionTable(name, mapping)
  }

  /** Read one analyte's config directory (the per-analyte workbook). */
  def readAnalyte(spark: SparkSession, name: String, configDir: String): AnalyteSpec = {
    val tablesDir = Paths.get(configDir, "tables")
    val tables: Map[String, DecisionTable] =
      if (Files.isDirectory(tablesDir)) {
        // Files.list holds an open directory descriptor until closed —
        // a long-lived driver reading many configs would leak one fd
        // per call without the Using wrapper
        scala.util.Using.resource(Files.list(tablesDir)) { stream =>
          stream.iterator().asScala
            .filter(_.toString.endsWith(".csv"))
            .map { p =>
              val n = p.getFileName.toString.stripSuffix(".csv")
              n -> readDecisionTable(spark, p.toString, n)
            }.toMap
        }
      } else Map.empty
    AnalyteSpec(
      name = name,
      getData = readGetData(spark, s"$configDir/GET_DATA.csv"),
      operations = readOperations(spark, s"$configDir/DF_OPERATIONS.csv"),
      decisionTables = tables)
  }

  // ===== original-workbook front-end (S4 in its native format) =====

  /** Read one analyte's ORIGINAL .xlsx workbook: GET_DATA +
    * DF_OPERATIONS sheets, every other sheet a decision table (first
    * column = lookup values, 'output' column = result) — the layout
    * of the reference's dg_test_*_configuration.xlsx workbooks.
    */
  def readAnalyteXlsx(name: String, workbookPath: String): AnalyteSpec = {
    val sheets = Xlsx.sheets(workbookPath)
    def sheet(n: String): Seq[Map[String, String]] =
      Xlsx.headerMaps(sheets.getOrElse(n,
        throw new IllegalArgumentException(s"$workbookPath: no sheet '$n'")))
    val tables = (sheets.keySet -- Set("GET_DATA", "DF_OPERATIONS")).flatMap { tn =>
      val grid = sheets(tn)
      // a leftover blank sheet (Excel's default empty 'Sheet1') is not
      // a decision table — skip it instead of dying on grid.head; a
      // NON-blank sheet without an 'output' column still fails loudly
      if (grid.isEmpty || grid.forall(_.forall(_.isEmpty))) None
      else {
        val header = grid.head
        val outIdx = header.indexOf("output")
        require(outIdx >= 0, s"$workbookPath: decision sheet '$tn' has no 'output' column")
        val mapping = grid.tail.map(row =>
          (row.headOption.getOrElse(""), if (outIdx < row.length) row(outIdx) else ""))
        Some(tn -> DecisionTable(tn, mapping))
      }
    }.toMap
    AnalyteSpec(
      name = name,
      getData = getDataFromRows(sheet("GET_DATA")),
      operations = operationsFromRows(sheet("DF_OPERATIONS")),
      decisionTables = tables)
  }

  /** Read a study from the ORIGINAL study_configuration.xlsx: rows of
    * (study_code, Analyte, Config), each Config naming an analyte
    * workbook next to the study workbook.
    */
  def readStudyXlsx(studyXlsxPath: String): StudySpec = {
    val dir = java.nio.file.Paths.get(studyXlsxPath).toAbsolutePath.getParent
    val rows = Xlsx.headerMaps(Xlsx.sheets(studyXlsxPath).values.headOption.getOrElse(
      throw new IllegalArgumentException(s"$studyXlsxPath: workbook has no sheets")))
    require(rows.nonEmpty, s"empty study sheet in $studyXlsxPath")
    val studyCode = rows.head.getOrElse("study_code", "")
    val stitchKey = rows.head.get("stitch_key").map(_.trim).filter(_.nonEmpty).getOrElse("subject")
    val analytes = rows.map { r =>
      val name = get(r, "Analyte").getOrElse(
        throw new IllegalArgumentException(s"study sheet row without Analyte: $r"))
      val wb = get(r, "Config").getOrElse(
        throw new IllegalArgumentException(s"study sheet row without Config: $r"))
      readAnalyteXlsx(name, dir.resolve(wb).toString)
    }
    StudySpec(studyCode, analytes, stitchKey)
  }

  /** Read the whole study: study.csv rows in order, each naming its
    * analyte config subdirectory (read_study_config + process_study's
    * per-row derive, :589-612).
    */
  def readStudy(spark: SparkSession, studyDir: String): StudySpec = {
    val rows = readSheet(spark, s"$studyDir/study.csv")
    require(rows.nonEmpty, s"empty study.csv in $studyDir")
    val studyCode = rows.head.getOrElse("study_code", "")
    // optional stitch_key column — the reference hard-codes 'subject'
    // (process_study join at :600); configs with other key names set it.
    val stitchKey = rows.head.get("stitch_key").map(_.trim).filter(_.nonEmpty).getOrElse("subject")
    val analytes = rows.map { r =>
      val name = get(r, "Analyte").getOrElse(
        throw new IllegalArgumentException(s"study.csv row without Analyte: $r"))
      val cfg = get(r, "Config").getOrElse(name)
      readAnalyte(spark, name, s"$studyDir/$cfg")
    }
    StudySpec(studyCode, analytes, stitchKey)
  }
}
