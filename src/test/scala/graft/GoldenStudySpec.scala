package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{ParquetResolver, StudyRunner}
import graft.io.{ConfigReader, NestedStore, Standardized}

/** The reference's de-facto correctness artifacts are its seven real
  * analyte configurations (study_configuration.xlsx General sheet;
  * SURVEY §5). This golden test runs ALL SEVEN, translated verbatim
  * into the CSV control plane (fixtures/clinical_study), against a
  * synthetic clinical-shaped nested store, and pins hand-computed
  * results — end-to-end through ConfigReader, the GET_DATA runner,
  * the interpreter, analyte memoization, stitching, and the
  * standardized sink.
  */
class GoldenStudySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val finalDf: DataFrame = {
    val storeDir = Files.createTempDirectory("graft_clinical").toString

    def writeView(view: String, cols: Seq[String], rows: Seq[Seq[String]]): Unit = {
      val df = spark.createDataFrame(
        sc.parallelize(rows.map(org.apache.spark.sql.Row.fromSeq(_)), 1),
        org.apache.spark.sql.types.StructType(cols.map(c =>
          org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType))))
        .withColumn("study_code", lit("DG001002003")).withColumn("view", lit(view))
      NestedStore.nest(df, "study_code", "view")
        .write.mode("append").partitionBy("study_code", "view").parquet(storeDir)
    }

    writeView("ENROL", Seq("SiteGroup", "SiteNumber"), Seq(
      Seq("US", "101"), Seq("US", "102"), Seq("DE", "201"),
      Seq(null, "301"), Seq("FR", null)))
    writeView("IxRS", Seq("CentreNum", "ECode"), Seq(
      Seq("101", "S001"), Seq("101", "S002"), Seq("102", "S003"),
      Seq("201", "S004"), Seq("201", null)))
    writeView("DS", Seq("Subject", "DSSTDAT", "DSDECOD_STD"), Seq(
      Seq("S001", "10-03-2021 08:00", "C28554"),
      Seq("S003", "20-05-2021 10:00", "C28554"),
      Seq("S002", "15-04-2021 09:00", "C48227")))
    writeView("DEATH", Seq("Subject", "DTH_DAT"), Seq(
      Seq("S003", "18-05-2021 12:00")))
    writeView("SURVIVE", Seq("Subject", "SUR_DAT", "SURSTAT_STD"), Seq(
      Seq("S002", "20-04-2021 00:00", "2"),
      Seq("S004", "01-06-2021 00:00", "2"),
      Seq("S001", "01-01-2021 00:00", "1")))
    writeView("HOSPAD", Seq("Subject", "HADMEDT", "HADMSDT"), Seq(
      Seq("S001", "05-03-2021 10:00", "01-03-2021 10:00")))
    writeView("DOSEDISC", Seq("Subject", "IPDC_DAT", "IP_DISC_STD"), Seq(
      Seq("S002", "10-04-2021 00:00", "1"),
      Seq("S003", "01-05-2021 00:00", "2")))
    writeView("CAPRXHC",
      Seq("Subject", "PageRepeatNumber", "CXSDAT", "CXEDAT", "TREATSTS", "CXAGNT", "CXCLASS", "CXCHERAD"),
      Seq(
        Seq("S001", "1", "2021-02-01", "2021-02-10", "setA", "agent1", "class1", "Yes"),
        Seq("S001", "2", "2021-02-20", "2021-02-25", "setA", "agent2", "class1", "No"),
        Seq("S002", "1", "2021-03-05", "2021-03-06", "setB", "agent1", "class2", "Yes")))
    writeView("EX", Seq("Subject", "EXSTDAT", "EXTRT"), Seq(
      Seq("S001", "2021-02-05", "Carboplatin"),
      Seq("S002", "2021-03-01", "Paclitaxel")))
    writeView("EX1", Seq("Subject", "EXSTDAT", "EXTRT"), Seq(
      Seq("S001", "2021-02-03", "Carboplatin"),
      Seq("S003", "2021-04-01", "Bevacizumab")))
    writeView("DOSEDISC1", Seq("Subject", "IPDC_DAT", "SD"), Seq(
      Seq("S001", "2021-03-15", "Carboplatin"),
      Seq("S002", "2021-04-20", "Paclitaxel")))
    writeView("DOSEDISC2", Seq("Subject", "IPDC_DAT", "SD"), Seq(
      Seq("S003", "2021-05-10", "Bevacizumab")))
    writeView("PFU", Seq("Subject", "PFUTYP_STD", "PFUTYPSE"), Seq(
      Seq("S001", "1", "Yes"), Seq("S002", "4", "Yes"),
      Seq("S003", "2", "No"), Seq("S004", "7", "Yes")))

    val study = ConfigReader.readStudy(spark, "/root/repo/fixtures/clinical_study")
    StudyRunner.run(study, new ParquetResolver(spark, "/unused", Some(storeDir)))
  }

  test("seven-analyte study: final stitched frame matches hand-computed golden rows") {
    val rows = finalDf
      .select("country", "site", "subject", "subject_death", "ltfu_date",
        "last_contact_date", "last_contact_type", "subther_start_date",
        "concomitant", "all_ipdc_date", "pltfu_thresh", "pltfu_thresh_group")
      .orderBy("subject", "subther_start_date")
      .collect()
      .map(r => r.toSeq)

    val expected = Seq(
      Seq("US", 101.0, "S001", ts("2021-03-10 08:00:00"), null,
        ts("2021-03-10 08:00:00"), "Death", ts("2021-02-01 00:00:00"),
        "1", ts("2021-02-01 00:00:00"), "103", "regular"),
      Seq("US", 101.0, "S001", ts("2021-03-10 08:00:00"), null,
        ts("2021-03-10 08:00:00"), "Death", ts("2021-02-20 00:00:00"),
        "0", ts("2021-02-01 00:00:00"), "103", "regular"),
      Seq("US", 101.0, "S002", null, ts("2021-04-15 09:00:00"),
        ts("2021-04-15 09:00:00"), "Lost to follow up", ts("2021-03-05 00:00:00"),
        "1", ts("2021-03-05 00:00:00"), "271", "end of study"),
      Seq("US", 102.0, "S003", ts("2021-05-18 12:00:00"), null,
        ts("2021-05-18 12:00:00"), "Death", null,
        null, ts("2021-05-10 00:00:00"), null, null),
      Seq("DE", 201.0, "S004", null, ts("2021-06-01 00:00:00"),
        ts("2021-06-01 00:00:00"), "Lost to follow up", null,
        null, null, null, null))

    assert(rows.length == expected.length,
      s"row count ${rows.length} != ${expected.length}\n${rows.mkString("\n")}")
    rows.zip(expected).foreach { case (got, want) =>
      assert(got == want, s"\n got: $got\nwant: $want")
    }
  }

  test("standardized sink over the stitched study emits the reference record shape") {
    val std = Standardized.flattenStandardized(
      Standardized.toStandardized(finalDf, "DG001002003"))
    val s4 = std.where(col("subject") === "S004").collect().head
    assert(s4.getAs[String]("study_code") == "DG001002003")
    assert(s4.getAs[String]("subject_hierarchy") == "DE#201.0#S004")
    assert(s4.getAs[String]("subject_death") == "Null")
    assert(s4.getAs[String]("ltfu_date") == "2021-06-01 00:00:00")
    assert(s4.getAs[String]("last_contact_type") == "Lost to follow up")
  }
}
