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

  private lazy val finalDf: DataFrame = graft.io.ClinicalDemo.run(
    spark, Files.createTempDirectory("graft_clinical").toString)

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

  test("buildStore is idempotent: a rebuild replaces the study, never duplicates it") {
    val dir = Files.createTempDirectory("graft_clinical_idem").toString
    graft.io.ClinicalDemo.buildStore(spark, dir)
    val once = spark.read.parquet(dir).count()
    graft.io.ClinicalDemo.buildStore(spark, dir)
    val twice = spark.read.parquet(dir).count()
    // append-on-rebuild would double every view's documents and break
    // the literal VALUES oracle of the pipeline query
    assert(twice == once, s"rebuild changed document count: $once -> $twice")
  }

  test("the ORIGINAL reference workbooks drive the study to the identical result") {
    val fromXlsx = graft.io.ClinicalDemo.runFromWorkbooks(
      spark, Files.createTempDirectory("graft_clinical_xlsx").toString)
      .orderBy("subject", "subther_start_date").collect().map(_.toSeq)
    val fromCsv = finalDf
      .orderBy("subject", "subther_start_date").collect().map(_.toSeq)
    assert(fromXlsx.toSeq == fromCsv.toSeq)
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
