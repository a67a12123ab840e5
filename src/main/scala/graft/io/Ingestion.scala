package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ingestion path (Data_Ingestion_Python.py): file source → null
  * fill → filename metadata → nest → keyed store. The reference is a
  * one-file-per-invocation Lambda; here each step is a declarative
  * transform so one job ingests any number of files in parallel, and
  * [[graft.streaming.StreamingIngest]] wraps the same transforms as a
  * Structured Streaming flow.
  */
object Ingestion {

  /** S5 file-format source (handling_different_file_formats,
    * Data_Ingestion_Python.py:22-34): CSV with header+inference; SAS
    * has no built-in Spark reader (SURVEY §7.4 #6 — out of scope,
    * pre-convert) and anything else fails loudly like the reference.
    */
  def readFile(spark: SparkSession, path: String): DataFrame =
    path.toLowerCase match {
      case p if p.endsWith(".csv") =>
        spark.read.option("header", "true").option("inferSchema", "false").csv(path)
      case p if p.endsWith(".parquet") => spark.read.parquet(path)
      case p if p.endsWith(".sas7bdat") =>
        throw new UnsupportedOperationException(
          "SAS sources need pre-conversion to parquet/CSV (no built-in Spark reader)")
      case other =>
        throw new IllegalArgumentException(s"We cannot handle this file format! ($other)")
    }

  /** C10 null-fill: the reference's fillna('Null') at ingestion
    * (Data_Ingestion_Python.py:232) — string columns only, matching
    * pandas' object-dtype frames.
    */
  def nullFill(df: DataFrame, value: String = "Null"): DataFrame =
    df.na.fill(value)

  /** C9 filename/header metadata (Data_Ingestion_Python.py:44-99):
    * view id from the file's base name, source timestamp parsed from
    * the name when present, load timestamp at ingestion time. Driven
    * by input_file_name() so it stays correct when one job reads many
    * files.
    */
  def withFileMetadata(df: DataFrame): DataFrame = {
    val fname = regexp_extract(input_file_name(), "([^/]+)$", 1)
    df.withColumn("source_file", fname)
      .withColumn("view_id", regexp_extract(fname, "^([^._]+)", 1))
      .withColumn("source_timestamp", regexp_extract(fname, "_(\\d{8,14})\\.", 1))
      .withColumn("load_timestamp", date_format(current_timestamp(), "yyyyMMddHHmm"))
  }

  /** Full batch ingestion: file → fillna → metadata → nest on the two
    * key columns → partitioned keyed store (the put_item loop
    * replaced by one partitioned parquet write).
    */
  def ingestFile(
      spark: SparkSession,
      path: String,
      k1: String,
      k2: String,
      storeDir: String): Unit = {
    val df = withFileMetadata(nullFill(readFile(spark, path)))
    NestedStore.write(NestedStore.nest(df, k1, k2), storeDir, k1, k2)
  }
}
