package graft.io

import org.apache.spark.sql.DataFrame

/** Bucketed table layout for co-located joins. Both sides of a
  * repeated equi-join (the per-subject analyte stitching, dedup
  * id-joins) written with the SAME bucket count on the SAME key join
  * with ZERO exchanges — the shuffle happens once at write time
  * instead of once per query, which is the difference between an
  * O(queries) and O(1) shuffle bill on a 100 TB store.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. Drops any prior
    * table AND its on-disk location first: with the default in-memory
    * catalog, a previous JVM's warehouse directory survives while its
    * table registration does not, and an orphaned location blocks
    * CREATE TABLE.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val path = new org.apache.hadoop.fs.Path(
      s"${spark.conf.get("spark.sql.warehouse.dir")}/$table")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir
  }

  /** Join two same-bucketed tables on their bucket key — plans a
    * SortMergeJoin with no Exchange on either side.
    */
  def colocatedJoin(
      spark: org.apache.spark.sql.SparkSession,
      leftTable: String,
      rightTable: String,
      key: String,
      how: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), how)
}
