package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level erase for the repo's DERIVED partitioned layouts — the
  * right-to-be-forgotten verb [[NestedStore.erase]] provides for the
  * primary store, generalized to the artifacts that accrete beside it
  * (the binary chunk index, the IVF float and quantized cell layouts,
  * the streaming ingest stores): without this, erasing a document
  * from the store leaves its chunks/codes live, and near-dup or ANN
  * answers RESURRECT deleted content — the exact failure an erase
  * exists to prevent.
  *
  * Mechanics, the [[NestedStore.erase]] discipline applied to an
  * id-keyed layout: one scan finds the affected partition tuples and
  * whether any rows survive in each (the collect is
  * partition-count-sized — config plane); surviving rows of affected
  * partitions rewrite via dynamic partition overwrite (untouched
  * partitions' files are byte-preserved — spec-pinned by listing
  * digest); a partition whose rows ALL matched is deleted at the
  * filesystem level with the Hive-escaped path, and the delete
  * demands success — matched rows must never silently survive.
  *
  * At 100 TB an erase touches exactly the partitions holding the
  * erased ids: for an IVF layout that is the erased vectors' cells,
  * for a streaming store the ingest batches that carried them. `ids`
  * is a (small) id frame; it is collected to a broadcastable IN-set
  * only implicitly via the join — nothing data-sized lands on the
  * driver.
  *
  * Erase on a LIVE streaming layout must be serialized against the
  * loop (run it quiesced): an at-least-once replay of a pre-erase
  * batch would rewrite its partition with the pre-erase content.
  * Same contract as compaction ([[NestedStore.compact]]).
  */
object LayoutErase {

  final case class LayoutEraseStats(partitionsRewritten: Int, partitionsDeleted: Int)

  def eraseByIds(
      spark: SparkSession,
      path: String,
      partCols: Seq[String],
      idCol: String,
      ids: DataFrame): LayoutEraseStats = {
    require(partCols.nonEmpty, "eraseByIds needs at least one partition column")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"eraseByIds: no layout at $path")
    val df = spark.read.option("basePath", path).parquet(path)
    partCols.foreach(c => require(df.columns.contains(c),
      s"eraseByIds: layout at $path has no partition column '$c'"))
    val idSet = ids.select(col(idCol)).distinct().withColumn("__erase", lit(1))
    // one scan: per affected partition, total rows and matched rows —
    // fully-matched partitions need a filesystem delete (dynamic
    // overwrite cannot remove a partition it writes no rows into)
    val perPart = df.join(broadcast(idSet), Seq(idCol), "left")
      .groupBy(partCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__erase").isNotNull, 1L).otherwise(0L)).as("__m"))
      .where(col("__m") > 0)
      .collect()
      .map(r => (partCols.indices.map(r.get), r.getLong(partCols.length) == r.getLong(partCols.length + 1)))
    // null partition keys break both mechanics silently — the
    // NestedStore.erase refusal, verbatim
    require(perPart.forall(_._1.forall(_ != null)),
      s"eraseByIds: matching rows under a NULL partition key at $path — " +
        "null-keyed rows are outside the layout contract; repair the keys first")
    val (emptied, rewrite) = perPart.partition(_._2)
    if (rewrite.nonEmpty) {
      val keep = rewrite.map { case (vals, _) =>
        partCols.zip(vals).map { case (c, v) => col(c) === lit(v) }.reduce(_ && _)
      }.reduce(_ || _)
      df.where(keep)
        .join(broadcast(idSet.select(idCol)), Seq(idCol), "left_anti")
        .write.partitionBy(partCols: _*).mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").parquet(path)
    }
    val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName _
    emptied.foreach { case (vals, _) =>
      val part = new org.apache.hadoop.fs.Path(path + "/" +
        partCols.zip(vals).map { case (c, v) => s"$c=${esc(v.toString)}" }.mkString("/"))
      require(fs.exists(part) && fs.delete(part, true),
        s"eraseByIds: failed to delete fully-matched partition $part — " +
          "matched rows would survive an erase that reported success")
    }
    LayoutEraseStats(rewrite.length, emptied.length)
  }
}
