package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The nested (study_code, view, data) document layout — the Spark
  * re-expression of the reference's DynamoDB "AllSources" table
  * (Data_Ingestion_Python.py:101-194; Configurable_ETL_Python.py:30-41
  * reads it back). `data` is an array<struct> column; on disk the
  * dataset is partitioned by the two keys so a keyed read is a
  * partition-pruned scan — the lake analogue of a DynamoDB Query.
  */
object NestedStore {

  /** A4 ingestion nest-agg (final_dataframe_creation,
    * Data_Ingestion_Python.py:101-109): group by the two key columns,
    * collect every remaining column into an array of per-row structs.
    * The array is sorted (R4 pre-nest sort, :243 etc.) so document
    * contents are deterministic regardless of partitioning.
    */
  def nest(df: DataFrame, k1: String, k2: String, dataCol: String = "data"): DataFrame = {
    val payload = df.columns.filterNot(c => c == k1 || c == k2)
    require(payload.nonEmpty, "nothing to nest — all columns are keys")
    df.groupBy(col(k1), col(k2))
      .agg(sort_array(collect_list(struct(payload.map(col): _*))).as(dataCol))
  }

  /** S1/S8 flatten ("json_normalize"): explode the data array back to
    * rows, keeping the key columns (Configurable_ETL_Python.py:36-41,
    * Athena_DynamoDB_Normalized.py:49-60).
    */
  def flatten(df: DataFrame, dataCol: String = "data"): DataFrame = {
    val keys = df.columns.filterNot(_ == dataCol).map(col)
    df.select(keys :+ explode(col(dataCol)).as("__r"): _*)
      .select(keys :+ col("__r.*"): _*)
  }

  /** Write the nested layout partitioned by the two keys — partition
    * pruning then serves keyed reads without touching other views'
    * files (SURVEY §4 "partition pruning by key").
    */
  def write(df: DataFrame, path: String, k1: String = "study_code", k2: String = "view"): Unit =
    df.write.mode("overwrite").partitionBy(k1, k2).parquet(path)

  /** S6 keyed upsert — the reference sink's real semantics: one
    * `put_item` per `(study_code, view)` key replaces that key's
    * document and leaves every other key untouched
    * (Configurable_ETL_Python.py:569-578). The lake analogue is
    * dynamic partition overwrite: only the `(k1, k2)` partitions
    * present in `df` are rewritten; files under every other partition
    * directory are not touched (asserted by listing digest in IoSpec).
    * The mode is scoped to this one write via the writer option, not
    * session conf, so callers' overwrite semantics are unaffected.
    *
    * At 100 TB this is the difference between an incremental study
    * refresh rewriting one study's directories and rewriting the
    * whole store — [[write]] remains the initial-load/full-rebuild
    * path, `upsert` the steady-state one.
    */
  def upsert(df: DataFrame, path: String, k1: String = "study_code", k2: String = "view"): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(k1, k2).parquet(path)

  final case class EraseStats(partitionsRewritten: Int, partitionsDropped: Int)

  /** The store's `(k1, k2)` partition directories grouped by VIEW
    * (k2 value) — the schema-safe read unit. Payload schemas are
    * heterogeneous BETWEEN views (the store contract,
    * [[graft.engine.Engine]]): a whole-store `spark.read.parquet`
    * samples ONE file's footer and silently mis-decodes every other
    * view's `data` struct (dropped fields read as absent), which is
    * catastrophic for [[erase]]/[[compact]] because both REWRITE what
    * they read. Within one view, `mergeSchema` reconciles appended
    * schema evolution loudly and correctly. Directory listing is
    * partition-count-sized (config-plane, the documented allowance).
    */
  private def viewDirs(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      k1: String,
      k2: String): Map[String, Seq[String]] =
    fs.listStatus(root).filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$k1="))
      .flatMap(d => fs.listStatus(d.getPath)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$k2=")))
      .groupBy(_.getPath.getName)
      .view.mapValues(_.map(_.getPath.toString).toSeq).toMap

  /** True iff `predicate` analyzes against `df` (probed by ANALYZING
    * a trial filter — no job runs). ONLY an unresolved
    * column/field reads as "this view lacks the field — skip it"; any
    * other analysis failure (e.g. a type mismatch on a field that
    * EXISTS) rethrows, because skipping a view over it would let
    * matching rows silently survive a compliance [[erase]] that
    * reported success.
    */
  private def resolvesAgainst(df: DataFrame, predicate: Column): Boolean =
    try { df.where(predicate).queryExecution.analyzed; true }
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if Option(e.getCondition).exists(c =>
            c.startsWith("UNRESOLVED_COLUMN") || c.startsWith("UNRESOLVED_FIELD") ||
              c.startsWith("FIELD_NOT_FOUND")) => false
    }

  /** Row-level erase across the store — the right-to-be-forgotten
    * verb ([[upsert]]'s destructive complement): delete every
    * flattened row matching `predicate` (evaluated against the
    * [[flatten]]ed shape, so nested payload fields are addressable),
    * leaving all other data byte-untouched.
    *
    * Mechanics: one scan finds the affected `(k1, k2)` partitions and
    * whether any rows survive in each (partition-pruned when the
    * predicate constrains the keys); survivors are re-nested and
    * written via dynamic partition overwrite — only affected
    * partitions rewrite, untouched partitions' files are preserved
    * (pinned by listing digest in IoSpec). A partition whose rows ALL
    * matched is deleted at the filesystem level: dynamic overwrite
    * cannot remove a partition it writes no rows into, so an emptied
    * document would otherwise silently survive — the one failure mode
    * an erasure audit cannot accept.
    *
    * The collected key list is partition-count-sized (config-plane,
    * same documented allowance as [[compact]]/ConfigReader). At
    * 100 TB an erase touches exactly the partitions holding matches;
    * cost is the discovery scan plus a rewrite of those documents.
    * Emptied-partition paths are rebuilt with the same Hive escaping
    * the parquet writer applied (`/`, `%`, space round-trip through
    * ExternalCatalogUtils.escapePathName), and the delete demands
    * success — matched rows can't silently survive behind an escaped
    * directory name.
    */
  def erase(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      predicate: Column,
      k1: String = "study_code",
      k2: String = "view"): EraseStats = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val byView = viewDirs(fs, root, k1, k2)
    require(byView.nonEmpty, s"erase: no $k1=*/$k2=* partitions under $path")
    var resolvedAnywhere = false
    var rewritten = 0
    var dropped = 0
    byView.foreach { case (_, dirs) =>
      // one read PER VIEW (schema-safe — see [[viewDirs]]); basePath
      // restores the partition key columns
      val flat = flatten(spark.read
        .option("basePath", path).option("mergeSchema", "true")
        .parquet(dirs: _*))
      // a predicate naming fields this view's payload lacks matches
      // NOTHING here (the field is undefined for these documents) —
      // skip rather than fail, but demand it resolves SOMEWHERE so a
      // typo'd column cannot read as a successful no-op erase
      if (resolvesAgainst(flat, predicate)) {
        resolvedAnywhere = true
        val perPart = flat
          .groupBy(col(k1), col(k2))
          .agg(count(lit(1)).as("__n"),
            sum(when(predicate, 1L).otherwise(0L)).as("__m"))
          .where(col("__m") > 0)
          .collect().map(r => (r.get(0), r.get(1), r.getLong(2) == r.getLong(3)))
        // null-keyed partitions (__HIVE_DEFAULT_PARTITION__) break BOTH
        // erase mechanics silently: `col === null` excludes the rows
        // from the rewrite and the interpolated delete path doesn't
        // exist — matched rows would SURVIVE while EraseStats reports
        // success. Refuse loudly instead of retaining data a
        // compliance erase was told to remove.
        require(perPart.forall(p => p._1 != null && p._2 != null),
          s"erase: matching rows found under a NULL $k1/$k2 partition key — " +
            "null-keyed documents are outside the store's key contract and " +
            "cannot be erased by partition; repair the store keys first")
        val (emptied, rewrite) = perPart.partition(_._3)
        if (rewrite.nonEmpty) {
          val keep = rewrite.map { case (a, b, _) => col(k1) === a && col(k2) === b }
            .reduce(_ || _)
          // erase only rows where the predicate is definitively TRUE —
          // a null-valued predicate must KEEP the row (matching __m
          // above), not silently drop it through three-valued !null
          upsert(nest(flat.where(keep && not(coalesce(predicate, lit(false)))), k1, k2),
            path, k1, k2)
        }
        emptied.foreach { case (a, b, _) =>
          // the dir name is the Hive-ESCAPED value (the scan unescaped
          // it into the key column), and a delete that returns false
          // leaves the matched rows on disk while EraseStats reports
          // them dropped — the silent survival this function's doc
          // calls unacceptable. Escape back and demand success.
          val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .escapePathName _
          val part = new org.apache.hadoop.fs.Path(
            s"$path/$k1=${esc(a.toString)}/$k2=${esc(b.toString)}")
          require(fs.exists(part) && fs.delete(part, true),
            s"erase: failed to delete fully-matched partition $part — " +
              "matched rows would survive an erase that reported success")
        }
        rewritten += rewrite.length
        dropped += emptied.length
      }
    }
    require(resolvedAnywhere,
      s"erase: predicate $predicate resolves in NO view's schema — " +
        "refusing to report a no-op erase for what is likely a typo")
    EraseStats(rewritten, dropped)
  }

  final case class CompactionStats(filesBefore: Int, filesAfter: Int)

  /** Compact a partitioned store's small files: every micro-batch
    * append (streaming ingest, S9 parquet-append) adds a file per
    * touched partition, and at 100 TB/day the store degrades into
    * millions of KB-sized files whose open cost dominates scans. One
    * hash repartition on the partition keys rewrites each directory
    * as a single file (plus `maxRecordsPerFile` splits for genuinely
    * large partitions), preserving the partition layout and every row.
    *
    * The rewrite stages to a sibling temp directory and swaps via two
    * FileSystem renames — readers racing the swap window can observe
    * a missing directory; a real deployment serializes compaction
    * against readers with a manifest or table format (Iceberg/Delta),
    * which is out of scope here and called out in SCALE.md. (Spark
    * refuses a direct self-overwrite — the plan would read the path
    * it is clobbering.)
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      keys: Seq[String] = Seq("study_code", "view"),
      maxRecordsPerFile: Long = 1000000L): CompactionStats = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: org.apache.hadoop.fs.Path): Int = {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    // derive siblings from the NORMALIZED path — raw concatenation on
    // a trailing-slash input would nest them INSIDE the store, and the
    // stage-out rename (a dir into its own subdir) would then fail
    // after the per-view loop had already written a full copy there
    val tmp = new org.apache.hadoop.fs.Path(
      hadoopPath.getParent, hadoopPath.getName + "__compacting")
    val old = new org.apache.hadoop.fs.Path(
      hadoopPath.getParent, hadoopPath.getName + "__precompact")
    // Crash-window recovery (same two-rename discipline as
    // ivmStateStream): death between the stage-out and swap-in renames
    // leaves the data ONLY at __precompact. Restore it BEFORE the
    // leftover cleanup below — deleting `old` first would destroy the
    // sole copy, and the re-run would then fail on the missing root.
    if (fs.exists(old) && !fs.exists(hadoopPath))
      require(fs.rename(old, hadoopPath),
        s"compact: could not restore staged-out store from $old")
    val before = dataFiles(hadoopPath)
    fs.delete(tmp, true); fs.delete(old, true)
    // compact PER VIEW, not via one whole-store read: payload schemas
    // are heterogeneous between views, and a single read would sample
    // one footer and rewrite every other view's documents mis-decoded
    // (see [[viewDirs]]). Appends into tmp compose because each view
    // writes disjoint partition directories.
    require(keys.length == 2, s"compact expects the two store keys, got $keys")
    val byView = viewDirs(fs, hadoopPath, keys.head, keys(1))
    require(byView.nonEmpty, s"compact: no ${keys.head}=*/${keys(1)}=* partitions under $path")
    byView.foreach { case (_, dirs) =>
      spark.read
        .option("basePath", path).option("mergeSchema", "true")
        .parquet(dirs: _*)
        .repartition(keys.map(col): _*)
        .write.mode("append")
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .partitionBy(keys: _*).parquet(tmp.toString)
    }
    require(fs.rename(hadoopPath, old), s"compact: could not stage out $path")
    // if the swap-in fails after the stage-out succeeded, roll the old
    // directory back — otherwise the store vanishes for every reader
    // until manual repair
    if (!fs.rename(tmp, hadoopPath)) {
      val restored = fs.rename(old, hadoopPath)
      throw new IllegalStateException(
        s"compact: could not swap in $tmp" +
          (if (restored) s" (original restored at $path)"
           else s" (ROLLBACK FAILED — data is at $old)"))
    }
    fs.delete(old, true)
    CompactionStats(before, dataFiles(hadoopPath))
  }
}

/** S7: the standardized output contract
  * (converting_standardized_form, Configurable_ETL_Python.py:537-578).
  */
object Standardized {

  /** The six nested Retention fields (Configurable_ETL_Python.py:19). */
  val RetentionList: Seq[String] = Seq(
    "subject_death", "ltfu_date", "last_contact_date",
    "last_contact_type", "subther_start_date", "all_ipdc_date")

  /** Null→'Null' strings, all-string cast, studycode column,
    * subject_hierarchy = country#site#subject, and the retention
    * fields nested into a map — one declarative select instead of the
    * reference's per-row record builder + put_item loop (:561-578).
    * Retention columns missing from the frame are emitted as 'Null',
    * matching json_normalize's forgiving reads.
    */
  def toStandardized(df: DataFrame, studyCode: String, retention: Seq[String] = RetentionList): DataFrame = {
    val have = df.columns.toSet
    // pandas astype('string') renders booleans 'True'/'False'; Spark's
    // string cast gives 'true'/'false' — map them so a boolean carried
    // into the standardized records matches the reference byte-for-byte
    def asStr(c: String): Column = df.schema(c).dataType match {
      case org.apache.spark.sql.types.BooleanType =>
        when(col(c), "True").when(!col(c), "False").as(c)
      case _ => col(c).cast("string").as(c)
    }
    val asStrings = df.select(df.columns.map(asStr): _*)
      .na.fill("Null")
    val retEntries: Seq[Column] = retention.flatMap(f =>
      Seq(lit(f), if (have.contains(f)) coalesce(col(f), lit("Null")) else lit("Null")))
    asStrings.select(
      lit(studyCode).as("study_code"),
      concat_ws("#", col("country"), col("site"), col("subject")).as("subject_hierarchy"),
      col("country"), col("site"), col("subject"),
      map(retEntries: _*).as("Retention"))
  }

  /** Inverse for verification/export: un-nest Retention back to flat
    * string columns.
    */
  def flattenStandardized(df: DataFrame, retention: Seq[String] = RetentionList): DataFrame =
    df.select(
      Seq(col("study_code"), col("subject_hierarchy"), col("country"), col("site"), col("subject")) ++
        retention.map(f => col("Retention").getItem(f).as(f)): _*)
}

/** S8/S9/S10: the export/normalization path
  * (Athena_DynamoDB_Normalized.py:30-81).
  */
object Export {

  /** Flatten the nested store, cast everything to string, and apply
    * the case-collision renames (SUBJECT→Subject_SAS, Visit→
    * Visit_ecoA — Athena_DynamoDB_Normalized.py:70-73; they matter in
    * Spark too: SQL name resolution is case-insensitive by default).
    */
  def exportFlatten(nested: DataFrame): DataFrame = {
    val flat = NestedStore.flatten(nested)
    val strung = flat.select(flat.columns.map(c => col(c).cast("string").as(c)): _*)
    val renames = Seq("SUBJECT" -> "Subject_SAS", "Visit" -> "Visit_ecoA")
    renames.foldLeft(strung) { case (d, (o, n)) =>
      if (d.columns.contains(o)) d.withColumnRenamed(o, n) else d
    }
  }

  /** S9 parquet dataset sink: append — the lake analogue of the
    * reference's schema_evolution=True Glue write
    * (Athena_DynamoDB_Normalized.py:30-47). NOTE: parquet schema
    * evolution is a READ-side affair — appended files keep their own
    * footers, and readers reconcile them by passing
    * `mergeSchema=true` at read time (as the s9 gate query does);
    * `mergeSchema` is NOT a write option, so none is set here.
    */
  def writeParquetAppend(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** S10 CSV sink (Athena_DynamoDB_Normalized.py:15-28). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** ORC dataset sink — the columnar format Hive-lineage estates
    * standardize on; Spark's native ORC source gives it the same
    * column pruning and predicate pushdown as parquet (spec-pinned
    * in IoSpec). No reference analogue (the reference writes
    * parquet/CSV only); part of widening the lake surface the way
    * [[graft.io.Jsonl]] did for line-delimited JSON.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** ORC source with an EXPLICIT schema — inference is an extra
    * footer pass over every file at 100 TB ([[graft.io.Jsonl.read]]'s
    * rule, same rationale).
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
