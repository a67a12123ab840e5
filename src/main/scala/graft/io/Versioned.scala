package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Poor-man's table format: an append-only sequence of immutable
  * version directories (`path/v=N`) plus one atomically-swapped
  * `_versions` manifest (newline-separated published versions; the
  * last line is latest) — time travel, concurrent-reader isolation,
  * and safe re-runs without a full transaction log. The reference
  * pipeline overwrites its outputs in place
  * (`Athena_DynamoDB_Normalized.py` rewrites the export each run),
  * which gives readers a torn view during the write and no way back
  * after a bad run; here a writer publishes a COMPLETE new version
  * directory and then swaps one manifest file, so readers pin either
  * the old version or the new one, never a mix, and a bad run rolls
  * back by re-publishing an old frame.
  *
  * Crash contract (single writer): data lands fully in `v=N` BEFORE
  * the manifest swap. A crash mid-write leaves an orphan `v=N` the
  * manifest never lists — readers are unaffected, the next write
  * skips past it (next = max(on disk, published) + 1), and
  * [[vacuum]] sweeps any unlisted directory. The manifest swap is
  * write-temp + rename.
  *
  * At 100 TB the versioned layout costs only what each run rewrites;
  * [[vacuum]] bounds retention. The real-world hardening this stands
  * in for (multi-writer commit arbitration, manifest-level FILE
  * tracking, schema evolution) is what Iceberg/Delta add on top of
  * exactly this directory-plus-manifest discipline.
  */
object Versioned {

  private val manifestName = "_versions"
  private val prefix = "v="

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Every version directory on disk, published or orphan. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    val root = new Path(path)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith(prefix) => n.stripPrefix(prefix).toLong }
      .sorted
  }

  /** The manifest's published versions, oldest first. */
  def published(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    val manifest = new Path(path, manifestName)
    if (!f.exists(manifest)) Seq.empty
    else {
      val in = f.open(manifest)
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
      text.split('\n').map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
    }
  }

  /** The version readers see by default — the manifest's last entry.
    * None before the first successful publish.
    */
  def latestVersion(spark: SparkSession, path: String): Option[Long] =
    published(spark, path).lastOption

  /** Swap in a new manifest with a single overwriting rename — a
    * reader concurrent with the swap sees the old manifest or the new
    * one, never a missing one. Plain `FileSystem.rename` won't
    * overwrite, and delete-then-rename opens exactly the no-manifest
    * window the versioned layout promises away, so the swap goes
    * through `FileContext.rename(..., OVERWRITE)`; only if the
    * filesystem has no AbstractFileSystem binding (no FileContext) do
    * we fall back to delete+rename, accepting the window there.
    */
  private def writeManifest(spark: SparkSession, path: String, vs: Seq[Long]): Unit = {
    val f = fs(spark, path)
    val tmp = new Path(path, s"$manifestName.tmp")
    val out = f.create(tmp, true)
    try out.write(vs.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val manifest = new Path(path, manifestName)
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        f.makeQualified(new Path(path)).toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(f.makeQualified(tmp), f.makeQualified(manifest),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        f.delete(manifest, false)
        require(f.rename(tmp, manifest),
          s"versioned write: could not publish manifest at $path")
    }
  }

  /** Publish `df` as the next version and swap the manifest; returns
    * the version number. Data is fully written before the manifest
    * moves (see crash contract above).
    */
  def writeVersion(df: DataFrame, path: String): Long = {
    val spark = df.sparkSession
    val pub = published(spark, path)
    val next = (versions(spark, path) ++ pub).foldLeft(0L)(math.max) + 1
    df.write.mode("errorifexists").parquet(s"$path/$prefix$next")
    writeManifest(spark, path, pub :+ next)
    next
  }

  def readVersion(spark: SparkSession, path: String, version: Long): DataFrame =
    spark.read.parquet(s"$path/$prefix$version")

  def readLatest(spark: SparkSession, path: String): DataFrame = {
    val v = latestVersion(spark, path).getOrElse(
      sys.error(s"versioned read: no published version at $path"))
    readVersion(spark, path, v)
  }

  /** Delete every on-disk version outside the `keepLast` most recent
    * PUBLISHED ones — older published history AND orphan debris from
    * crashed writes alike — and rewrite the manifest to the survivors.
    * Returns the deleted version numbers, ascending.
    */
  def vacuum(spark: SparkSession, path: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val pub = published(spark, path)
    if (pub.isEmpty) return Seq.empty
    val keep = pub.takeRight(keepLast).toSet
    val drop = versions(spark, path).filterNot(keep)
    val f = fs(spark, path)
    // Manifest first, then delete: a crash mid-vacuum must leave the
    // manifest pointing only at versions that still exist (undeleted
    // survivors become orphans the next vacuum sweeps), never at
    // swept directories.
    writeManifest(spark, path, pub.filter(keep))
    drop.foreach(v => f.delete(new Path(path, s"$prefix$v"), true))
    drop
  }
}
