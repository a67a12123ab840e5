package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns plus typed metadata. The container has no codec libraries,
  * so the DECODE step is a clearly-marked deterministic stub — but the
  * Spark-side plumbing (schema, chunking, batch shape, partition
  * safety) is real and tested, which is the part that has to be right
  * at 100 TB: content bytes never become a shuffle key, metadata is
  * extracted once and carried as narrow columns.
  */
object Multimodal {

  /** Build a binary content column from text (test harness for the
    * plumbing; production ingests real bytes from `binaryFile` /
    * parquet sources).
    */
  def withBinaryContent(srcCol: String, outCol: String = "content")(df: DataFrame): DataFrame =
    df.withColumn(outCol, encode(col(srcCol), "UTF-8"))

  /** Cheap, codec-free metadata: byte length + content digest. The
    * digest doubles as the exact-dedup key for media (32/64-char
    * shuffle key instead of megabytes of content).
    */
  def withBinaryMeta(binCol: String)(df: DataFrame): DataFrame =
    df.withColumn("n_bytes", octet_length(col(binCol)))
      .withColumn("content_sha256", sha2(col(binCol), 256))

  /** DECODE STUB — the deterministic fake. A real deployment replaces
    * this with a vectorized decode over Arrow batches (mapInPandas /
    * mapInArrow with PIL/ffmpeg in the image); the output SCHEMA and
    * per-row contract here are exactly what that UDF must produce, so
    * swapping the implementation does not touch any downstream plan.
    * Fake dimensions derive from the content digest — stable across
    * runs, partitions, and cluster layouts.
    */
  def withDecodedMetaStub(binCol: String, outCol: String = "media_meta")(df: DataFrame): DataFrame = {
    val hInt = conv(substring(sha2(col(binCol), 256), 1, 6), 16, 10).cast("long")
    df.withColumn(outCol, struct(
      (hInt % 1920 + lit(1)).cast("int").as("width"),
      (shiftright(hInt, 8) % 1080 + lit(1)).cast("int").as("height"),
      element_at(array(lit("jpeg"), lit("png"), lit("webp")), (hInt % 3 + 1).cast("int")).as("format"),
      octet_length(col(binCol)).as("n_bytes")))
  }

  /** Split binary content into fixed-size chunks — the layout step
    * before any batched decode/feature-extract pass, and the unit of
    * parallelism for oversized media rows. Emits (chunk_idx, chunk).
    */
  def chunkBinary(binCol: String, chunkSize: Int)(df: DataFrame): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    val nChunks = ceil(octet_length(col(binCol)).cast("double") / chunkSize).cast("int")
    df.withColumn("__idx", explode(sequence(lit(0), greatest(nChunks, lit(1)) - 1)))
      .withColumn("chunk_idx", col("__idx"))
      .withColumn("chunk", expr(s"substring($binCol, __idx * $chunkSize + 1, $chunkSize)"))
      .drop("__idx")
  }

  /** Frame-sample stub: pick every `stride`-th chunk — the shape of
    * video frame sampling (decode replaced by the chunk bytes).
    */
  def sampleChunks(stride: Int)(chunked: DataFrame): DataFrame =
    chunked.where(col("chunk_idx") % stride === 0)

  /** FEATURE-EXTRACT STUB: a deterministic pseudo-embedding from
    * content bytes, with the real array<float> schema a downstream
    * similarity op expects. Each dimension is a 4-hex-char slice of
    * the content md5 scaled to [-1, 1) — one digest per row, engine-
    * portable arithmetic (any SQL engine that can parse hex can
    * replicate it, which is what lets the correctness gate hold an
    * exact oracle against this stub).
    */
  def withFeatureStub(binCol: String, dim: Int = 8, outCol: String = "features")(df: DataFrame): DataFrame = {
    require(dim >= 1 && dim <= 8, s"md5 yields 8 4-hex-char slices, got dim=$dim")
    val h = md5(col(binCol))
    df.withColumn(outCol,
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(conv(h.substr(i * 4 + 1, lit(4)), 16, 10).cast("long"), lit(1000L))
          .cast("double") / 500.0 - 1.0).cast("float")))
  }
}
