package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** Native SAS7BDAT source — the reference ingests `.sas7bdat` through
  * `pd.read_sas` (Data_Ingestion_Python.py:28-30); Spark has no
  * built-in reader, so this parses the format directly from the
  * community-documented layout (the reverse-engineered spec that
  * pandas/io/sas, parso, and readstat all implement: 32-byte magic,
  * 32/64-bit + endianness flags, header-declared page size, meta
  * pages carrying row-size/column-size/text/name/attribute
  * subheaders, then fixed-width rows on data and mix pages).
  *
  * Same two-plane split as the rest of graft.io: the DRIVER reads
  * only the header and leading meta pages (bounded — metadata, not
  * data), resolves the schema, then EXECUTORS parse disjoint page
  * ranges in parallel, each seeking straight to its first page —
  * pages are fixed-size and self-describing, so a 100 GB .sas7bdat
  * splits across a cluster exactly like a parquet row-group range,
  * with no driver materialization anywhere. (An RDD underlies the
  * page fan-out: a binary page parser is genuine per-partition
  * imperative logic; the result is immediately a DataFrame so
  * everything downstream stays declarative.)
  *
  * Type mapping mirrors `pd.read_sas`: SAS numerics (3-8 byte
  * truncated IEEE doubles, most-significant bytes kept) widen to
  * DoubleType with SAS missing (NaN) as Spark null; character
  * columns decode with the header's encoding and trailing-pad strip.
  * Compressed files (SASYZCRL/SASYZCR2) fail loudly — the reference
  * path reads uncompressed exports.
  */
object Sas {

  private val Magic: Array[Byte] = Array(
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0xc2, 0xea, 0x81, 0x60,
    0xb3, 0x14, 0x11, 0xcf, 0xbd, 0x92, 0x08, 0x00,
    0x09, 0xc7, 0x31, 0x8c, 0x18, 0x1f, 0x10, 0x11).map(_.toByte)

  final case class SasColumn(name: String, offset: Long, length: Int, isNumeric: Boolean)

  /** Everything an executor needs to parse any page independently. */
  final case class SasMeta(
      u64: Boolean,
      littleEndian: Boolean,
      encoding: String,
      headerLength: Int,
      pageLength: Int,
      pageCount: Long,
      rowLength: Long,
      rowCount: Long,
      mixPageRowCount: Long,
      columns: Seq[SasColumn]) extends Serializable {
    def bitOffset: Int = if (u64) 32 else 16
    def shPtrLen: Int = if (u64) 24 else 12
    def intLen: Int = if (u64) 8 else 4
    def schema: StructType = StructType(columns.map(c =>
      StructField(c.name, if (c.isNumeric) DoubleType else StringType, nullable = true)))
  }

  private final class ByteReader(buf: Array[Byte], le: Boolean) {
    def u8(off: Int): Int = buf(off) & 0xff
    def u16(off: Int): Int =
      if (le) u8(off) | (u8(off + 1) << 8) else (u8(off) << 8) | u8(off + 1)
    def u32(off: Int): Long = {
      val b = if (le) (0 to 3).map(i => u8(off + i).toLong)
              else (0 to 3).map(i => u8(off + 3 - i).toLong)
      b(0) | (b(1) << 8) | (b(2) << 16) | (b(3) << 24)
    }
    def u64v(off: Int): Long =
      if (le) u32(off) | (u32(off + 4) << 32)
      else (u32(off) << 32) | u32(off + 4)
    def uint(off: Int, len: Int): Long = len match {
      case 1 => u8(off).toLong
      case 2 => u16(off).toLong
      case 4 => u32(off)
      case 8 => u64v(off)
    }
    def bytes(off: Int, len: Int): Array[Byte] = java.util.Arrays.copyOfRange(buf, off, off + len)
    /** SAS numeric: width-w slice of an IEEE double keeping the most
      * significant bytes — for LE the stored bytes are the HIGH end,
      * so pad zeros on the left of the 8-byte little-endian image. */
    def sasDouble(off: Int, w: Int): Double = {
      var bits = 0L
      if (le) {
        var i = 0
        while (i < w) { bits |= (buf(off + i) & 0xffL) << ((8 - w + i) * 8); i += 1 }
      } else {
        var i = 0
        while (i < w) { bits = (bits << 8) | (buf(off + i) & 0xffL); i += 1 }
        bits = bits << ((8 - w) * 8)
      }
      java.lang.Double.longBitsToDouble(bits)
    }
  }

  private val PageTypeMask = 0xF00
  private val PageTypeMask2 = 0xF000 | PageTypeMask
  private def isMeta(t: Int) = t == 0x0000 || t == 0x4000
  private def isData(t: Int) = t == 0x0100
  private def isMix(t: Int) = t == 0x0200

  /** Parse header + leading meta pages (stops at the first data/mix
    * page, like pd.read_sas) — driver-side, bounded by metadata size.
    */
  def readMeta(spark: SparkSession, path: String): SasMeta = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fileLen = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      val head = new Array[Byte](288)
      in.readFully(0, head)
      require(head.take(32).sameElements(Magic),
        s"not a sas7bdat file (magic mismatch): $path")
      val u64 = (head(32) & 0xff) == 0x33
      val align1 = if ((head(35) & 0xff) == 0x33) 4 else 0
      val le = (head(37) & 0xff) == 0x01
      val hr = new ByteReader(head, le)
      val encoding = (head(70) & 0xff) match {
        case 20 | 0 => "UTF-8"
        case 29 => "ISO-8859-1"
        case 62 => "windows-1252"
        case other => sys.error(s"unsupported sas7bdat encoding code $other in $path")
      }
      val headerLength = hr.u32(196 + align1).toInt
      val pageLength = hr.u32(200 + align1).toInt
      require(headerLength >= 288 && pageLength > 0,
        s"implausible sas7bdat header (headerLength=$headerLength pageLength=$pageLength)")
      val pageCount = (fileLen - headerLength) / pageLength
      val intLen = if (u64) 8 else 4
      val bitOffset = if (u64) 32 else 16
      val shPtrLen = if (u64) 24 else 12

      var rowLength = 0L
      var rowCount = 0L
      var mixRows = 0L
      var colCount = 0
      val textBlobs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      val offsets = scala.collection.mutable.ArrayBuffer.empty[Long]
      val lengths = scala.collection.mutable.ArrayBuffer.empty[Int]
      val types = scala.collection.mutable.ArrayBuffer.empty[Boolean]

      val page = new Array[Byte](pageLength)
      var pi = 0L
      var done = false
      while (pi < pageCount && !done) {
        in.readFully(headerLength + pi * pageLength, page)
        val pr = new ByteReader(page, le)
        val ptype = (pr.u16(bitOffset) & PageTypeMask2)
        if (isMeta(ptype) || isMix(ptype) || ptype == 0x0400) {
          val shCount = pr.u16(bitOffset + 4)
          var i = 0
          while (i < shCount) {
            val base = bitOffset + 8 + i * shPtrLen
            val shOff = pr.uint(base, intLen).toInt
            val shLen = pr.uint(base + intLen, intLen).toInt
            val compression = pr.u8(base + 2 * intLen)
            if (shLen > 0 && compression != 1) { // 1 = truncated
              val sig = pr.bytes(shOff, intLen)
              signatureKind(sig) match {
                case "rowsize" =>
                  rowLength = pr.uint(shOff + 5 * intLen, intLen)
                  rowCount = pr.uint(shOff + 6 * intLen, intLen)
                  mixRows = pr.uint(shOff + 15 * intLen, intLen)
                case "colsize" =>
                  colCount = pr.uint(shOff + intLen, intLen).toInt
                case "text" =>
                  val sz = pr.u16(shOff + intLen)
                  val blob = pr.bytes(shOff + intLen, sz)
                  if (textBlobs.isEmpty) {
                    val s = new String(blob, java.nio.charset.StandardCharsets.ISO_8859_1)
                    if (s.contains("SASYZCRL") || s.contains("SASYZCR2"))
                      throw new UnsupportedOperationException(
                        s"compressed sas7bdat ($path) is not supported — re-export uncompressed")
                  }
                  textBlobs += blob
                case "colname" =>
                  val n = (shLen - 2 * intLen - 12) / 8
                  var j = 0
                  while (j < n) {
                    val pBase = shOff + intLen + 8 * (j + 1)
                    val idx = pr.u16(pBase)
                    val off = pr.u16(pBase + 2)
                    val len = pr.u16(pBase + 4)
                    names += new String(textBlobs(idx), off, len, encoding).trim
                    j += 1
                  }
                case "colattrs" =>
                  val n = (shLen - 2 * intLen - 12) / (intLen + 8)
                  var j = 0
                  while (j < n) {
                    offsets += pr.uint(shOff + intLen + 8 + j * (intLen + 8), intLen)
                    lengths += pr.u32(shOff + 2 * intLen + 8 + j * (intLen + 8)).toInt
                    types += pr.u8(shOff + 2 * intLen + 14 + j * (intLen + 8)) == 1
                    j += 1
                  }
                case _ => () // counts / format / list / unknown: not needed for data
              }
            }
            i += 1
          }
        }
        if (isData(ptype) || isMix(ptype)) done = true else pi += 1
      }
      require(rowLength > 0 && names.size == colCount && offsets.size == colCount,
        s"sas7bdat metadata incomplete in $path " +
          s"(cols=$colCount names=${names.size} attrs=${offsets.size} rowLength=$rowLength)")
      val cols = (0 until colCount).map(i => SasColumn(names(i), offsets(i), lengths(i), types(i)))
      SasMeta(u64, le, encoding, headerLength, pageLength, pageCount,
        rowLength, rowCount, mixRows, cols)
    } finally in.close()
  }

  private def signatureKind(sig: Array[Byte]): String = {
    val hex = sig.map(b => f"${b & 0xff}%02x").mkString
    hex match {
      case h if h.startsWith("f7f7f7f7") || h.endsWith("f7f7f7f7") || h == "f7f7f7f7fffffbfe" => "rowsize"
      case h if h.startsWith("f6f6f6f6") || h.endsWith("f6f6f6f6") || h == "f6f6f6f6fffffbfe" => "colsize"
      case h if h.startsWith("fdffffff") || h.endsWith("fffffffd") => "text"
      case h if h == "ffffffff" || h == "ffffffffffffffff" => "colname"
      case h if h.startsWith("fcffffff") || h.endsWith("fffffffc") => "colattrs"
      case _ => "other"
    }
  }

  /** Parse the rows of ONE page (data or mix); meta pages yield none
    * for uncompressed files. Shared by the executor task and any
    * local debugging.
    */
  private def pageRows(page: Array[Byte], meta: SasMeta): Iterator[Row] = {
    val pr = new ByteReader(page, meta.littleEndian)
    val ptype = pr.u16(meta.bitOffset) & PageTypeMask2
    val (start, n) =
      if (isData(ptype)) {
        (meta.bitOffset + 8, pr.u16(meta.bitOffset + 2).toLong)
      } else if (isMix(ptype)) {
        val shCount = pr.u16(meta.bitOffset + 4)
        val raw = meta.bitOffset + 8 + shCount * meta.shPtrLen
        val aligned = ((raw + 7) / 8) * 8
        val capacity = (page.length - aligned) / meta.rowLength
        // pd.read_sas clamps the mix page to min(row_count,
        // mix_page_row_count); a mix page is always the FIRST
        // row-bearing page, so the file-level rowCount applies to it
        // directly — without the clamp a row_size subheader declaring
        // more mix rows than the table holds would emit garbage rows
        // parsed from page padding
        (aligned, Seq(meta.mixPageRowCount, meta.rowCount, capacity).min)
      } else (0, 0L)
    val charset = java.nio.charset.Charset.forName(meta.encoding)
    (0L until n).iterator.map { r =>
      val base = start + r * meta.rowLength
      Row.fromSeq(meta.columns.map { c =>
        val off = (base + c.offset).toInt
        if (c.isNumeric) {
          val d = pr.sasDouble(off, c.length)
          if (java.lang.Double.isNaN(d)) null else d // SAS missing -> Spark null
        } else {
          val s = new String(page, off, c.length, charset)
          var end = s.length
          while (end > 0 && (s(end - 1) == ' ' || s(end - 1) == '\u0000')) end -= 1
          s.substring(0, end)
        }
      })
    }
  }

  /** Read a .sas7bdat into a DataFrame: one bounded driver-side
    * metadata parse, then executors each parse a disjoint page range
    * (seek + fixed-size reads — splittable like parquet row groups).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val meta = readMeta(spark, path)
    // hadoop Configuration is not serializable; ship the entries and
    // rebuild per partition ([[HadoopConfSer]], shared with Avro)
    val confBc = spark.sparkContext.broadcast(HadoopConfSer.entries(spark))
    val parallelism = math.max(1L,
      math.min(meta.pageCount, spark.sparkContext.defaultParallelism.toLong)).toInt
    val rows = spark.sparkContext
      .range(0L, meta.pageCount, numSlices = parallelism)
      .mapPartitions { pages =>
        val conf = HadoopConfSer.rebuild(confBc.value)
        val p = new Path(path)
        val fs = p.getFileSystem(conf)
        val in = fs.open(p)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        val buf = new Array[Byte](meta.pageLength)
        pages.flatMap { pi =>
          in.readFully(meta.headerLength + pi * meta.pageLength, buf)
          pageRows(buf, meta).toVector // buf is reused: materialize the page's rows
        }
      }
    spark.createDataFrame(rows, meta.schema)
  }
}
