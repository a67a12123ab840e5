package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native byte-level media expressions — the REAL replacements for the
  * round-4 multimodal stubs. All three are pure, deterministic,
  * single-pass functions over a binary column: no codec libraries, no
  * UDF serialization, and nothing here ever turns content bytes into a
  * shuffle key. The container has no PIL/ffmpeg, but image DIMENSIONS
  * don't need a codec — PNG/JPEG/GIF headers are public byte formats
  * (PNG spec §11.2.2 IHDR; JPEG/JFIF ISO 10918-1 SOF segments; GIF89a
  * §18 logical screen descriptor), parseable in a few dozen bytes.
  */
object BinaryFns {
  /** JPEG SOF markers that carry frame dimensions: C0-C3, C5-C7,
    * C9-CB, CD-CF (C4=DHT, C8=JPG extension, CC=DAC are NOT frames).
    */
  private[functions] def isSof(m: Int): Boolean =
    (m >= 0xC0 && m <= 0xCF) && m != 0xC4 && m != 0xC8 && m != 0xCC

  private[functions] def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private[functions] def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private[functions] def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private[functions] def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private[functions] def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  private val PngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  /** (format, width, height) or null if the bytes are not a
    * recognized image. Pure header inspection — never decodes pixels.
    */
  private[functions] def parseImage(b: Array[Byte]): (String, Int, Int) = {
    // PNG: 8-byte signature, then the IHDR chunk is REQUIRED first:
    // 4-byte length (13), "IHDR", width BE32, height BE32
    if (b.length >= 24 && PngSig.indices.forall(i => u8(b, i) == PngSig(i)) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = be32(b, 16); val h = be32(b, 20)
      // dimensions above 2^31-1 are out of spec; reject rather than wrap
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return null
      return ("png", w.toInt, h.toInt)
    }
    // GIF87a / GIF89a: logical screen descriptor, width/height LE16.
    // Zero dimensions are degenerate — null like the PNG branch, so
    // corrupt media filters identically across formats
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      val w = le16(b, 6); val h = le16(b, 8)
      if (w <= 0 || h <= 0) return null
      return ("gif", w, h)
    }
    // JPEG: SOI, then walk marker segments until a SOF frame header:
    // FF <marker> <len BE16 incl itself> <payload>. SOF payload is
    // precision(1), height(2), width(2), ... Entropy-coded data only
    // starts after SOS, and SOF precedes SOS, so the walk terminates.
    if (b.length >= 4 && u8(b, 0) == 0xFF && u8(b, 1) == 0xD8) {
      var pos = 2
      while (pos + 1 < b.length) {
        if (u8(b, pos) != 0xFF) return null // corrupt stream
        // any number of FF fill bytes may precede a marker
        var p = pos
        while (p + 1 < b.length && u8(b, p + 1) == 0xFF) p += 1
        // stream ended inside the fill bytes (… FF FF): truncated, not
        // a crash — the contract is null for unrecognized/cut-off bytes
        if (p + 1 >= b.length) return null
        val m = u8(b, p + 1)
        if (isSof(m)) {
          if (p + 8 >= b.length) return null // truncated SOF
          val w = be16(b, p + 7); val h = be16(b, p + 5)
          // height 0 is the DNL-deferred case (defined later in the
          // stream, which a header-only probe cannot see) — null like
          // the other degenerate-dimension branches, never a 0 row
          if (w <= 0 || h <= 0) return null
          return ("jpeg", w, h)
        } else if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
          pos = p + 2 // standalone marker, no length field
        } else if (m == 0xD9 || m == 0xDA) {
          return null // EOI / start-of-scan before any SOF: no dimensions
        } else {
          if (p + 3 >= b.length) return null
          val len = be16(b, p + 2)
          if (len < 2) return null
          pos = p + 2 + len
        }
      }
      return null
    }
    null
  }

  private[functions] def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  /** (majorBrand, timescale, duration) from an ISO-BMFF (MP4) stream,
    * or null if the bytes are not a parseable MP4. Walks the
    * top-level box list (`size(BE32) type(4)`), reads the major brand
    * from `ftyp`, then descends ONE level into `moov` skipping
    * unknown child boxes until `mvhd` (both version 0 — 32-bit
    * timescale/duration — and version 1 — 64-bit duration — per
    * ISO/IEC 14496-12 §8.2.2). Header-only like [[parseWav]]: media
    * data (`mdat` payload) is never read, so the probe cost is
    * independent of file size. 64-bit `largesize` (size==1) and
    * to-EOF (size==0) boxes return null — corrupt-or-exotic is a
    * loud null, not a wrong answer.
    */
  private[functions] def parseMp4(b: Array[Byte]): (String, Int, Long) = {
    if (b.length < 12) return null
    var brand: String = null
    var ts = -1L
    var dur = -1L
    var pos = 0
    while (pos + 8 <= b.length) {
      val size = be32(b, pos)
      if (size < 8 || pos + size > b.length) return null // largesize/to-EOF/corrupt
      val t0 = u8(b, pos + 4); val t1 = u8(b, pos + 5)
      val t2 = u8(b, pos + 6); val t3 = u8(b, pos + 7)
      if (t0 == 'f' && t1 == 't' && t2 == 'y' && t3 == 'p') {
        if (size < 16) return null
        brand = new String(b, pos + 8, 4, "US-ASCII")
      } else if (t0 == 'm' && t1 == 'o' && t2 == 'o' && t3 == 'v') {
        var c = pos + 8
        val end = pos + size.toInt
        while (c + 8 <= end && ts < 0) {
          val cs = be32(b, c)
          if (cs < 8 || c + cs > end) return null
          if (u8(b, c + 4) == 'm' && u8(b, c + 5) == 'v' &&
              u8(b, c + 6) == 'h' && u8(b, c + 7) == 'd') {
            // size-check BEFORE the version byte: an 8-byte 'mvhd'
            // child ending at the buffer edge would otherwise index
            // past the array — corrupt bytes must be a null, not an
            // ArrayIndexOutOfBoundsException that fails the task
            if (cs < 9) return null
            val version = u8(b, c + 8)
            if (version == 0) {
              if (cs < 108) return null
              ts = be32(b, c + 20); dur = be32(b, c + 24)
            } else if (version == 1) {
              if (cs < 120) return null
              ts = be32(b, c + 28); dur = be64(b, c + 32)
            } else return null
          }
          c += cs.toInt
        }
      }
      pos += size.toInt
    }
    if (brand == null || ts <= 0 || ts > Int.MaxValue || dur < 0) return null
    (brand, ts.toInt, dur)
  }

  /** (channels, sampleRate, bitsPerSample, nFrames) from a RIFF/WAVE
    * stream, or null if the bytes are not a parseable WAV. Walks the
    * chunk list (word-aligned: odd-size chunks carry a pad byte) until
    * BOTH `fmt ` and `data` headers are seen; the data chunk's
    * PAYLOAD need not be fully present — the size field alone gives
    * the frame count, which keeps the probe header-only.
    */
  private[functions] def parseWav(b: Array[Byte]): (Int, Int, Int, Long) = {
    if (b.length < 12 ||
        b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return null
    var pos = 12
    var channels = -1
    var rate = -1
    var bits = -1
    var blockAlign = -1
    var dataSize = -1L
    while (pos + 8 <= b.length && (channels < 0 || dataSize < 0)) {
      val size = le32(b, pos + 4)
      if (size < 0 || size > Int.MaxValue) return null // corrupt size field
      if (b(pos) == 'f' && b(pos + 1) == 'm' && b(pos + 2) == 't' && b(pos + 3) == ' ') {
        if (size < 16 || pos + 8 + 16 > b.length) return null // truncated fmt
        channels = le16(b, pos + 10)
        val r = le32(b, pos + 12)
        if (r > Int.MaxValue) return null
        rate = r.toInt
        blockAlign = le16(b, pos + 20)
        bits = le16(b, pos + 22)
      } else if (b(pos) == 'd' && b(pos + 1) == 'a' && b(pos + 2) == 't' && b(pos + 3) == 'a') {
        dataSize = size
      }
      // Long-checked advance: a near-2^31 size field must return null,
      // not wrap pos negative and throw on the next b(pos) read (the
      // data payload MAY legitimately extend past b.length — only the
      // cursor itself needs the overflow guard)
      val next = pos.toLong + 8L + size + (size & 1L) // odd chunks have a pad byte
      if (next > Int.MaxValue) return null
      pos = next.toInt
    }
    if (channels <= 0 || rate <= 0 || bits <= 0 || blockAlign <= 0 || dataSize < 0) return null
    (channels, rate, bits, dataSize / blockAlign)
  }
}

/** `graft_audio_meta(binary)` → struct(format, channels, sample_rate,
  * bits_per_sample, n_frames), null for unrecognized bytes. WAV/RIFF
  * only (RIFF spec: 12-byte RIFF/WAVE header, then word-aligned
  * `id(4) size(LE32) data` chunks; the `fmt ` chunk carries channel
  * count / sample rate / bits per sample, `data`'s SIZE gives the
  * frame count as size / blockAlign). Like [[ImageMeta]], the probe
  * reads headers only — sample decode would slot in downstream via
  * mapInArrow, never replace this. The chunk walk skips unknown
  * chunks (LIST/INFO/fact/cue), honoring odd-size pad bytes, so
  * metadata-bearing files parse at variable offsets.
  */
case class AudioMeta(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audio_meta"

  override def nullSafeEval(input: Any): Any = {
    BinaryFns.parseWav(input.asInstanceOf[Array[Byte]]) match {
      case null => null
      case (ch, rate, bits, frames) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString("wav"), ch, rate, bits, frames))
    }
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_audio_meta needs binary input, got ${child.dataType.simpleString}")

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}

/** `graft_image_meta(binary)` → struct(format, width, height), null
  * for unrecognized bytes. Supports PNG (IHDR), JPEG (general SOF
  * segment walk — APPn/COM/DQT/DHT segments of any length are
  * skipped, so EXIF-bearing files parse), and GIF87a/89a. A real
  * pixel decode (PIL/ffmpeg over mapInArrow) would REPLACE downstream
  * feature extraction, not this metadata probe — width/height/format
  * live in the header by spec.
  */
case class ImageMeta(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_meta"

  override def nullSafeEval(input: Any): Any = {
    BinaryFns.parseImage(input.asInstanceOf[Array[Byte]]) match {
      case null => null
      case (f, w, h) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(f), w, h))
    }
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_image_meta needs binary input, got ${child.dataType.simpleString}")

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}

/** `graft_byte_stats(binary)` → struct(n_bytes, n_distinct, byte_sum,
  * n_printable, entropy): one-pass 256-bin histogram statistics — the
  * standard cheap content filters for a training-data pipeline
  * (garbage/binary detection via entropy, printable ratio, byte
  * spread). Entropy is Shannon entropy in bits over byte values,
  * computed as (ln n − Σ c·ln c / n) / ln 2 with the histogram summed
  * in ascending byte order; gate queries round it (the oracle engine
  * sums the same terms in its own order, identical to ~1e-13).
  */
case class ByteStats(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("byte_sum", LongType, nullable = false),
    StructField("n_printable", IntegerType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))
  override def prettyName: String = "graft_byte_stats"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val counts = new Array[Long](256)
    var sum = 0L
    var printable = 0
    var i = 0
    while (i < b.length) {
      val v = b(i) & 0xFF
      counts(v) += 1
      sum += v
      if (v >= 0x20 && v <= 0x7E) printable += 1
      i += 1
    }
    var distinct = 0
    var clogc = 0.0
    var v = 0
    while (v < 256) {
      val c = counts(v)
      if (c > 0) {
        distinct += 1
        clogc += c * math.log(c.toDouble)
      }
      v += 1
    }
    val n = b.length
    val entropy = if (n == 0) 0.0 else (math.log(n.toDouble) - clogc / n) / math.log(2.0)
    new GenericInternalRow(Array[Any](n, distinct, sum, printable, entropy))
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_byte_stats needs binary input, got ${child.dataType.simpleString}")

  override protected def withNewChildInternal(newChild: Expression): ByteStats =
    copy(child = newChild)
}

/** `graft_byte_hist(binary, bins)` → array<double>: the normalized
  * byte-value histogram folded into `bins` equal-width bins (bins must
  * divide 256) — a codec-free per-row feature vector with exact
  * cross-engine semantics (each element is one count/n double
  * division). Empty input yields all zeros.
  */
case class ByteHist(child: Expression, bins: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, bins)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_byte_hist"

  @transient private lazy val nBins: Int = bins.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val raw = child.eval(input)
    if (raw == null) return null
    val b = raw.asInstanceOf[Array[Byte]]
    val width = 256 / nBins
    val counts = new Array[Long](nBins)
    var i = 0
    while (i < b.length) {
      counts((b(i) & 0xFF) / width) += 1
      i += 1
    }
    val out = new Array[Double](nBins)
    if (b.length > 0) {
      var j = 0
      while (j < nBins) { out(j) = counts(j).toDouble / b.length; j += 1 }
    }
    new GenericArrayData(out)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_byte_hist needs binary input, got ${child.dataType.simpleString}")
    else if (!(bins.foldable && bins.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure("bins must be an integer literal")
    else {
      val nb = bins.eval(null).asInstanceOf[Int]
      if (nb < 1 || nb > 256 || 256 % nb != 0)
        TypeCheckResult.TypeCheckFailure(s"bins must divide 256, got $nb")
      else TypeCheckResult.TypeCheckSuccess
    }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ByteHist =
    copy(child = newChildren(0), bins = newChildren(1))
}

/** `graft_cdc_gear(binary, divisor, window)` → array<struct<chunk_md5
  * string, n_bytes long>>: content-defined chunking with a GEAR
  * rolling hash — the production-rate boundary detector behind the
  * gate face [[graft.llm.Multimodal.binaryCdcChunks]] documents as
  * its drop-in upgrade. Same output CONTRACT (one element per chunk,
  * digest + byte length; empty array for empty input; boundaries
  * depend only on local bytes, so identical byte runs chunk
  * identically wherever they appear — the Muthitacharoen LBFS
  * property), different boundary hash: instead of a full md5 over the
  * trailing window per byte (the engine-portable face DuckDB
  * replays), the hash is the Gear chain h = (h << 1) + G[b] over a
  * seeded 256-entry table (Xia et al., FastCDC/Ddelta lineage) — one
  * shift+add+lookup per byte, with an implicit 64-byte window (each
  * byte's contribution shifts out after 64 steps).
  *
  * Boundary rule: after byte i (1-based) when i ≥ `window` and
  * (h & MASK) == 0, MASK = (2^maskBits − 1) << 16 with maskBits =
  * ceil(log2(divisor)) — the FastCDC mask position: testing bits
  * 16..16+maskBits−1 keeps ≥ 16 + maskBits bytes of context in every
  * tested bit (low bits of the chain see only the newest bytes), so
  * small divisors don't degrade to tiny effective windows. Expected
  * chunk length is 2^maskBits bytes — `divisor` rounded UP to a power
  * of two (stated here because the md5 face's expected length is the
  * divisor exactly). `window` plays the same warm-up role as the md5
  * face's: no boundary before `window` bytes, so sub-window rows are
  * one whole chunk.
  *
  * The digest is md5 over the chunk's RAW bytes (the production
  * choice — no hex transcription is ever materialized; the md5 face
  * digests the hex because its oracle replays string md5). The two
  * faces' digests are not comparable anyway: different boundary
  * hashes give different chunks — an index is built by ONE face and
  * queried by the same face.
  */
case class CdcGearChunks(child: Expression, divisor: Expression, window: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, divisor, window)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_md5", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_cdc_gear"

  @transient private lazy val mask: Long = {
    val d = divisor.eval(null).asInstanceOf[Int]
    val maskBits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(2, d).toLong - 1)
    ((1L << maskBits) - 1) << 16
  }
  @transient private lazy val minLen: Int = window.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val raw = child.eval(input)
    if (raw == null) return null
    val b = raw.asInstanceOf[Array[Byte]]
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    def emit(from: Int, until: Int): Unit = {
      md.reset()
      md.update(b, from, until - from)
      val hex = md.digest().map("%02x".format(_)).mkString
      out += new GenericInternalRow(Array[Any](
        UTF8String.fromString(hex), (until - from).toLong))
    }
    var h = 0L
    var start = 0
    var i = 0
    while (i < b.length) {
      h = (h << 1) + CdcGearChunks.GEAR(b(i) & 0xFF)
      // boundary AFTER byte i+1 (1-based), md5-face warm-up contract
      if (i + 1 >= minLen && (h & mask) == 0L) {
        emit(start, i + 1)
        start = i + 1
      }
      i += 1
    }
    if (start < b.length) emit(start, b.length)
    new GenericArrayData(out.toArray)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_cdc_gear needs binary input, got ${child.dataType.simpleString}")
    else if (!(divisor.foldable && divisor.dataType == IntegerType &&
        window.foldable && window.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure("divisor and window must be integer literals")
    else {
      val d = divisor.eval(null).asInstanceOf[Int]
      val w = window.eval(null).asInstanceOf[Int]
      if (d < 2 || w < 1)
        TypeCheckResult.TypeCheckFailure(s"bad divisor=$d / window=$w")
      else TypeCheckResult.TypeCheckSuccess
    }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CdcGearChunks =
    copy(child = newChildren(0), divisor = newChildren(1), window = newChildren(2))
}

object CdcGearChunks {
  /** splitmix64 — the standard 64-bit finalizer (Steele et al.,
    * public domain reference constants): seeds the 256-entry Gear
    * table deterministically, so chunk boundaries are reproducible
    * across runs, JVMs, and cluster layouts.
    */
  private[functions] def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  private[functions] val GEAR: Array[Long] = Array.tabulate(256)(i => splitmix64(i.toLong))
}

/** `graft_cdc_md5(binary, divisor, window)` → array<struct<chunk_md5
  * string, n_bytes long>>: the GATE-face chunker
  * ([[graft.llm.Multimodal.binaryCdcChunks]]) as ONE native loop —
  * bit-identical output to the higher-order-function formulation it
  * replaces, which paid an interpreted Catalyst lambda (UTF8String
  * substr + md5 + conv(16,10) string round-trip) PER BYTE and was the
  * measured dominant CPU term of the whole mm family (the four
  * slowest rows of bench_full_r17.json). The semantics are pinned by
  * the DuckDB oracle hash, so every step replicates the column
  * formulation exactly:
  *
  *  - hx = UPPERCASE hex transcription of the bytes (2 chars/byte);
  *  - boundary AFTER byte i (1-based, i ≥ window) iff the 60-bit
  *    prefix of md5(hx[(i−window)·2 .. i·2)) — the first 15 lowercase
  *    hex chars parsed base-16, here read straight from the digest's
  *    leading 7.5 bytes — is ≡ 0 mod divisor;
  *  - one chunk per boundary gap; chunk_md5 = md5 over the chunk's
  *    HEX transcription (the ASCII bytes of the uppercase hex — what
  *    Spark's md5(string) digests), emitted as 32 lowercase hex
  *    chars; n_bytes = chunk byte length;
  *  - empty input → empty array (the caller's explode_outer + null
  *    filter drops the row); NULL → NULL; rows shorter than the
  *    window carry no boundary and fall through as one whole chunk.
  *
  * Cost: one 16-byte md5 per byte (inherent to the gate face's
  * definition — the production face [[CdcGearChunks]] replaces the
  * probe hash itself) plus one md5 per chunk, all on reused buffers;
  * no per-byte allocation survives the loop.
  */
case class CdcMd5Chunks(child: Expression, divisor: Expression, window: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, divisor, window)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_md5", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_cdc_md5"

  @transient private lazy val div: Long = divisor.eval(null).asInstanceOf[Int].toLong
  @transient private lazy val win: Int = window.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val raw = child.eval(input)
    if (raw == null) return null
    val b = raw.asInstanceOf[Array[Byte]]
    val n = b.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val HEX = CdcMd5Chunks.HEX_UPPER
    // uppercase hex transcription — the string the HOF face built
    // once per row with upper(hex(col)); both the boundary probe and
    // the chunk digest hash slices of it
    val hx = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val v = b(i) & 0xFF
      hx(2 * i) = HEX(v >>> 4)
      hx(2 * i + 1) = HEX(v & 0xF)
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = new Array[Byte](16)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    // emit the chunk covering bytes [from, until) as (md5-of-hex-slice
    // lowercase hex string, byte length) — Spark md5(string) semantics
    def emit(from: Int, until: Int): Unit = {
      md.reset()
      md.update(hx, 2 * from, 2 * (until - from))
      md.digest(dig, 0, 16)
      val hexOut = new Array[Byte](32)
      var k = 0
      while (k < 16) {
        val v = dig(k) & 0xFF
        hexOut(2 * k) = CdcMd5Chunks.HEX_LOWER(v >>> 4)
        hexOut(2 * k + 1) = CdcMd5Chunks.HEX_LOWER(v & 0xF)
        k += 1
      }
      out += new GenericInternalRow(Array[Any](
        UTF8String.fromBytes(hexOut), (until - from).toLong))
    }
    var start = 0
    if (n >= win) {
      var p = win // 1-based boundary candidate position
      while (p <= n) {
        md.reset()
        md.update(hx, 2 * (p - win), 2 * win)
        md.digest(dig, 0, 16)
        // md5Hash60: first 15 hex chars base-16 = leading 60 bits of
        // the digest (7 full bytes + the high nibble of byte 7)
        var h = 0L
        var k = 0
        while (k < 7) { h = (h << 8) | (dig(k) & 0xFFL); k += 1 }
        h = (h << 4) | ((dig(7) & 0xF0L) >>> 4)
        if (h % div == 0L) {
          emit(start, p)
          start = p
        }
        p += 1
      }
    }
    if (start < n) emit(start, n)
    new GenericArrayData(out.toArray)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_cdc_md5 needs binary input, got ${child.dataType.simpleString}")
    else if (!(divisor.foldable && divisor.dataType == IntegerType &&
        window.foldable && window.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure("divisor and window must be integer literals")
    else {
      val d = divisor.eval(null).asInstanceOf[Int]
      val w = window.eval(null).asInstanceOf[Int]
      if (d < 2 || w < 1)
        TypeCheckResult.TypeCheckFailure(s"bad divisor=$d / window=$w")
      else TypeCheckResult.TypeCheckSuccess
    }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CdcMd5Chunks =
    copy(child = newChildren(0), divisor = newChildren(1), window = newChildren(2))
}

object CdcMd5Chunks {
  private[functions] val HEX_UPPER: Array[Byte] = "0123456789ABCDEF".getBytes("US-ASCII")
  private[functions] val HEX_LOWER: Array[Byte] = "0123456789abcdef".getBytes("US-ASCII")
}

/** `graft_video_meta(binary)` → struct(format, brand, timescale,
  * duration), null for unrecognized bytes. ISO-BMFF/MP4 only — the
  * video twin of [[ImageMeta]]/[[AudioMeta]]: a header-only box walk
  * ([[BinaryFns.parseMp4]]) that reads the `ftyp` major brand and the
  * `moov`/`mvhd` movie header; frame decode would slot in downstream
  * via mapInArrow, never replace this probe. Seconds = duration /
  * timescale — left to the caller so the raw header ints stay exact.
  */
case class VideoMeta(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("brand", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_video_meta"

  override def nullSafeEval(input: Any): Any = {
    BinaryFns.parseMp4(input.asInstanceOf[Array[Byte]]) match {
      case null => null
      case (brand, ts, dur) =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString("mp4"), UTF8String.fromString(brand), ts, dur))
    }
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_video_meta needs binary input, got ${child.dataType.simpleString}")

  override protected def withNewChildInternal(newChild: Expression): VideoMeta =
    copy(child = newChild)
}
