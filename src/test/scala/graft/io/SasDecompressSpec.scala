package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** Unit contracts of the two sas7bdat row decompressors: the happy
  * paths are cross-validated end-to-end against pd.read_sas through
  * the committed fixtures (SasSpec); these pin the LOUD-failure
  * contracts for corrupt streams, which no fixture can carry.
  */
class SasDecompressSpec extends AnyFunSuite {

  private def rle(bytes: Int*)(outLen: Int): Array[Byte] =
    Sas.rleDecompress(bytes.map(_.toByte).toArray, 0, bytes.length, outLen)

  private def rdc(bytes: Int*)(outLen: Int): Array[Byte] =
    Sas.rdcDecompress(bytes.map(_.toByte).toArray, 0, bytes.length, outLen)

  test("RLE: each command family decodes per the public table") {
    // 0x8n literal copy (n+1 bytes)
    assert(rle(0x82, 'a', 'b', 'c')(3).sameElements("abc".getBytes))
    // 0xCn repeat next byte n+3 times
    assert(rle(0xC1, 'x')(4).sameElements("xxxx".getBytes))
    // 0xEn blanks, 0xFn zeros (n+2)
    assert(rle(0xE2)(4).sameElements("    ".getBytes))
    assert(rle(0xF0)(2).sameElements(Array[Byte](0, 0)))
    // 0x6 long blanks: efb*256 + next + 17
    assert(rle(0x60, 0x03)(20).forall(_ == ' '.toByte))
    // 0x4 long repeat: efb*16 + next + 18, then the value byte
    assert(rle(0x40, 0x02, 'z')(20).forall(_ == 'z'.toByte))
    // 0x0 big literal: efb*256 + next + 64
    val lit = Array.tabulate(64)(i => ('a' + i % 26).toByte)
    val enc = Array[Byte](0x00, 0x00) ++ lit
    assert(Sas.rleDecompress(enc, 0, enc.length, 64).sameElements(lit))
  }

  test("RLE: unknown control byte and truncated output fail loudly") {
    val bad = intercept[java.io.IOException] { rle(0x10, 0x00)(4) }
    assert(bad.getMessage.contains("unknown control byte"))
    val short = intercept[IllegalArgumentException] { rle(0x81, 'a', 'b')(10) }
    assert(short.getMessage.contains("decompressed to"))
  }

  test("RDC: literals, RLE runs and overlapping back-references decode per the public table") {
    // control word 0x0000: 16 literal slots; use 3: "abc"
    assert(rdc(0x00, 0x00, 'a', 'b', 'c')(3).sameElements("abc".getBytes))
    // control 0x8000: first item is a command; cmd 0 short RLE cnt+3
    assert(rdc(0x80, 0x00, 0x02, 'q')(5).sameElements("qqqqq".getBytes))
    // cmd 1 long RLE: cnt + (next<<4) + 19
    assert(rdc(0x80, 0x00, 0x11, 0x00, 'r')(20).forall(_ == 'r'.toByte))
    // literal "abc" then cmd 3: copy 3 bytes from ofs 3 -> "abcabc"
    // (control word 0x1000: items are lit,lit,lit,cmd)
    val out = rdc(0x10, 0x00, 'a', 'b', 'c', 0x30, 0x00)(6)
    assert(out.sameElements("abcabc".getBytes))
    // OVERLAPPING copy: cmd 5 from ofs 3 copies past its own start —
    // positions 4 and 5 of the copy read bytes the copy itself wrote
    // (legal, byte-at-a-time semantics): "abc" + 5 -> "abcabcab"
    val ovl = rdc(0x10, 0x00, 'a', 'b', 'c', 0x50, 0x00)(8)
    assert(ovl.sameElements("abcabcab".getBytes))
  }

  test("RDC: corrupt back-reference offset and truncated output fail loudly") {
    // cmd 3 back-reference before any output exists
    val bad = intercept[java.io.IOException] { rdc(0x80, 0x00, 0x30, 0x00)(3) }
    assert(bad.getMessage.contains("back-reference"))
    val short = intercept[IllegalArgumentException] { rdc(0x00, 0x00, 'a')(5) }
    assert(short.getMessage.contains("decompressed to"))
    // truncated control word / operand / overflowing run: loud, typed
    assert(intercept[java.io.IOException] { rdc(0x80)(4) }
      .getMessage.contains("truncated"))
    assert(intercept[java.io.IOException] { rdc(0x80, 0x00, 0x00)(4) }
      .getMessage.contains("truncated"))
    assert(intercept[java.io.IOException] { rdc(0x80, 0x00, 0x0F, 'x')(4) }
      .getMessage.contains("overflows"))
  }

  test("RLE: truncated operands and overflowing runs fail loudly, never bleed past bounds") {
    assert(intercept[java.io.IOException] { rle(0x60)(40) }
      .getMessage.contains("truncated"))
    assert(intercept[java.io.IOException] { rle(0xE5)(3) } // 7 blanks into 3 bytes
      .getMessage.contains("overflows"))
    assert(intercept[java.io.IOException] { rle(0x8F, 'a', 'b')(16) } // 16-literal, 2 present
      .getMessage.contains("overruns"))
  }

  // ===== generative roundtrips =====
  //
  // Scala mirrors of the fixture tool's encoders (same greedy command
  // choices). pd.read_sas already cross-validates the committed
  // fixtures; these fuzz the DECODER across run lengths that straddle
  // every command boundary (2/3, 16/17/18/19, 48/49, 64/65, 513,
  // 4112...) which no fixed fixture covers.

  private def rleEncode(data: Array[Byte]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var i = 0; var lit = 0
    def flush(end: Int): Unit = {
      var j = lit
      while (j < end) {
        val chunk = math.min(end - j, 4159)
        if (chunk > 64) { val v = chunk - 64; out += (v >> 8).toByte; out += (v & 0xff).toByte }
        else if (chunk > 48) out += (0xB0 | (chunk - 49)).toByte
        else if (chunk > 32) out += (0xA0 | (chunk - 33)).toByte
        else if (chunk > 16) out += (0x90 | (chunk - 17)).toByte
        else out += (0x80 | (chunk - 1)).toByte
        out ++= data.slice(j, j + chunk)
        j += chunk
      }
      lit = end
    }
    while (i < data.length) {
      val b = data(i)
      var run = 1
      while (i + run < data.length && data(i + run) == b) run += 1
      var r = 0
      if (b == 0x20.toByte && run >= 18) {
        r = math.min(run, 4112); val v = r - 17
        flush(i); out += (0x60 | (v >> 8)).toByte; out += (v & 0xff).toByte
      } else if (b == 0x20.toByte && run >= 3) {
        r = math.min(run, 17); flush(i); out += (0xE0 | (r - 2)).toByte
      } else if (b == 0x00.toByte && run >= 18) {
        r = math.min(run, 4112); val v = r - 17
        flush(i); out += (0x70 | (v >> 8)).toByte; out += (v & 0xff).toByte
      } else if (b == 0x00.toByte && run >= 3) {
        r = math.min(run, 17); flush(i); out += (0xF0 | (r - 2)).toByte
      } else if (b == 0x40.toByte && run >= 3) {
        r = math.min(run, 17); flush(i); out += (0xD0 | (r - 2)).toByte
      } else if (run >= 19) {
        r = math.min(run, 513); val v = r - 18
        val efb = math.min(15, v >> 4); val nxt = v - efb * 16
        flush(i); out += (0x40 | efb).toByte; out += nxt.toByte; out += b
      } else if (run >= 3) {
        r = math.min(run, 18); flush(i); out += (0xC0 | (r - 3)).toByte; out += b
      }
      if (r > 0) { i += r; lit = i } else i += 1
    }
    flush(data.length)
    out.toArray
  }

  private def rdcEncode(data: Array[Byte]): Array[Byte] = {
    val tokens = scala.collection.mutable.ArrayBuffer.empty[(Boolean, Array[Byte])]
    var i = 0
    while (i < data.length) {
      val b = data(i)
      var run = 1
      while (i + run < data.length && data(i + run) == b) run += 1
      if (run >= 19) {
        val r = math.min(run, 19 + 4095); val cnt = r - 19
        tokens += ((true, Array((0x10 | (cnt & 0x0f)).toByte, ((cnt >> 4) & 0xff).toByte, b)))
        i += r
      } else if (run >= 3) {
        val r = math.min(run, 18)
        tokens += ((true, Array((r - 3).toByte, b)))
        i += r
      } else if (i >= 3 && i + 2 < data.length && data(i) == data(i - 3) &&
          data(i + 1) == data(i - 2) && data(i + 2) == data(i - 1)) {
        var m = 3
        while (m < 15 && i + m < data.length && data(i + m) == data(i + m - 3)) m += 1
        tokens += ((true, Array(((m << 4) | 0x00).toByte, 0x00.toByte)))
        i += m
      } else {
        tokens += ((false, Array(b)))
        i += 1
      }
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    tokens.grouped(16).foreach { chunk =>
      var ctrl = 0
      chunk.zipWithIndex.foreach { case ((c, _), j) => if (c) ctrl |= 0x8000 >> j }
      out += (ctrl >> 8).toByte; out += (ctrl & 0xff).toByte
      chunk.foreach { case (_, bs) => out ++= bs }
    }
    out.toArray
  }

  test("property: RLE and RDC decoders invert the mirror encoders on runs straddling every command boundary") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val seg = for {
      b <- Gen.frequency(3 -> Gen.const(0x20), 2 -> Gen.const(0x00),
        1 -> Gen.const(0x40), 6 -> Gen.chooseNum(1, 255))
      n <- Gen.frequency(5 -> Gen.chooseNum(1, 4), 4 -> Gen.chooseNum(5, 40),
        2 -> Gen.oneOf(16, 17, 18, 19, 20, 48, 49, 63, 64, 65, 66, 512, 513, 514),
        1 -> Gen.chooseNum(600, 4200))
    } yield Array.fill(n)(b.toByte)
    val datas = Gen.nonEmptyListOf(seg).map(_.flatten.toArray)
    def check(p: Prop): Unit = {
      val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
      assert(r.passed, r.status.toString)
    }
    check(Prop.forAll(datas) { d =>
      val enc = rleEncode(d)
      Sas.rleDecompress(enc, 0, enc.length, d.length).sameElements(d)
    })
    check(Prop.forAll(datas) { d =>
      val enc = rdcEncode(d)
      Sas.rdcDecompress(enc, 0, enc.length, d.length).sameElements(d)
    })
  }
}
