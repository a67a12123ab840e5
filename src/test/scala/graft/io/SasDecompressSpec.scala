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
    val bad = intercept[IllegalArgumentException] { rdc(0x80, 0x00, 0x30, 0x00)(3) }
    assert(bad.getMessage.contains("back-reference"))
    val short = intercept[IllegalArgumentException] { rdc(0x00, 0x00, 'a')(5) }
    assert(short.getMessage.contains("decompressed to"))
  }
}
