package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Snappy block-format conformance: hand-built vectors straight from
  * the published format description (so the DECODER is pinned against
  * the format, not against our own encoder), round-trip properties for
  * the encoder, and the strict-decoder refusal matrix. */
class SnappySpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // ---- decoder vs hand-built format vectors --------------------------------

  test("literal-only stream") {
    // varint len 5; literal tag (5-1)<<2 = 0x10; "hello"
    val in = bytes(0x05, 0x10) ++ "hello".getBytes("UTF-8")
    assert(new String(Snappy.uncompress(in), "UTF-8") == "hello")
  }

  test("overlapping copy extends a run (the RLE trick)") {
    // "aaaaaaaaaa": varint 10; literal 'a'; copy-1 len 9 offset 1
    // copy-1 tag: ((9-4) << 2) | 1 = 0x15; offset byte 0x01
    val in = bytes(0x0A, 0x00, 'a'.toInt, 0x15, 0x01)
    assert(new String(Snappy.uncompress(in), "UTF-8") == "a" * 10)
  }

  test("two-byte-offset copy") {
    // "abcdabcd": varint 8; literal "abcd" (tag 0x0C); copy-2 len 4
    // offset 4 → tag ((4-1)<<2)|2 = 0x0E, offset LE 04 00
    val in = bytes(0x08, 0x0C) ++ "abcd".getBytes("UTF-8") ++
      bytes(0x0E, 0x04, 0x00)
    assert(new String(Snappy.uncompress(in), "UTF-8") == "abcdabcd")
  }

  test("four-byte-offset copy") {
    val in = bytes(0x08, 0x0C) ++ "wxyz".getBytes("UTF-8") ++
      bytes(0x0F, 0x04, 0x00, 0x00, 0x00)
    assert(new String(Snappy.uncompress(in), "UTF-8") == "wxyzwxyz")
  }

  test("long literal with extra length bytes") {
    val payload = Array.tabulate[Byte](300)(i => (i % 251).toByte)
    // tag 61<<2 = 0xF4: two LE extra bytes holding len-1 = 299 = 0x012B
    val in = bytes(0xAC, 0x02) /* varint 300 */ ++
      bytes(0xF4, 0x2B, 0x01) ++ payload
    assert(java.util.Arrays.equals(Snappy.uncompress(in), payload))
  }

  // ---- strict-decoder refusals ----------------------------------------------

  test("refusals: bad offset, truncation, declared-size lies") {
    // copy before any output
    assert(intercept[IllegalArgumentException](
      Snappy.uncompress(bytes(0x04, 0x15, 0x01)))
      .getMessage.contains("offset"))
    // literal runs past the input
    assert(intercept[IllegalArgumentException](
      Snappy.uncompress(bytes(0x05, 0x10, 'a'.toInt)))
      .getMessage.contains("past the input"))
    // stream produces fewer bytes than declared
    assert(intercept[IllegalArgumentException](
      Snappy.uncompress(bytes(0x07, 0x10) ++ "hello".getBytes("UTF-8")))
      .getMessage.contains("declared"))
    // stream produces more bytes than declared
    assert(intercept[IllegalArgumentException](
      Snappy.uncompress(bytes(0x03, 0x10) ++ "hello".getBytes("UTF-8")))
      .getMessage.contains("declared"))
    // truncated varint
    assert(intercept[IllegalArgumentException](
      Snappy.uncompress(bytes(0x80)))
      .getMessage.contains("preamble"))
  }

  test("refusal: 4-extra-byte literal length near Int.MaxValue refuses " +
    "cleanly (no Int-overflow escape to arraycopy)") {
    // tag 0xFC: len field 63 → 64 > 60 → 4 extra LE bytes follow,
    // here encoding l = 0x7FFFFF00, so the pre-fix Int math
    // len = l + 1 stayed positive while p + len wrapped negative and
    // slipped past both bounds checks, surfacing as an uncaught
    // IndexOutOfBoundsException from System.arraycopy
    val in = bytes(0x0A) /* declared 10 */ ++
      bytes(0xFC, 0x00, 0xFF, 0xFF, 0x7F) ++ "abc".getBytes("UTF-8")
    assert(intercept[IllegalArgumentException](Snappy.uncompress(in))
      .getMessage.contains("literal length"))
  }

  // ---- encoder round-trip properties ----------------------------------------

  test("round-trip: empty, tiny, repetitive, random, and BSON-shaped") {
    val rnd = new scala.util.Random(42)
    val cases = Seq[Array[Byte]](
      Array.empty,
      "a".getBytes,
      "abc".getBytes,
      ("na" * 4000 + " batman").getBytes,
      ("the quick brown fox jumps over the lazy dog. " * 200).getBytes,
      Array.fill(10000)((rnd.nextInt(256) - 128).toByte),
      Array.fill(65000)(0x2A.toByte), // single long run
      Array.tabulate(70000)(i => (i % 7).toByte)
    ) ++ (1 to 20).map { i =>
      val n = rnd.nextInt(5000)
      // half-random, half-repeated — exercises literal/copy interleave
      val base = Array.fill(math.max(n / 4, 4))(
        (rnd.nextInt(256) - 128).toByte)
      Array.fill((n / base.length) + 1)(base).flatten.take(n)
    }
    for ((c, i) <- cases.zipWithIndex) {
      val packed = Snappy.compress(c)
      assert(java.util.Arrays.equals(Snappy.uncompress(packed), c),
        s"case $i (len ${c.length}) failed round-trip")
    }
    // repetitive input actually shrinks
    val rep = ("na" * 4000).getBytes
    assert(Snappy.compress(rep).length < rep.length / 10)
  }

  // ---- wire integration ------------------------------------------------------

  test("OP_COMPRESSED snappy frame: compressorId 1, round-trip, " +
       "corrupt payload refuses") {
    import org.json4s._
    val doc = OpMsg.encodeDoc(JObject(List(
      "find" -> JString("events"),
      "filter" -> JObject((1 to 30).toList.map(i =>
        s"k$i" -> JString("repeated repeated repeated"))),
      "$db" -> JString("graft"))))
    val out = new java.io.ByteArrayOutputStream()
    OpMsg.writeFrame(out, 3, 0, doc, flags = 0, compress = true,
      compressor = OpMsg.CompressorSnappy)
    val b = out.toByteArray
    def le32(o: Int) = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
    assert(le32(12) == 2012 && b(24) == 1) // OP_COMPRESSED, snappy id
    assert(b.length < 16 + 4 + 1 + doc.length) // it shrank
    val Some(f) = OpMsg.readFrame(
      new java.io.ByteArrayInputStream(b)): @unchecked
    assert(f.wasCompressed && f.compressorId == 1)
    assert(java.util.Arrays.equals(f.doc, doc))
    // a lying uncompressedSize refuses deterministically (the block
    // format itself carries no checksum — that's what flag bit 0 adds)
    val c = b.clone(); c(20) = (c(20) + 1).toByte
    assert(intercept[IllegalArgumentException](OpMsg.readFrame(
      new java.io.ByteArrayInputStream(c)))
      .getMessage.contains("snappy inflated"))
  }
}
