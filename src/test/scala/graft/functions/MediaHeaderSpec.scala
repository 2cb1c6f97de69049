package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** MediaHeader: container-header parse over raw bytes — spec-correct
  * headers parse, truncated/malformed/foreign bytes yield null, and the
  * JPEG path is a real marker-segment walk (SOF found behind
  * variable-length APPn/COM/DQT segments and fill bytes, not at a fixed
  * offset). */
class MediaHeaderSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def parse(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val r = Seq(bytes).toDF("b")
      .select(call_function("media_header", col("b")).as("h"))
      .collect().head
    if (r.isNullAt(0)) None
    else {
      val s = r.getStruct(0)
      Some((s.getString(0), s.getInt(1), s.getInt(2)))
    }
  }

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(java.lang.Integer.parseInt(_, 16).toByte).toArray

  private def be32(v: Int) = f"$v%08X"
  private def be16(v: Int) = f"$v%04X"

  test("png: IHDR width/height") {
    val png = hx("89504E470D0A1A0A 0000000D 49484452 " +
      be32(1920) + be32(1080) + "08 06 00 00 00")
    assert(parse(png) == Some(("png", 1920, 1080)))
    // a PNG whose first chunk is not IHDR is malformed — null, not junk
    val bad = hx("89504E470D0A1A0A 0000000D 49484453 " +
      be32(1920) + be32(1080) + "08 06 00 00 00")
    assert(parse(bad).isEmpty)
    // truncated before the IHDR payload
    assert(parse(hx("89504E470D0A1A0A 0000000D 494844")).isEmpty)
  }

  test("jpeg: SOF behind multiple variable-length segments and fill bytes") {
    // FFD8, APP0 (16B), COM segment (9B payload), fill FF, then SOF2
    // (progressive, C2) — the walk must skip by declared lengths
    val jpg = hx("FFD8" +
      "FFE00010 4A46494600 0101 00 0001 0001 00 00" +
      "FFFE000A 64656164 62656566" + // COM len 10: 8 payload bytes
      "FF" + // fill byte before the next marker
      "FFC2000B 08 " + be16(480) + be16(640) + " 01 011100")
    assert(parse(jpg) == Some(("jpeg", 640, 480)))
    // EOI before any SOF → no frame header → null
    assert(parse(hx("FFD8 FFD9")).isEmpty)
    // lost sync (a segment length lying past a non-FF byte) → null
    assert(parse(hx("FFD8 00 C0")).isEmpty)
    // DHT (C4) must NOT be mistaken for a frame header
    val dhtOnly = hx("FFD8 FFC40004 0000 FFD9")
    assert(parse(dhtOnly).isEmpty)
  }

  test("gif: little-endian logical screen; version 87a and 89a") {
    assert(parse(hx("474946383961" + "8002" + "E001" + "F7 00 00")) ==
      Some(("gif", 640, 480))) // 0x0280=640, 0x01E0=480 little-endian
    assert(parse(hx("474946383761" + "0A00" + "1400" + "00 00 00")) ==
      Some(("gif", 10, 20)))
    assert(parse(hx("474946383861" + "0A00" + "1400" + "00 00 00")).isEmpty)
  }

  test("foreign bytes, empty payloads, and zero dims are null") {
    assert(parse("plain text bytes".getBytes("UTF-8")).isEmpty)
    assert(parse(Array.empty[Byte]).isEmpty)
    // zero-width PNG: dimensions must be positive
    assert(parse(hx("89504E470D0A1A0A 0000000D 49484452 " +
      be32(0) + be32(7) + "08 06 00 00 00")).isEmpty)
  }
}
