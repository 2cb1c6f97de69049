package graft.sources

/** Snappy block format (the format mongod's default wire compressor
  * speaks, compressorId 1) implemented from the published format
  * description — no library exists on this classpath:
  *
  *   preamble: uncompressed length as a little-endian varint;
  *   elements: tag byte, low 2 bits select the type —
  *     00 literal: upper 6 bits = len-1 (< 60), or 60/61/62/63 = the
  *        count of little-endian extra length bytes holding len-1;
  *     01 copy, 1-byte offset: len = 4 + ((tag>>2) & 7) (4..11),
  *        offset = ((tag>>5) << 8) | next byte (1..2047);
  *     10 copy, 2-byte offset: len = ((tag>>2) & 63) + 1 (1..64),
  *        offset = next 2 bytes LE;
  *     11 copy, 4-byte offset: same lengths, 4-byte LE offset.
  *   Copies may overlap themselves (offset < len ⇒ run extension).
  *
  * The compressor is a greedy single-pass matcher (hash of 4-byte
  * windows → last position, 2-byte-offset copies split into ≤64-byte
  * chunks) — valid snappy, not byte-identical to the C++ encoder's
  * choices; any conformant decoder accepts it. [[uncompress]] is a
  * strict decoder: bad offsets, lengths past the declared size, and
  * truncated streams all refuse. SnappySpec pins hand-built format
  * vectors (literal runs, overlapping copies, all three copy kinds)
  * plus round-trip properties. */
object Snappy {
  private val MaxLen = 1 << 30

  def compress(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length / 2 + 16)
    // preamble: uncompressed length varint
    var v = in.length
    while ((v & ~0x7F) != 0) { out.write((v & 0x7F) | 0x80); v >>>= 7 }
    out.write(v)

    def emitLiteral(from: Int, until: Int): Unit = {
      var p = from
      while (p < until) {
        val n = math.min(until - p, 0x10000) // arbitrary chunking is legal
        val lm1 = n - 1
        if (lm1 < 60) out.write(lm1 << 2)
        else if (lm1 < 0x100) { out.write(60 << 2); out.write(lm1) }
        else { out.write(61 << 2); out.write(lm1 & 0xFF); out.write(lm1 >>> 8) }
        out.write(in, p, n)
        p += n
      }
    }
    def emitCopy(offset: Int, len0: Int): Unit = {
      var len = len0
      while (len > 0) {
        val n = math.min(len, 64)
        // leave ≥4 for the tail so a 1..3-byte remainder never needs
        // a copy shorter than the format's 2-byte-offset minimum of 1 —
        // lengths 1..64 are legal for type 10, so no special-casing
        if (offset < 0x10000) {
          out.write(((n - 1) << 2) | 2)
          out.write(offset & 0xFF); out.write(offset >>> 8)
        } else {
          out.write(((n - 1) << 2) | 3)
          out.write(offset & 0xFF); out.write((offset >>> 8) & 0xFF)
          out.write((offset >>> 16) & 0xFF); out.write((offset >>> 24) & 0xFF)
        }
        len -= n
      }
    }

    if (in.length < 4) { emitLiteral(0, in.length); return out.toByteArray }
    val shift = 15
    val table = new Array[Int](1 << shift) // value = position + 1 (0 = empty)
    def hash(p: Int): Int = {
      val x = (in(p) & 0xFF) | ((in(p + 1) & 0xFF) << 8) |
        ((in(p + 2) & 0xFF) << 16) | ((in(p + 3) & 0xFF) << 24)
      (x * 0x1E35A7BD) >>> (32 - shift)
    }
    var lit = 0 // start of the pending literal run
    var p = 0
    val limit = in.length - 4
    while (p <= limit) {
      val h = hash(p)
      val cand = table(h) - 1
      table(h) = p + 1
      if (cand >= 0 && in(cand) == in(p) && in(cand + 1) == in(p + 1) &&
          in(cand + 2) == in(p + 2) && in(cand + 3) == in(p + 3)) {
        // extend the match
        var len = 4
        while (p + len < in.length && in(cand + len) == in(p + len)) len += 1
        if (lit < p) emitLiteral(lit, p)
        emitCopy(p - cand, len)
        p += len
        lit = p
      } else p += 1
    }
    if (lit < in.length) emitLiteral(lit, in.length)
    out.toByteArray
  }

  def uncompress(in: Array[Byte]): Array[Byte] = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"snappy: $msg")
    var p = 0
    // preamble varint
    var declared = 0
    var sh = 0
    var more = true
    while (more) {
      if (p >= in.length) fail("truncated length preamble")
      val b = in(p) & 0xFF; p += 1
      declared |= (b & 0x7F) << sh
      sh += 7
      more = (b & 0x80) != 0
      if (sh > 35) fail("length varint too long")
    }
    if (declared < 0 || declared > MaxLen) fail(s"bad length $declared")
    val out = new Array[Byte](declared)
    var o = 0
    while (p < in.length) {
      val tag = in(p) & 0xFF; p += 1
      (tag & 3) match {
        case 0 => // literal
          var len = (tag >>> 2) + 1
          if (len > 60) {
            val extra = len - 60
            if (p + extra > in.length) fail("truncated literal length")
            // accumulate in a Long: 4 extra bytes can encode up to
            // 2^32-1, which overflows Int and would slip past the
            // bounds checks below as a negative sum
            var l = 0L
            var i = 0
            while (i < extra) { l |= (in(p + i) & 0xFFL) << (8 * i); i += 1 }
            p += extra
            if (l + 1 > declared) fail("bad literal length")
            len = (l + 1).toInt
          }
          // subtraction form: p/o are non-negative and bounded, so these
          // cannot overflow the way `p + len` could
          if (len > in.length - p) fail("literal past the input")
          if (len > declared - o) fail("literal past the declared size")
          System.arraycopy(in, p, out, o, len)
          p += len; o += len
        case kind =>
          var len = 0
          var off = 0
          if (kind == 1) {
            if (p >= in.length) fail("truncated copy-1")
            len = 4 + ((tag >>> 2) & 7)
            off = ((tag >>> 5) << 8) | (in(p) & 0xFF); p += 1
          } else if (kind == 2) {
            if (p + 2 > in.length) fail("truncated copy-2")
            len = ((tag >>> 2) & 63) + 1
            off = (in(p) & 0xFF) | ((in(p + 1) & 0xFF) << 8); p += 2
          } else {
            if (p + 4 > in.length) fail("truncated copy-4")
            len = ((tag >>> 2) & 63) + 1
            off = (in(p) & 0xFF) | ((in(p + 1) & 0xFF) << 8) |
              ((in(p + 2) & 0xFF) << 16) | ((in(p + 3) & 0xFF) << 24)
            p += 4
          }
          if (off <= 0 || off > o) fail(s"copy offset $off at output $o")
          if (o + len > declared) fail("copy past the declared size")
          // overlapping copies extend runs — byte-by-byte is the contract
          var i = 0
          while (i < len) { out(o + i) = out(o + i - off); i += 1 }
          o += len
      }
    }
    if (o != declared) fail(s"stream produced $o bytes, declared $declared")
    out
  }
}
