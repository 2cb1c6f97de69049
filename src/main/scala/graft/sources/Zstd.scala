package graft.sources

/** RFC 8878 zstd frames in STORE MODE — raw (uncompressed) blocks
  * only, built from the published spec (no codebase consulted).
  *
  * Why this exists: mongod negotiates `snappy|zlib|zstd`, and a
  * deployment that offers ONLY zstd used to force this stack back to
  * uncompressed. A store-mode frame is *legal zstd* — any conforming
  * decoder (including mongod's) decompresses it — so emitting
  * store-mode makes this a correct OP_COMPRESSED id-3 peer; it is
  * also exactly what zstd itself emits for incompressible data (raw
  * blocks). On decode, Raw and RLE blocks are handled and Compressed
  * blocks refuse LOUDLY with a message naming the limitation — full
  * zstd decompression is FSE + Huffman (RFC 8878 §4) and out of
  * scope; a silent mis-parse is the one unacceptable outcome.
  *
  * Frame layout spoken here (RFC 8878 §3.1.1):
  * {{{
  *   magic 0xFD2FB528 (LE)
  *   Frame_Header_Descriptor:
  *     bits 7-6 Frame_Content_Size_flag   bits 1-0 Dictionary_ID_flag
  *     bit 5    Single_Segment_flag       bit 2    Content_Checksum_flag
  *     bit 4    Unused / bit 3 Reserved (must be 0)
  *   [Window_Descriptor]   — absent when Single_Segment
  *   [Frame_Content_Size]  — 1/2/4/8 bytes LE per the flag
  *                           (2-byte form stores size - 256)
  *   blocks: 3-byte LE header — bit 0 Last_Block, bits 1-2 Block_Type
  *           (0 Raw, 1 RLE, 2 Compressed, 3 Reserved), bits 3+ size
  * }}}
  * Emitted frames are single-segment, explicit content size, no
  * dictionary, no checksum, Raw blocks of ≤ 128 KiB
  * (Block_Maximum_Size). Decoded frames may carry a window descriptor
  * (ignored — store mode needs no window) and RLE blocks; dictionary,
  * checksum, Compressed, and Reserved refuse. */
object Zstd {
  private val Magic = 0xFD2FB528
  private val MaxBlock = 128 * 1024
  private val MaxLen = 1 << 30

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"zstd: $msg")

  def compress(in: Array[Byte]): Array[Byte] = {
    require(in.length <= MaxLen, s"input too large (${in.length})")
    val n = in.length
    // FCS flag sized to the content (§3.1.1.1.1): single-segment makes
    // the 1-byte form available at flag 0
    val (fcsFlag, fcsBytes) =
      if (n <= 0xFF) (0, 1) else if (n - 256 <= 0xFFFF) (1, 2) else (2, 4)
    val blocks = math.max(1, (n + MaxBlock - 1) / MaxBlock)
    val out = new java.io.ByteArrayOutputStream(n + 4 + 1 + fcsBytes + 3 * blocks)
    def le(v: Int, bytes: Int): Unit = {
      var i = 0
      while (i < bytes) { out.write((v >>> (8 * i)) & 0xFF); i += 1 }
    }
    le(Magic, 4)
    out.write((fcsFlag << 6) | 0x20) // Single_Segment, no dict/checksum
    fcsFlag match {
      case 0 => le(n, 1)
      case 1 => le(n - 256, 2)
      case _ => le(n, 4)
    }
    var p = 0
    var emitted = 0
    while (p < n || emitted == 0) { // empty input still needs one block
      val len = math.min(MaxBlock, n - p)
      val last = if (p + len >= n) 1 else 0
      le(last | (len << 3), 3)      // type bits 1-2 = 0 (Raw)
      out.write(in, p, len)
      p += len
      emitted += 1
    }
    out.toByteArray
  }

  def uncompress(in: Array[Byte]): Array[Byte] = {
    def le(o: Int, bytes: Int): Long = {
      if (o + bytes > in.length) fail("truncated frame")
      var v = 0L; var i = 0
      while (i < bytes) { v |= (in(o + i) & 0xFFL) << (8 * i); i += 1 }
      v
    }
    if (in.length < 5) fail("truncated frame")
    if (le(0, 4).toInt != Magic) fail(f"bad magic 0x${le(0, 4)}%08X")
    val desc = in(4) & 0xFF
    if ((desc & 0x08) != 0) fail("reserved descriptor bit set")
    if ((desc & 0x04) != 0) fail(
      "content-checksum frames not supported (store-mode decoder)")
    if ((desc & 0x03) != 0) fail(
      "dictionary frames not supported (store-mode decoder)")
    val single = (desc & 0x20) != 0
    val fcsFlag = (desc >>> 6) & 3
    var p = 5
    if (!single) p += 1 // Window_Descriptor — store mode needs no window
    val fcsSize = fcsFlag match {
      case 0 => if (single) 1 else 0
      case 1 => 2
      case 2 => 4
      case _ => 8
    }
    val declared: Long =
      if (fcsSize == 0) -1L
      else {
        val raw = le(p, fcsSize)
        p += fcsSize
        if (fcsFlag == 1) raw + 256 else raw
      }
    if (declared > MaxLen) fail(s"declared size $declared too large")
    val out = new java.io.ByteArrayOutputStream(
      if (declared >= 0) declared.toInt else math.min(in.length * 4, MaxLen))
    var last = false
    while (!last) {
      val h = le(p, 3).toInt; p += 3
      last = (h & 1) != 0
      val btype = (h >>> 1) & 3
      val size = h >>> 3
      if (out.size.toLong + size > MaxLen) fail("output exceeds bound")
      btype match {
        case 0 => // Raw: verbatim bytes
          if (p + size > in.length) fail("raw block past the input")
          out.write(in, p, size); p += size
        case 1 => // RLE: one byte repeated size times
          if (p >= in.length) fail("truncated RLE block")
          val b = in(p); p += 1
          var i = 0
          while (i < size) { out.write(b); i += 1 }
        case 2 => fail(
          "compressed blocks are not supported (store-mode decoder — " +
            "FSE/Huffman out of scope; negotiate snappy or zlib for " +
            "actual compression)")
        case _ => fail("reserved block type")
      }
    }
    if (p != in.length) fail(s"${in.length - p} trailing bytes after the frame")
    val res = out.toByteArray
    if (declared >= 0 && res.length != declared)
      fail(s"content size ${res.length} != declared $declared")
    res
  }
}
