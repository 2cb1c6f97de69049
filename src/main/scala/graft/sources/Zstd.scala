package graft.sources

/** RFC 8878 zstd — a complete from-scratch frame decoder AND a real
  * compressed-block encoder, built from the published spec (RFC 8878;
  * no codebase consulted).
  *
  * Why this exists: mongod negotiates `snappy|zlib|zstd` and, when
  * zstd is selected, sends OP_COMPRESSED id-3 payloads whose frames
  * carry genuinely *compressed* blocks — Huffman-coded literals and
  * FSE-coded sequences — never store-mode. A peer that can only parse
  * Raw/RLE blocks dies on the first real reply, so [[uncompress]]
  * implements the whole decode surface:
  *
  *   - frame header (single-segment or windowed, 1/2/4/8-byte
  *     content size, content checksum — verified with a from-scratch
  *     XXH64),
  *   - Raw / RLE / Compressed blocks,
  *   - literals: Raw, RLE, Huffman-compressed (direct or
  *     FSE-compressed weight description; 1-stream and 4-stream
  *     framing), and Treeless (previous block's table),
  *   - sequences: Predefined / RLE / FSE_Compressed / Repeat modes
  *     for each of the literals-length, offset and match-length
  *     channels, the three-slot repeat-offset history (including the
  *     litLen==0 shift and the `rep1 - 1` corner), and overlapping
  *     match copies.
  *
  * Dictionary frames decode too (round 11): [[parseDictionary]] reads
  * the RFC 8878 §5 format — magic, id, the four entropy tables in
  * their fixed order, the three recent offsets, content — and
  * [[uncompress]] with a [[Dict]] preloads the window, the
  * Treeless/Repeat table seeds and the rep offsets; raw-content blobs
  * (no magic) window-prefix, libzstd's own fallback rule. The only
  * refusals left are checksum MISMATCHES and a dictionary frame
  * without (or with the wrong) dictionary; both name the cause and
  * the ids. Decoding is validated property-style against real frames
  * produced by zstd-jni and the zstd CLI across levels and block
  * shapes, including trained-dictionary frames (ZstdSpec).
  *
  * Encoding comes in two shapes:
  *   - [[compress]]: store-mode (Raw blocks ≤ 128 KiB) — a legal zstd
  *     frame any conforming decoder inflates, exactly what zstd itself
  *     emits for incompressible input; the predictable allocation-light
  *     form.
  *   - [[compressFrame]]: REAL compression — greedy LZ77 sequences
  *     coded with the predefined FSE distributions over Raw literals,
  *     per-block Raw fallback when a block does not shrink. Frames are
  *     round-tripped against the real libzstd (zstd-jni + the zstd
  *     CLI) in ZstdSpec; the OP_COMPRESSED wire path sends these, so
  *     BOTH directions of the wire run on this file alone.
  */
object Zstd {
  private val Magic = 0xFD2FB528
  private val MaxBlock = 128 * 1024
  private val MaxLen = 1 << 30

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"zstd: $msg")

  // ---------------------------------------------------------------- encode

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

  // ----------------------------------------------------------- bit streams

  /** Backward bitstream (§3.1.1.4): bytes are consumed last-to-first;
    * the final byte carries a sentinel 1 above the payload bits. Reads
    * return the next `n` bits MSB-first; reads past the start zero-fill
    * the LOW bits and mark the stream overflowed (the FSE termination
    * signal). */
  private final class BackBits(buf: Array[Byte], from: Int, until: Int) {
    private var r: Int = {
      if (until <= from) fail("empty bitstream")
      val lastB = buf(until - 1) & 0xFF
      if (lastB == 0) fail("bitstream missing its sentinel bit")
      8 * (until - 1 - from) + (31 - Integer.numberOfLeadingZeros(lastB))
    }
    def remaining: Int = r
    def overflowed: Boolean = r < 0
    def read(n: Int): Int = { val v = peek(n); r -= n; v }
    def skip(n: Int): Unit = r -= n
    def peek(n: Int): Int = {
      if (n == 0) 0
      else {
        val lo = r - n
        if (lo >= 0) extract(lo, n)
        else if (r <= 0) 0
        else extract(0, r) << (n - r)
      }
    }
    private def extract(pos: Int, n: Int): Int = {
      var v = 0L
      val first = pos >>> 3
      var i = (pos + n - 1) >>> 3
      while (i >= first) { v = (v << 8) | (buf(from + i) & 0xFFL); i -= 1 }
      ((v >>> (pos & 7)) & ((1L << n) - 1)).toInt
    }
  }

  /** Forward LSB-first bitstream — only the FSE table description
    * (§4.1.1) reads this way. Reads past `until` zero-fill (the
    * description is byte-padded; sum checks catch real corruption). */
  private final class FwdBits(buf: Array[Byte], from: Int, until: Int) {
    private var pos = 0
    def read(n: Int): Int = { val v = peek(n); pos += n; v }
    def skip(n: Int): Unit = pos += n
    def peek(n: Int): Int = {
      if (n == 0) return 0
      var v = 0L
      val first = from + (pos >>> 3)
      var i = from + ((pos + n - 1) >>> 3)
      while (i >= first) {
        v = (v << 8) | (if (i < until) buf(i) & 0xFFL else 0L); i -= 1
      }
      ((v >>> (pos & 7)) & ((1L << n) - 1)).toInt
    }
    def bytesConsumed: Int = (pos + 7) >>> 3
  }

  // ------------------------------------------------------------------- FSE

  /** A built FSE decoding table: `state` indexes all three arrays. */
  private final class FseTable(val accuracyLog: Int, val symbol: Array[Int],
                               val nbBits: Array[Int], val newState: Array[Int])

  /** Single-symbol table (RLE mode / accuracy log 0): state is always
    * 0 and updates read no bits. */
  private def rleFse(sym: Int): FseTable =
    new FseTable(0, Array(sym), Array(0), Array(0))

  private def highBit(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)

  /** Parse an FSE distribution (§4.1.1) and build its decoding table.
    * Returns the table and the byte length of the description. */
  private def readFseTable(buf: Array[Byte], from: Int, until: Int,
                           maxSymbol: Int, maxLog: Int): (FseTable, Int) = {
    val fb = new FwdBits(buf, from, until)
    val al = 5 + fb.read(4)
    if (al > maxLog) fail(s"FSE accuracy log $al exceeds the channel max $maxLog")
    var remaining = (1 << al) + 1
    var threshold = 1 << al
    var nb = al + 1
    val counts = new Array[Int](maxSymbol + 1)
    var charnum = 0
    var previous0 = false
    while (remaining > 1) {
      if (charnum > maxSymbol) fail("FSE distribution has too many symbols")
      if (previous0) {
        var f = fb.read(2)
        while (f == 3) {
          charnum += 3
          if (charnum > maxSymbol) fail("FSE zero-run past the symbol range")
          f = fb.read(2)
        }
        charnum += f
        if (charnum > maxSymbol) fail("FSE zero-run past the symbol range")
      }
      // value coding: small values use nbBits-1; the fold constant is
      // max = (2*threshold - 1) - remaining
      val max = (2 * threshold - 1) - remaining
      val low = fb.peek(nb - 1)
      var count =
        if (low < max) { fb.skip(nb - 1); low }
        else {
          var c = fb.peek(nb)
          if (c >= threshold) c -= max
          fb.skip(nb); c
        }
      count -= 1 // stored +1; -1 encodes the "less than 1" probability
      remaining -= math.abs(count)
      if (remaining < 1) fail("FSE distribution exceeds the table size")
      counts(charnum) = count
      charnum += 1
      previous0 = count == 0
      while (remaining < threshold) { nb -= 1; threshold >>>= 1 }
    }
    if (remaining != 1) fail("FSE distribution does not sum to the table size")
    (buildFse(counts, al), fb.bytesConsumed)
  }

  /** Normalized counts → decoding table (§4.1.1: low-probability cells
    * at the tail, spread step (size/2 + size/8 + 3)). */
  private def buildFse(counts: Array[Int], al: Int): FseTable = {
    val size = 1 << al
    val symbols = new Array[Int](size)
    val nbBits = new Array[Int](size)
    val newState = new Array[Int](size)
    val symbolNext = new Array[Int](counts.length)
    var highThreshold = size - 1
    var s = 0
    while (s < counts.length) {
      if (counts(s) == -1) {
        symbols(highThreshold) = s; highThreshold -= 1; symbolNext(s) = 1
      } else symbolNext(s) = counts(s)
      s += 1
    }
    val step = (size >>> 1) + (size >>> 3) + 3
    var pos = 0
    s = 0
    while (s < counts.length) {
      var i = 0
      while (i < counts(s)) {
        symbols(pos) = s
        pos = (pos + step) & (size - 1)
        while (pos > highThreshold) pos = (pos + step) & (size - 1)
        i += 1
      }
      s += 1
    }
    if (pos != 0) fail("FSE table spread did not close")
    var u = 0
    while (u < size) {
      val sym = symbols(u)
      val next = symbolNext(sym); symbolNext(sym) += 1
      val nbb = al - highBit(next)
      nbBits(u) = nbb
      newState(u) = (next << nbb) - size
      u += 1
    }
    new FseTable(al, symbols, nbBits, newState)
  }

  // --------------------------------------------------------------- Huffman

  private final class HufTable(val tableLog: Int, val symbol: Array[Int],
                               val nbBits: Array[Int])

  /** Explicit weights (last symbol's weight implicit) → decode table
    * (§4.2.1): each symbol of weight w fills 2^(w-1) consecutive cells,
    * longest codes first, ascending symbol within a weight. */
  private def hufFromWeights(explicit: Array[Int]): HufTable = {
    var sum = 0L
    var i = 0
    while (i < explicit.length) {
      val w = explicit(i)
      if (w > 11) fail(s"huffman weight $w exceeds the 11-bit code cap")
      if (w > 0) sum += 1L << (w - 1)
      i += 1
    }
    if (sum == 0) fail("huffman weights are all zero")
    val tableLog = 64 - java.lang.Long.numberOfLeadingZeros(sum) // highBit+1
    if (tableLog > 11) fail("huffman table log exceeds 11")
    val missing = (1L << tableLog) - sum
    if (missing <= 0 || (missing & (missing - 1)) != 0)
      fail("huffman weights do not complete to a power of two")
    val lastW = 64 - java.lang.Long.numberOfLeadingZeros(missing) // log2+1
    val weights = explicit :+ lastW.toInt
    val size = 1 << tableLog
    val symbols = new Array[Int](size)
    val nbBits = new Array[Int](size)
    // rank starts: weight-1 (longest codes) fill from index 0
    val rankCount = new Array[Int](tableLog.toInt + 2)
    weights.foreach(w => if (w > 0) rankCount(w) += 1)
    val rankStart = new Array[Int](tableLog.toInt + 2)
    var cur = 0
    var w = 1
    while (w <= tableLog) {
      rankStart(w) = cur; cur += rankCount(w) << (w - 1); w += 1
    }
    var sym = 0
    while (sym < weights.length) {
      val wt = weights(sym)
      if (wt > 0) {
        val len = 1 << (wt - 1)
        val start = rankStart(wt)
        var k = 0
        while (k < len) {
          symbols(start + k) = sym
          nbBits(start + k) = tableLog.toInt + 1 - wt
          k += 1
        }
        rankStart(wt) += len
      }
      sym += 1
    }
    new HufTable(tableLog.toInt, symbols, nbBits)
  }

  /** Huffman tree description (§4.2.1.1): direct 4-bit weights when
    * headerByte ≥ 128, otherwise an FSE-compressed weight stream (two
    * interleaved states, accuracy ≤ 6). Returns (table, bytes read). */
  private def readHuffmanTree(buf: Array[Byte], from: Int, until: Int)
      : (HufTable, Int) = {
    if (from >= until) fail("truncated huffman tree description")
    val hb = buf(from) & 0xFF
    if (hb >= 128) {
      val n = hb - 127
      val bytes = (n + 1) / 2
      if (from + 1 + bytes > until) fail("truncated direct huffman weights")
      val ws = new Array[Int](n)
      var i = 0
      while (i < n) {
        val b = buf(from + 1 + (i >> 1)) & 0xFF
        ws(i) = if ((i & 1) == 0) (b >>> 4) & 0xF else b & 0xF
        i += 1
      }
      (hufFromWeights(ws), 1 + bytes)
    } else {
      val cSize = hb
      if (cSize == 0 || from + 1 + cSize > until)
        fail("truncated FSE-compressed huffman weights")
      val ws = readFseWeights(buf, from + 1, from + 1 + cSize)
      (hufFromWeights(ws), 1 + cSize)
    }
  }

  /** The FSE-compressed weight stream of one tree description (two
    * interleaved states, accuracy ≤ 6) — factored out so the encoder's
    * [[fseWeightsDesc]] can SELF-VERIFY its output byte-for-byte. */
  private def readFseWeights(buf: Array[Byte], from: Int,
                             until: Int): Array[Int] = {
    val (tab, descBytes) =
      readFseTable(buf, from, until, maxSymbol = 255, maxLog = 6)
    if (from + descBytes >= until)
      fail("huffman weight description ate its bitstream")
    val bits = new BackBits(buf, from + descBytes, until)
    var s1 = bits.read(tab.accuracyLog)
    var s2 = bits.read(tab.accuracyLog)
    if (bits.overflowed) fail("huffman weight bitstream too short")
    val ws = scala.collection.mutable.ArrayBuffer.empty[Int]
    var done = false
    while (!done) {
      if (ws.length > 253) fail("more than 255 huffman weights")
      ws += tab.symbol(s1)
      s1 = tab.newState(s1) + bits.read(tab.nbBits(s1))
      if (bits.overflowed) { ws += tab.symbol(s2); done = true }
      else {
        ws += tab.symbol(s2)
        s2 = tab.newState(s2) + bits.read(tab.nbBits(s2))
        if (bits.overflowed) { ws += tab.symbol(s1); done = true }
      }
    }
    ws.toArray
  }

  // ------------------------------------------------------------ dictionary

  private val DictMagic = 0xEC30A437

  /** A parsed zstd dictionary (RFC 8878 §5): its content preloads the
    * decoder window / encoder history, its entropy tables seed the
    * first block's Treeless-literals and Repeat-sequence modes, and
    * its three recent offsets replace the {1,4,8} defaults. A blob
    * without the dictionary magic is a RAW CONTENT dictionary (id 0,
    * window prefix only — libzstd's own fallback rule). */
  final class Dict private[Zstd] (
      val id: Long,
      private[Zstd] val huf: HufTable,
      private[Zstd] val ll: FseTable,
      private[Zstd] val of: FseTable,
      private[Zstd] val ml: FseTable,
      private[Zstd] val reps: Array[Long],
      private[Zstd] val content: Array[Byte]) {
    def contentLength: Int = content.length
  }

  def parseDictionary(d: Array[Byte]): Dict = {
    def le(o: Int, n: Int): Long = {
      if (o + n > d.length) fail("truncated dictionary")
      var v = 0L; var i = 0
      while (i < n) { v |= (d(o + i) & 0xFFL) << (8 * i); i += 1 }
      v
    }
    if (d.length < 8 || le(0, 4).toInt != DictMagic)
      return new Dict(0L, null, null, null, null,
        Array(1L, 4L, 8L), d.clone())
    val id = le(4, 4)
    if (id == 0) fail("dictionary id 0 is reserved")
    var p = 8
    // entropy tables, in the format's fixed order: Huffman (literals),
    // then FSE for offsets, match lengths, literal lengths
    val (huf, hb) = readHuffmanTree(d, p, d.length); p += hb
    val (of, ob) = readFseTable(d, p, d.length, maxSymbol = 31,
      maxLog = 8); p += ob
    val (ml, mb) = readFseTable(d, p, d.length, maxSymbol = 52,
      maxLog = 9); p += mb
    val (ll, lb) = readFseTable(d, p, d.length, maxSymbol = 35,
      maxLog = 9); p += lb
    val reps = Array(le(p, 4), le(p + 4, 4), le(p + 8, 4)); p += 12
    val content = java.util.Arrays.copyOfRange(d, p, d.length)
    reps.foreach { r =>
      if (r == 0 || r > content.length) fail(
        s"dictionary recent offset $r out of range " +
          s"(content is ${content.length} bytes)")
    }
    new Dict(id, huf, ll, of, ml, reps, content)
  }

  /** Decode exactly `n` bytes from one Huffman stream; the stream must
    * be consumed to the bit. */
  private def hufDecodeStream(tab: HufTable, buf: Array[Byte], from: Int,
                              until: Int, out: Array[Byte], outOff: Int,
                              n: Int): Unit = {
    val bits = new BackBits(buf, from, until)
    var i = 0
    while (i < n) {
      val idx = bits.peek(tab.tableLog)
      out(outOff + i) = tab.symbol(idx).toByte
      bits.skip(tab.nbBits(idx))
      i += 1
    }
    if (bits.remaining != 0)
      fail(s"huffman stream not fully consumed (${bits.remaining} bits left)")
  }

  // --------------------------------------------- sequence code tables (§3.1.1.3.2.1)

  private val LlBase = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536)
  private val LlExtra = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
  private val MlBase = Array(
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18,
    19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539)
  private val MlExtra = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  // predefined distributions (§3.1.1.3.2.2) — shared by the decode
  // tables and the encoder's CTables (identical spread ⇒ states align)
  private val LlDist = Array(
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
    -1, -1, -1, -1)
  private val MlDist = Array(
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
    -1, -1, -1, -1, -1)
  private val OfDist = Array(
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)
  private lazy val PredefLl = buildFse(LlDist, 6)
  private lazy val PredefMl = buildFse(MlDist, 6)
  private lazy val PredefOf = buildFse(OfDist, 5)

  // ------------------------------------------------------------ frame state

  /** Cross-block decode state within one frame: the previous Huffman
    * table (Treeless literals), the previous FSE table per sequence
    * channel (Repeat mode), and the repeat-offset history. */
  private final class FrameState {
    var huf: HufTable = null
    var ll: FseTable = null
    var of: FseTable = null
    var ml: FseTable = null
    var rep1 = 1L; var rep2 = 4L; var rep3 = 8L
  }

  /** Growable output that exposes its backing array — sequence match
    * copies need random access to earlier output. */
  private final class Out(hint: Int) {
    var buf = new Array[Byte](math.max(math.min(hint, MaxLen), 64))
    var n = 0
    def ensure(extra: Int): Unit = {
      if (n.toLong + extra > MaxLen) fail("output exceeds bound")
      if (n + extra > buf.length) {
        var cap = buf.length.toLong * 2
        while (cap < n.toLong + extra) cap *= 2
        buf = java.util.Arrays.copyOf(buf, math.min(cap, MaxLen.toLong).toInt)
      }
    }
    def append(src: Array[Byte], off: Int, len: Int): Unit = {
      ensure(len); System.arraycopy(src, off, buf, n, len); n += len
    }
    def result: Array[Byte] =
      if (n == buf.length) buf else java.util.Arrays.copyOf(buf, n)
  }

  // ------------------------------------------------------------ literals

  /** Decode a block's literals section. Returns (literals, bytes read
    * from the block). */
  private def decodeLiterals(in: Array[Byte], p0: Int, blockEnd: Int,
                             st: FrameState): (Array[Byte], Int) = {
    def le(o: Int, bytes: Int): Long = {
      if (o + bytes > blockEnd) fail("truncated literals header")
      var v = 0L; var i = 0
      while (i < bytes) { v |= (in(o + i) & 0xFFL) << (8 * i); i += 1 }
      v
    }
    if (p0 >= blockEnd) fail("missing literals section")
    val b0 = in(p0) & 0xFF
    val btype = b0 & 3
    val sizeFormat = (b0 >>> 2) & 3
    btype match {
      case 0 | 1 => // Raw | RLE
        val (regen, hdr) = sizeFormat match {
          case 0 | 2 => (b0 >>> 3, 1)
          case 1     => ((le(p0, 2) >>> 4).toInt, 2)
          case _     => ((le(p0, 3) >>> 4).toInt, 3)
        }
        if (regen > MaxBlock) fail("literals exceed the block maximum")
        if (btype == 0) {
          if (p0 + hdr + regen > blockEnd) fail("raw literals past the block")
          val lits = java.util.Arrays.copyOfRange(in, p0 + hdr, p0 + hdr + regen)
          (lits, hdr + regen)
        } else {
          if (p0 + hdr >= blockEnd) fail("truncated RLE literals")
          val lits = new Array[Byte](regen)
          java.util.Arrays.fill(lits, in(p0 + hdr))
          (lits, hdr + 1)
        }
      case _ => // Compressed | Treeless
        val (hdr, streams, szBits) = sizeFormat match {
          case 0 => (3, 1, 10)
          case 1 => (3, 4, 10)
          case 2 => (4, 4, 14)
          case _ => (5, 4, 18)
        }
        val h = le(p0, hdr)
        val mask = (1 << szBits) - 1
        val regen = ((h >>> 4) & mask).toInt
        val cSize = ((h >>> (4 + szBits)) & mask).toInt
        if (regen > MaxBlock) fail("literals exceed the block maximum")
        var p = p0 + hdr
        val end = p + cSize
        if (end > blockEnd) fail("compressed literals past the block")
        val huf =
          if (btype == 2) {
            val (t, treeBytes) = readHuffmanTree(in, p, end)
            p += treeBytes; st.huf = t; t
          } else {
            if (st.huf == null)
              fail("treeless literals with no previous huffman table")
            st.huf
          }
        val lits = new Array[Byte](regen)
        if (streams == 1) hufDecodeStream(huf, in, p, end, lits, 0, regen)
        else {
          if (p + 6 > end) fail("truncated 4-stream jump table")
          val s1 = (le(p, 2)).toInt; val s2 = (le(p + 2, 2)).toInt
          val s3 = (le(p + 4, 2)).toInt
          p += 6
          val s4 = (end - p) - s1 - s2 - s3
          if (s4 <= 0) fail("4-stream sizes exceed the section")
          val part = (regen + 3) / 4
          val last = regen - 3 * part
          if (last < 0) fail("4-stream regenerated sizes are inconsistent")
          hufDecodeStream(huf, in, p, p + s1, lits, 0, part)
          hufDecodeStream(huf, in, p + s1, p + s1 + s2, lits, part, part)
          hufDecodeStream(huf, in, p + s1 + s2, p + s1 + s2 + s3, lits,
            2 * part, part)
          hufDecodeStream(huf, in, p + s1 + s2 + s3, end, lits, 3 * part, last)
        }
        (lits, hdr + cSize)
    }
  }

  // ------------------------------------------------------------ sequences

  /** Decode and execute a compressed block (§3.1.1.3). */
  private def decodeCompressedBlock(in: Array[Byte], from: Int, until: Int,
                                    out: Out, st: FrameState): Unit = {
    val (lits, litBytes) = decodeLiterals(in, from, until, st)
    var p = from + litBytes
    if (p >= until) fail("missing sequences section")
    val b0 = in(p) & 0xFF
    var nbSeq = 0
    if (b0 == 0) { nbSeq = 0; p += 1 }
    else if (b0 < 128) { nbSeq = b0; p += 1 }
    else if (b0 < 255) {
      if (p + 2 > until) fail("truncated sequence count")
      nbSeq = ((b0 - 128) << 8) + (in(p + 1) & 0xFF); p += 2
    } else {
      if (p + 3 > until) fail("truncated sequence count")
      nbSeq = (in(p + 1) & 0xFF) + ((in(p + 2) & 0xFF) << 8) + 0x7F00; p += 3
    }
    if (nbSeq == 0) {
      if (p != until) fail("trailing bytes after an all-literals block")
      out.append(lits, 0, lits.length)
      return
    }
    if (p >= until) fail("missing compression modes byte")
    val modes = in(p) & 0xFF; p += 1
    if ((modes & 3) != 0) fail("reserved compression-mode bits set")
    def channel(mode: Int, prev: FseTable, predef: FseTable, maxSym: Int,
                maxLog: Int): FseTable = mode match {
      case 0 => predef
      case 1 =>
        if (p >= until) fail("truncated RLE sequence symbol")
        val sym = in(p) & 0xFF; p += 1
        if (sym > maxSym) fail(s"RLE sequence symbol $sym out of range")
        rleFse(sym)
      case 2 =>
        val (t, bytes) = readFseTable(in, p, until, maxSym, maxLog)
        p += bytes; t
      case _ =>
        if (prev == null) fail("Repeat sequence mode with no previous table")
        prev
    }
    // descriptions appear in LL, OF, ML order
    val llTab = channel((modes >>> 6) & 3, st.ll, PredefLl, 35, 9)
    val ofTab = channel((modes >>> 4) & 3, st.of, PredefOf, 31, 8)
    val mlTab = channel((modes >>> 2) & 3, st.ml, PredefMl, 52, 9)
    st.ll = llTab; st.of = ofTab; st.ml = mlTab
    val bits = new BackBits(in, p, until)
    var llState = bits.read(llTab.accuracyLog)
    var ofState = bits.read(ofTab.accuracyLog)
    var mlState = bits.read(mlTab.accuracyLog)
    if (bits.overflowed) fail("sequence bitstream too short for its states")
    var litPos = 0
    var i = 0
    while (i < nbSeq) {
      // extra bits read in OF, ML, LL order; states update LL, ML, OF
      val ofCode = ofTab.symbol(ofState)
      if (ofCode > 31) fail(s"offset code $ofCode out of range")
      val ofValue = (1L << ofCode) + (
        if (ofCode > 0) bits.read(ofCode).toLong & 0xFFFFFFFFL else 0L)
      val mlCode = mlTab.symbol(mlState)
      val ml = MlBase(mlCode) + bits.read(MlExtra(mlCode))
      val llCode = llTab.symbol(llState)
      val ll = LlBase(llCode) + bits.read(LlExtra(llCode))
      if (bits.overflowed) fail("sequence bitstream exhausted mid-sequence")
      // repeat-offset resolution (§3.1.1.5)
      var offset = 0L
      if (ofValue > 3) {
        offset = ofValue - 3
        st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = offset
      } else if (ll != 0) {
        ofValue.toInt match {
          case 1 => offset = st.rep1
          case 2 =>
            offset = st.rep2; st.rep2 = st.rep1; st.rep1 = offset
          case _ =>
            offset = st.rep3; st.rep3 = st.rep2; st.rep2 = st.rep1
            st.rep1 = offset
        }
      } else {
        ofValue.toInt match {
          case 1 =>
            offset = st.rep2; st.rep2 = st.rep1; st.rep1 = offset
          case 2 =>
            offset = st.rep3; st.rep3 = st.rep2; st.rep2 = st.rep1
            st.rep1 = offset
          case _ =>
            offset = st.rep1 - 1
            if (offset <= 0) fail("repeat offset underflowed to zero")
            st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = offset
        }
      }
      if (i < nbSeq - 1) {
        llState = llTab.newState(llState) + bits.read(llTab.nbBits(llState))
        mlState = mlTab.newState(mlState) + bits.read(mlTab.nbBits(mlState))
        ofState = ofTab.newState(ofState) + bits.read(ofTab.nbBits(ofState))
        if (bits.overflowed) fail("sequence bitstream exhausted mid-update")
      }
      // execute: literals run, then the (possibly overlapping) match
      if (litPos + ll > lits.length) fail("sequence literals overrun")
      out.append(lits, litPos, ll)
      litPos += ll
      if (offset > out.n) fail(
        "match offset reaches before the window (frame content plus " +
          "any dictionary prefix)")
      out.ensure(ml)
      var k = 0
      val src = out.n - offset.toInt
      while (k < ml) { out.buf(out.n + k) = out.buf(src + k); k += 1 }
      out.n += ml
      i += 1
    }
    if (bits.remaining != 0)
      fail(s"sequence bitstream not fully consumed (${bits.remaining} bits)")
    out.append(lits, litPos, lits.length - litPos)
  }

  // ---------------------------------------------------------------- XXH64

  /** xxHash64 (public algorithm, Yann Collet) — the frame content
    * checksum is its low 32 bits. Implemented from the published
    * description; pinned against the spec's own vectors in ZstdSpec. */
  private[sources] def xxh64(buf: Array[Byte], len: Int, seed: Long): Long = {
    val P1 = -7046029288634856825L // 0x9E3779B185EBCA87
    val P2 = -4417276706812531889L // 0xC2B2AE3D27D4EB4F
    val P3 = 1609587929392839161L  // 0x165667B19E3779F9
    val P4 = -8796714831421723037L // 0x85EBCA77C2B2AE63
    val P5 = 2870177450012600261L  // 0x27D4EB2F165667C5
    def le64(o: Int): Long = {
      var v = 0L; var i = 7
      while (i >= 0) { v = (v << 8) | (buf(o + i) & 0xFFL); i -= 1 }
      v
    }
    def le32(o: Int): Long = {
      var v = 0L; var i = 3
      while (i >= 0) { v = (v << 8) | (buf(o + i) & 0xFFL); i -= 1 }
      v
    }
    def round(acc: Long, lane: Long): Long =
      java.lang.Long.rotateLeft(acc + lane * P2, 31) * P1
    var p = 0
    var h = 0L
    if (len >= 32) {
      var v1 = seed + P1 + P2; var v2 = seed + P2; var v3 = seed
      var v4 = seed - P1
      while (p + 32 <= len) {
        v1 = round(v1, le64(p)); v2 = round(v2, le64(p + 8))
        v3 = round(v3, le64(p + 16)); v4 = round(v4, le64(p + 24))
        p += 32
      }
      h = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
        java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
      h = (h ^ round(0L, v1)) * P1 + P4
      h = (h ^ round(0L, v2)) * P1 + P4
      h = (h ^ round(0L, v3)) * P1 + P4
      h = (h ^ round(0L, v4)) * P1 + P4
    } else h = seed + P5
    h += len
    while (p + 8 <= len) {
      h = java.lang.Long.rotateLeft(h ^ round(0L, le64(p)), 27) * P1 + P4
      p += 8
    }
    if (p + 4 <= len) {
      h = java.lang.Long.rotateLeft(h ^ (le32(p) * P1), 23) * P2 + P3
      p += 4
    }
    while (p < len) {
      h = java.lang.Long.rotateLeft(h ^ ((buf(p) & 0xFFL) * P5), 11) * P1
      p += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  // --------------------------------------------------- compressed-block encode

  /** Forward little-endian bit writer (§3.1.1.4's write side): values
    * append at the low end; close() adds the sentinel 1 the backward
    * reader anchors on. */
  private final class FwdBitWriter(hint: Int) {
    private var buf = new Array[Byte](math.max(hint, 64))
    private var acc = 0L
    private var nbits = 0
    private var n = 0
    def add(value: Long, bits: Int): Unit = {
      acc |= (value & ((1L << bits) - 1)) << nbits
      nbits += bits
      while (nbits >= 8) {
        if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n * 2)
        buf(n) = acc.toByte; n += 1; acc >>>= 8; nbits -= 8
      }
    }
    def close(): Array[Byte] = {
      add(1L, 1)
      closeRaw()
    }
    /** No sentinel bit, zero-padded to a byte — FORWARD-read payloads
      * (the FSE normalized-count header), where close()'s backward
      * sentinel would corrupt the stream. */
    def closeRaw(): Array[Byte] = {
      if (nbits > 0) {
        if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n + 1)
        buf(n) = acc.toByte; n += 1; acc = 0; nbits = 0
      }
      java.util.Arrays.copyOf(buf, n)
    }
  }

  /** One sequence channel's encoder: FSE states or the RLE no-op. */
  private trait SeqEnc {
    def init(s: Int): Int
    def encode(w: FwdBitWriter, state: Int, s: Int): Int
    def flush(w: FwdBitWriter, state: Int): Unit
  }

  /** RLE-mode channel (one byte names the symbol): the decoder reads
    * ZERO bits for init and updates, so the encoder writes none. */
  private object RleEnc extends SeqEnc {
    def init(s: Int): Int = 0
    def encode(w: FwdBitWriter, state: Int, s: Int): Int = 0
    def flush(w: FwdBitWriter, state: Int): Unit = ()
  }

  /** FSE ENCODING table for a normalized distribution — the write-side
    * twin of [[buildFse]] (same spread, so decoder states line up).
    * State values live in [tableSize, 2·tableSize): flushing writes the
    * low accuracyLog bits, which is the decoder's init read. */
  private final class FseEnc(counts: Array[Int], al: Int) extends SeqEnc {
    private val tableSize = 1 << al
    private val stateTable = new Array[Int](tableSize)
    private val deltaNbBits = new Array[Int](counts.length)
    private val deltaFindState = new Array[Int](counts.length)
    locally {
      // spread identical to the decoder's
      val symbols = new Array[Int](tableSize)
      var highThreshold = tableSize - 1
      var s = 0
      while (s < counts.length) {
        if (counts(s) == -1) { symbols(highThreshold) = s; highThreshold -= 1 }
        s += 1
      }
      val step = (tableSize >>> 1) + (tableSize >>> 3) + 3
      var pos = 0
      s = 0
      while (s < counts.length) {
        var i = 0
        while (i < counts(s)) {
          symbols(pos) = s
          pos = (pos + step) & (tableSize - 1)
          while (pos > highThreshold) pos = (pos + step) & (tableSize - 1)
          i += 1
        }
        s += 1
      }
      val cumul = new Array[Int](counts.length)
      var c = 0
      s = 0
      while (s < counts.length) {
        cumul(s) = c; c += math.abs(counts(s)); s += 1
      }
      var u = 0
      while (u < tableSize) {
        val sym = symbols(u)
        stateTable(cumul(sym)) = tableSize + u
        cumul(sym) += 1
        u += 1
      }
      var total = 0
      s = 0
      while (s < counts.length) {
        counts(s) match {
          case 0 => ()
          case -1 | 1 =>
            deltaNbBits(s) = (al << 16) - tableSize
            deltaFindState(s) = total - 1
            total += 1
          case cnt =>
            val maxBitsOut = al - highBit(cnt - 1)
            deltaNbBits(s) = (maxBitsOut << 16) - (cnt << maxBitsOut)
            deltaFindState(s) = total - cnt
            total += cnt
        }
        s += 1
      }
    }
    def init(s: Int): Int = {
      val nbBitsOut = (deltaNbBits(s) + (1 << 15)) >>> 16
      val v = (nbBitsOut << 16) - deltaNbBits(s)
      stateTable((v >>> nbBitsOut) + deltaFindState(s))
    }
    def encode(w: FwdBitWriter, state: Int, s: Int): Int = {
      val nbBits = (state + deltaNbBits(s)) >>> 16
      w.add(state.toLong, nbBits)
      stateTable((state >>> nbBits) + deltaFindState(s))
    }
    def flush(w: FwdBitWriter, state: Int): Unit = w.add(state.toLong, al)
  }

  private lazy val EncLl = new FseEnc(LlDist, 6)
  private lazy val EncMl = new FseEnc(MlDist, 6)
  private lazy val EncOf = new FseEnc(OfDist, 5)

  private def llCodeOf(v: Int): Int =
    if (v < 16) v else { var c = 35; while (LlBase(c) > v) c -= 1; c }
  private def mlCodeOf(v: Int): Int =
    if (v <= 34) v - 3 else { var c = 52; while (MlBase(c) > v) c -= 1; c }

  /** Huffman-encode a block's literals (§4.2.1 write side): canonical
    * length-limited (≤11) code from byte frequencies, the DIRECT
    * 4-bit-weight tree description, and 1- or 4-stream framing by
    * size. Returns the full literals section (header + tree + streams)
    * or None when Huffman would not beat Raw literals (tiny inputs,
    * flat distributions, a last-present-byte ≥ 128 — the direct weight
    * form carries at most 127 explicit weights). */
  private def huffLiterals(lits: Array[Byte]): Option[Array[Byte]] = {
    val n = lits.length
    if (n < 64 || n > MaxBlock) return None
    val freq = new Array[Int](256)
    var i = 0
    while (i < n) { freq(lits(i) & 0xFF) += 1; i += 1 }
    var last = 255
    while (last >= 0 && freq(last) == 0) last -= 1
    val present = (0 to last).filter(freq(_) > 0)
    if (present.length < 2) return None // single symbol → RLE literals
    // ---- code lengths: standard Huffman, then Kraft repair to ≤11 ----
    val MaxBits = 11
    val nbBits = new Array[Int](last + 1)
    locally {
      // heap-free Huffman over ≤256 symbols: repeatedly merge the two
      // smallest trees (O(D²) is fine at D ≤ 256)
      case class T(w: Long, syms: List[Int])
      var trees = present.map(s => T(freq(s).toLong, List(s))).toBuffer
      while (trees.length > 1) {
        val a = trees.minBy(_.w); trees -= a
        val b = trees.minBy(_.w); trees -= b
        (a.syms ++ b.syms).foreach(s => nbBits(s) += 1)
        trees += T(a.w + b.w, a.syms ++ b.syms)
      }
      // limit depth, then repair the Kraft sum to EXACTLY one (the
      // format needs a full tree); scale 2^-d by K = 2^MaxBits
      present.foreach(s => nbBits(s) = math.min(nbBits(s), MaxBits))
      val unit = 1 << MaxBits
      def kraft = present.map(s => unit >> nbBits(s)).sum
      val byFreqAsc = present.sortBy(freq(_))
      var k = kraft
      while (k > unit) { // over-full: lengthen the cheapest codes
        val s = byFreqAsc.find(nbBits(_) < MaxBits).getOrElse(return None)
        nbBits(s) += 1
        k -= unit >> nbBits(s)
      }
      // under-full: shorten the most frequent codes while room remains
      var j = byFreqAsc.length - 1
      while (k < unit && j >= 0) {
        val s = byFreqAsc(j)
        while (nbBits(s) > 1 && k + (unit >> nbBits(s)) <= unit) {
          k += unit >> nbBits(s)
          nbBits(s) -= 1
        }
        j -= 1
      }
      if (k != unit) return None // could not complete the tree
    }
    val maxBits = present.map(nbBits(_)).max
    // weights (0 for absent symbols); the LAST present symbol's weight
    // is implicit in the description
    val weights = (0 to last).map(s =>
      if (freq(s) == 0) 0 else maxBits + 1 - nbBits(s))
    // canonical codes exactly as the decode table fills: weight
    // ascending, symbol ascending within a weight; each symbol owns an
    // aligned slice of the 2^maxBits index space
    val codes = new Array[Int](last + 1)
    locally {
      var start = 0
      (1 to maxBits).foreach { w =>
        (0 to last).foreach { s =>
          if (weights(s) == w) {
            codes(s) = start >> (maxBits - nbBits(s))
            start += 1 << (w - 1)
          }
        }
      }
    }
    def encStream(fromI: Int, untilI: Int): Array[Byte] = {
      val w = new FwdBitWriter((untilI - fromI) / 2 + 8)
      var i = untilI - 1 // reversed: the decoder reads first-to-last
      while (i >= fromI) {
        val s = lits(i) & 0xFF
        w.add(codes(s).toLong, nbBits(s))
        i -= 1
      }
      w.close()
    }
    // tree description: the SHORTER of the direct nibble form (only
    // expressible for ≤127 explicit weights) and the FSE-compressed
    // form (any alphabet — lifts the 127-symbol ceiling binary inputs
    // hit constantly: BSON wire bodies use bytes above 0x7F)
    val explicit = weights.take(last).toArray // symbols 0..last-1
    val direct: Option[Array[Byte]] =
      if (last > 127) None
      else {
        val tree = new java.io.ByteArrayOutputStream(1 + explicit.length / 2 + 1)
        tree.write(127 + explicit.length)
        var b = 0
        explicit.zipWithIndex.foreach { case (wt, idx) =>
          if (idx % 2 == 0) b = wt << 4
          else { tree.write(b | wt); b = 0 }
        }
        if (explicit.length % 2 == 1) tree.write(b)
        Some(tree.toByteArray)
      }
    val treeBytes = (direct.toSeq ++ fseWeightsDesc(explicit).toSeq)
      .minByOption(_.length).getOrElse(return None)
    val single = encStream(0, n)
    val oneStream = treeBytes.length + single.length
    val out = new java.io.ByteArrayOutputStream(oneStream + 8)
    if (n <= 1023 && oneStream <= 1023) {
      // Size_Format 00: 1 stream, 10-bit sizes, 3-byte header
      val h = 2 | (0 << 2) | (n << 4) | (oneStream << 14)
      out.write(h & 0xFF); out.write((h >>> 8) & 0xFF)
      out.write((h >>> 16) & 0xFF)
      out.write(treeBytes, 0, treeBytes.length)
      out.write(single, 0, single.length)
    } else {
      // 4 streams + jump table; header format by the larger size field
      val part = (n + 3) / 4
      val lastLen = n - 3 * part
      if (lastLen <= 0) return None
      val s1 = encStream(0, part)
      val s2 = encStream(part, 2 * part)
      val s3 = encStream(2 * part, 3 * part)
      val s4 = encStream(3 * part, n)
      if (s1.length > 0xFFFF || s2.length > 0xFFFF || s3.length > 0xFFFF)
        return None // jump-table entries are uint16
      val cSize = treeBytes.length + 6 +
        s1.length + s2.length + s3.length + s4.length
      val (fmt, hdr) =
        if (n <= 16383 && cSize <= 16383) (2, 4) else (3, 5)
      val h = 2L | (fmt.toLong << 2) | (n.toLong << 4) |
        (cSize.toLong << (4 + (if (fmt == 2) 14 else 18)))
      var k = 0
      while (k < hdr) { out.write(((h >>> (8 * k)) & 0xFF).toInt); k += 1 }
      out.write(treeBytes, 0, treeBytes.length)
      Seq(s1, s2, s3).foreach { s =>
        out.write(s.length & 0xFF); out.write((s.length >>> 8) & 0xFF)
      }
      Seq(s1, s2, s3, s4).foreach(s => out.write(s, 0, s.length))
    }
    Some(out.toByteArray).filter(_.length < n + 3) // beat Raw literals
  }

  /** Largest-remainder normalization of `freq` (sum `total`) to EXACTLY
    * `size` with every present symbol ≥ 1 — the count table an FSE
    * description needs. */
  private def normalizeCounts(freq: Array[Int], total: Int,
                              size: Int): Option[Array[Int]] = {
    if (freq.count(_ > 0) > size) return None
    val counts = new Array[Int](freq.length)
    var used = 0
    freq.indices.foreach { s =>
      if (freq(s) > 0) {
        counts(s) = math.max(1,
          math.round(freq(s).toDouble * size / total).toInt)
        used += counts(s)
      }
    }
    var guard = 4 * size
    while (used != size && guard > 0) {
      if (used > size) {
        val s = counts.indices.filter(counts(_) > 1)
          .maxByOption(counts(_)).getOrElse(return None)
        counts(s) -= 1; used -= 1
      } else {
        val s = counts.indices.maxBy(counts(_))
        counts(s) += 1; used += 1
      }
      guard -= 1
    }
    if (used == size) Some(counts) else None
  }

  /** Write an FSE normalized-count header (§4.1.1) — the byte-exact
    * inverse of [[readFseTable]]'s parser (same threshold walk, same
    * short-form rule, same 2-bit zero runs). */
  private def writeNcount(counts: Array[Int], al: Int): Array[Byte] = {
    val w = new FwdBitWriter(8)
    w.add((al - 5).toLong, 4)
    var remaining = (1 << al) + 1
    var threshold = 1 << al
    var nb = al + 1
    var charnum = 0
    var previous0 = false
    while (remaining > 1) {
      if (previous0) {
        var zeros = 0
        while (counts(charnum + zeros) == 0) zeros += 1
        while (zeros >= 3) { w.add(3L, 2); zeros -= 3; charnum += 3 }
        w.add(zeros.toLong, 2); charnum += zeros
      }
      val count = counts(charnum)
      val max = 2 * threshold - 1 - remaining
      var stored = count + 1
      if (stored >= threshold) stored += max
      if (stored < max) w.add(stored.toLong, nb - 1)
      else w.add(stored.toLong, nb)
      remaining -= math.abs(count)
      previous0 = count == 0
      charnum += 1
      while (remaining < threshold) { nb -= 1; threshold >>>= 1 }
    }
    w.closeRaw()
  }

  /** FSE-compressed tree description (§4.2.1.1, headerByte < 128):
    * the explicit weights entropy-coded with TWO interleaved FSE
    * states over a written normalized-count header. Decoder mapping:
    * state-1 carries the even weight positions, state-2 the odd ones;
    * transition bits are written in descending position order so the
    * backward reader consumes them ascending; state-2 then state-1
    * flush last (the decoder's two init reads). SELF-VERIFIED: the
    * section must re-decode through [[readFseWeights]] to the exact
    * weights (catches the 0-bit-update termination corner) or the
    * caller falls back to the direct/Raw forms. */
  private def fseWeightsDesc(explicit: Array[Int]): Option[Array[Byte]] = {
    val n = explicit.length
    if (n < 2) return None
    val freq = new Array[Int](explicit.max + 1)
    explicit.foreach(wt => freq(wt) += 1)
    if (freq.count(_ > 0) < 2) return None // degenerate: one weight value
    val al = 5
    val counts = normalizeCounts(freq, n, 1 << al).getOrElse(return None)
    val hdr = writeNcount(counts, al)
    val enc = new FseEnc(counts, al)
    val w = new FwdBitWriter(n / 2 + 8)
    val lastEven = if ((n - 1) % 2 == 0) n - 1 else n - 2
    val lastOdd = if ((n - 1) % 2 == 1) n - 1 else n - 2
    var stE = enc.init(explicit(lastEven))
    var stO = enc.init(explicit(lastOdd))
    var i = n - 3
    while (i >= 0) {
      if (i % 2 == 0) stE = enc.encode(w, stE, explicit(i))
      else stO = enc.encode(w, stO, explicit(i))
      i -= 1
    }
    enc.flush(w, stO)
    enc.flush(w, stE) // read first by the decoder (even chain = state 1)
    val stream = w.close()
    val cSize = hdr.length + stream.length
    if (cSize >= 128) return None
    val out = new Array[Byte](1 + cSize)
    out(0) = cSize.toByte
    System.arraycopy(hdr, 0, out, 1, hdr.length)
    System.arraycopy(stream, 0, out, 1 + hdr.length, stream.length)
    try {
      val back = readFseWeights(out, 1, out.length)
      if (back.length == n && back.sameElements(explicit)) Some(out)
      else None
    } catch { case _: IllegalArgumentException => None }
  }

  /** One compressed block over in[from, from+len): greedy LZ77 (4-byte
    * hash heads, in-block matches) → literals (Huffman when it wins,
    * RLE for single-byte runs, Raw otherwise) + sequences coded with
    * the PREDEFINED FSE distributions (compression-modes byte 0 —
    * no table descriptions, no cross-block table state; repeat-offset
    * codes are used only for slots THIS block's sequences established,
    * so the decoder's inherited history is never consulted). Returns
    * None when the block does not shrink. */
  private def compressBlock(in: Array[Byte], from: Int,
                            len: Int,
                            table: Array[Int]): Option[Array[Byte]] = {
    if (len < 32) return None
    val end = from + len
    def hash(p: Int): Int = {
      val v = (in(p) & 0xFF) | ((in(p + 1) & 0xFF) << 8) |
        ((in(p + 2) & 0xFF) << 16) | ((in(p + 3) & 0xFF) << 24)
      (v * -1640531535) >>> (32 - HashLog)
    }
    val MaxMl = 131074 // ML code 52's ceiling (65539 + 16 extra bits)
    val seqLl = new scala.collection.mutable.ArrayBuffer[Int]
    val seqMl = new scala.collection.mutable.ArrayBuffer[Int]
    val seqOf = new scala.collection.mutable.ArrayBuffer[Int]
    val lits = new java.io.ByteArrayOutputStream(len / 2)
    var anchor = from
    var p = from
    val limit = end - 8
    // (offset, length) of the acceptable match at q, or null — 4-byte
    // hash probe, extension, distance-aware acceptance (a far offset
    // costs ~highBit extra bits per sequence; spurious 4-byte matches
    // in skewed data would otherwise beat entropy coding down)
    def matchAt(q: Int): (Int, Int) = {
      // cross-block window: the frame is Single_Segment, so every
      // earlier position of the INPUT is in the decoder's window —
      // matches reach back through prior blocks (incl. Raw-emitted
      // ones), exactly what the decoder's threaded history replays
      val cand = table(hash(q)) - 1
      // offset ceiling: the predefined OF table's last code is 28, so
      // ofValue (= offset + 3) must stay below 2^29
      if (cand >= 0 && cand < q && q - cand <= (1 << 29) - 4 &&
          in(cand) == in(q) && in(cand + 1) == in(q + 1) &&
          in(cand + 2) == in(q + 2) && in(cand + 3) == in(q + 3)) {
        var ml0 = 4
        while (q + ml0 < end && ml0 < MaxMl && in(cand + ml0) == in(q + ml0))
          ml0 += 1
        if (ml0 >= (if (q - cand < 1024) 4
                    else if (q - cand < 65536) 5 else 6))
          (q - cand, ml0)
        else null
      } else null
    }
    while (p < limit) {
      val m = matchAt(p)
      table(hash(p)) = p + 1
      if (m == null) p += 1
      else {
        // 1-step lazy: a clearly longer match one byte later wins; the
        // current byte becomes a literal and the loop retries at p+1
        val defer = p + 1 < limit && {
          val m2 = matchAt(p + 1)
          m2 != null && m2._2 >= m._2 + 2
        }
        if (defer) p += 1
        else {
          val (off, ml) = m
          lits.write(in, anchor, p - anchor)
          seqLl += p - anchor
          seqMl += ml
          seqOf += off
          // seed hash heads THROUGHOUT the match region so later data
          // can match into it (every other position: ~half the insert
          // cost of the literal path for materially better candidates
          // than end-only seeding — measured 1.22→ on text)
          var sp = p + 1
          val seedEnd = math.min(p + ml, end - 4)
          while (sp < seedEnd) { table(hash(sp)) = sp + 1; sp += 2 }
          p += ml
          anchor = p
        }
      }
    }
    val nbSeq = seqLl.length
    if (nbSeq == 0) {
      // no matches: an all-literals compressed block still wins when
      // the byte distribution is skewed — Huffman literals + nbSeq 0
      return huffLiterals(java.util.Arrays.copyOfRange(in, from, end))
        .map { sec =>
          val o = new java.io.ByteArrayOutputStream(sec.length + 1)
          o.write(sec, 0, sec.length)
          o.write(0) // Number_of_Sequences = 0
          o.toByteArray
        }.filter(_.length < len)
    }
    lits.write(in, anchor, end - anchor)
    val litBytes = lits.toByteArray
    // repeat-offset codes, FORWARD pass (execution order — the decoder
    // replays these updates): a slot is usable only once THIS block's
    // own sequences established it, so the encoder never depends on
    // the decoder's inherited cross-block history. litLen==0 sequences
    // always take the literal form (the decoder's repcode mapping
    // shifts at ll==0; the >3 path updates identically either way).
    val ofValue = new Array[Int](nbSeq)
    locally {
      var r1 = 0; var r2 = 0; var r3 = 0
      var i = 0
      while (i < nbSeq) {
        val o = seqOf(i)
        val ll = seqLl(i)
        if (ll != 0 && o == r1 && r1 != 0) ofValue(i) = 1
        else {
          if (ll != 0 && o == r2 && r2 != 0) { ofValue(i) = 2 }
          else if (ll != 0 && o == r3 && r3 != 0) { ofValue(i) = 3 }
          else ofValue(i) = o + 3
          r3 = r2; r2 = r1; r1 = o
        }
        i += 1
      }
    }
    // sequence bitstream: written in REVERSE read order (decoder reads
    // backward) — init states from the LAST sequence, then extras
    // LL,ML,OF per sequence, updates OF,ML,LL walking backward, final
    // state flushes ML,OF,LL. Emitted TWICE when the block is big
    // enough to fit its own tables: once over the predefined
    // distributions (mode byte 0, no headers) and once over
    // block-FITTED FSE tables / RLE channels (FSE_Compressed mode,
    // written ncount headers) — the smaller section wins, which is how
    // text closes most of the gap to libzstd's entropy stage.
    val llCodes = Array.tabulate(nbSeq)(i => llCodeOf(seqLl(i)))
    val mlCodes = Array.tabulate(nbSeq)(i => mlCodeOf(seqMl(i)))
    val ofCodes = Array.tabulate(nbSeq)(i => highBit(ofValue(i)))
    def bitstream(eLl: SeqEnc, eMl: SeqEnc, eOf: SeqEnc): Array[Byte] = {
      val w = new FwdBitWriter(len / 4)
      val lastI = nbSeq - 1
      var stMl = eMl.init(mlCodes(lastI))
      var stOf = eOf.init(ofCodes(lastI))
      var stLl = eLl.init(llCodes(lastI))
      def addExtras(i: Int): Unit = {
        val llc = llCodes(i)
        w.add((seqLl(i) - LlBase(llc)).toLong, LlExtra(llc))
        val mlc = mlCodes(i)
        w.add((seqMl(i) - MlBase(mlc)).toLong, MlExtra(mlc))
        val ofc = ofCodes(i)
        w.add(ofValue(i).toLong - (1L << ofc), ofc)
      }
      addExtras(lastI)
      var i = lastI - 1
      while (i >= 0) {
        stOf = eOf.encode(w, stOf, ofCodes(i))
        stMl = eMl.encode(w, stMl, mlCodes(i))
        stLl = eLl.encode(w, stLl, llCodes(i))
        addExtras(i)
        i -= 1
      }
      eMl.flush(w, stMl)
      eOf.flush(w, stOf)
      eLl.flush(w, stLl)
      w.close()
    }
    // one channel's fitted form: RLE when a single code repeats,
    // otherwise a normalized table + written header; None when the
    // channel cannot normalize (falls back to predefined)
    def fitted(codes: Array[Int],
               alMax: Int): Option[(Int, Array[Byte], SeqEnc)] = {
      val maxC = codes.max
      val freq = new Array[Int](maxC + 1)
      codes.foreach(c => freq(c) += 1)
      if (freq.count(_ > 0) == 1) Some((1, Array(maxC.toByte), RleEnc))
      else {
        val al = math.min(alMax, math.max(5, highBit(nbSeq - 1)))
        normalizeCounts(freq, nbSeq, 1 << al)
          .map(counts => (2, writeNcount(counts, al), new FseEnc(counts, al)))
      }
    }
    val candPre = (0, Array.empty[Byte],
      bitstream(EncLl, EncMl, EncOf))
    val candFit: Option[(Int, Array[Byte], Array[Byte])] =
      if (nbSeq < 32) None
      else for {
        (mLl, hLl, eLl) <- fitted(llCodes, 9)
        (mOf, hOf, eOf) <- fitted(ofCodes, 8)
        (mMl, hMl, eMl) <- fitted(mlCodes, 9)
      } yield ((mLl << 6) | (mOf << 4) | (mMl << 2),
        hLl ++ hOf ++ hMl, bitstream(eLl, eMl, eOf))
    val (modeByte, seqHeaders, stream) =
      (Seq(candPre) ++ candFit).minBy(c => c._2.length + c._3.length)
    val out = new java.io.ByteArrayOutputStream(
      litBytes.length + stream.length + 16)
    val allSame = litBytes.length > 1 &&
      litBytes.forall(_ == litBytes(0))
    if (allSame) {
      // RLE literals: one byte, 3-byte header (Size_Format 11)
      val lh = (litBytes.length << 4) | (3 << 2) | 1
      out.write(lh & 0xFF); out.write((lh >>> 8) & 0xFF)
      out.write((lh >>> 16) & 0xFF)
      out.write(litBytes(0).toInt)
    } else huffLiterals(litBytes) match {
      case Some(section) => out.write(section, 0, section.length)
      case None =>
        // Raw literals, 3-byte header (Size_Format 11: 20-bit size)
        val lh = (litBytes.length << 4) | (3 << 2) // btype 0 = Raw
        out.write(lh & 0xFF); out.write((lh >>> 8) & 0xFF)
        out.write((lh >>> 16) & 0xFF)
        out.write(litBytes, 0, litBytes.length)
    }
    // sequence count
    if (nbSeq < 128) out.write(nbSeq)
    else if (nbSeq < 0x7F00) {
      out.write((nbSeq >>> 8) + 128); out.write(nbSeq & 0xFF)
    } else {
      out.write(255)
      out.write((nbSeq - 0x7F00) & 0xFF)
      out.write(((nbSeq - 0x7F00) >>> 8) & 0xFF)
    }
    out.write(modeByte) // compression modes per channel
    out.write(seqHeaders, 0, seqHeaders.length)
    out.write(stream, 0, stream.length)
    val seqBlock = out.toByteArray
    // an all-literals Huffman block can still beat a sequence-heavy
    // encoding when matches were short and far (skewed-byte inputs)
    val litOnly = huffLiterals(java.util.Arrays.copyOfRange(in, from, end))
      .map { sec =>
        val o = new java.io.ByteArrayOutputStream(sec.length + 1)
        o.write(sec, 0, sec.length); o.write(0)
        o.toByteArray
      }
    (Seq(seqBlock) ++ litOnly).minByOption(_.length).filter(_.length < len)
  }

  /** REAL zstd compression, from scratch: Compressed blocks (greedy
    * LZ77 sequences over predefined FSE tables, raw literals) with a
    * per-block fallback to Raw when a block does not shrink — a legal
    * frame for any conforming decoder (round-tripped against zstd-jni
    * and the zstd CLI in ZstdSpec). The OP_COMPRESSED path sends
    * these, so both wire directions run entirely on this file's
    * encoder + decoder. */
  private val HashLog = 16

  def compressFrame(in: Array[Byte]): Array[Byte] = compressFrame(in, null)

  /** [[compressFrame]] with a dictionary: its content becomes the
    * match window's PREFIX (hash heads seeded over it, offsets may
    * reach into it — where the ratio win on short similar inputs
    * lives) and the frame header carries the Dictionary_ID so any
    * decoder demands the same dictionary back. Entropy tables still
    * emit per-block (always legal; a decoder never needs the
    * dictionary's tables for our frames). */
  def compressFrame(in: Array[Byte], dict: Dict): Array[Byte] = {
    require(in.length <= MaxLen, s"input too large (${in.length})")
    val n = in.length
    val prefix = if (dict == null) 0 else dict.content.length
    val buf =
      if (prefix == 0) in
      else {
        val b = new Array[Byte](prefix + n)
        System.arraycopy(dict.content, 0, b, 0, prefix)
        System.arraycopy(in, 0, b, prefix, n)
        b
      }
    // match-candidate heads SHARED ACROSS BLOCKS (cross-block window),
    // seeded over the dictionary prefix so the very first bytes of the
    // input can match into it
    val heads = new Array[Int](1 << HashLog) // pos+1; 0 = empty
    var s = 0
    while (s + 4 <= prefix) {
      val v = (buf(s) & 0xFF) | ((buf(s + 1) & 0xFF) << 8) |
        ((buf(s + 2) & 0xFF) << 16) | ((buf(s + 3) & 0xFF) << 24)
      heads((v * -1640531535) >>> (32 - HashLog)) = s + 1
      s += 1
    }
    val (fcsFlag, _) =
      if (n <= 0xFF) (0, 1) else if (n - 256 <= 0xFFFF) (1, 2) else (2, 4)
    val out = new java.io.ByteArrayOutputStream(n / 2 + 64)
    def le(v: Int, bytes: Int): Unit = {
      var i = 0
      while (i < bytes) { out.write((v >>> (8 * i)) & 0xFF); i += 1 }
    }
    val withId = dict != null && dict.id != 0
    le(Magic, 4)
    // Single_Segment; Dictionary_ID in the 4-byte form when present
    out.write((fcsFlag << 6) | 0x20 | (if (withId) 0x03 else 0x00))
    if (withId) le(dict.id.toInt, 4)
    fcsFlag match {
      case 0 => le(n, 1)
      case 1 => le(n - 256, 2)
      case _ => le(n, 4)
    }
    var p = prefix
    var emitted = 0
    while (p < prefix + n || emitted == 0) {
      val len = math.min(MaxBlock, prefix + n - p)
      val last = if (p + len >= prefix + n) 1 else 0
      compressBlock(buf, p, len, heads) match {
        case Some(cb) =>
          le(last | (2 << 1) | (cb.length << 3), 3)
          out.write(cb, 0, cb.length)
        case None =>
          le(last | (len << 3), 3) // Raw
          out.write(buf, p, len)
      }
      p += len
      emitted += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- wire encode

  /** Encode for OP_COMPRESSED id 3: [[compressFrame]] — the from-
    * scratch compressed-block encoder — so both wire directions run on
    * this file alone (no native library in the data path; zstd-jni and
    * the zstd CLI serve only as ZstdSpec's interop oracles). */
  def encodeWire(in: Array[Byte]): Array[Byte] = compressFrame(in)

  // ---------------------------------------------------------------- decode

  def uncompress(in: Array[Byte]): Array[Byte] = uncompress(in, null)

  /** [[uncompress]] with a dictionary: required when the frame header
    * carries a Dictionary_ID (it must match `dict.id`); a raw-content
    * dictionary applies as window prefix regardless of the header. */
  def uncompress(in: Array[Byte], dict: Dict): Array[Byte] = {
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
    val hasChecksum = (desc & 0x04) != 0
    val dictIdBytes = (desc & 0x03) match {
      case 0 => 0; case 1 => 1; case 2 => 2; case _ => 4
    }
    val single = (desc & 0x20) != 0
    val fcsFlag = (desc >>> 6) & 3
    var p = 5
    if (!single) p += 1 // Window_Descriptor: full frames fit in memory here
    if (dictIdBytes > 0) {
      val dictId = le(p, dictIdBytes)
      p += dictIdBytes
      if (dictId != 0 && (dict == null || dict.id != dictId)) fail(
        s"frame needs dictionary id $dictId" +
          (if (dict == null) " and none was provided"
           else s" but dictionary ${dict.id} was provided"))
    }
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
    // an 8-byte FCS with the top bit set reads negative in a Long —
    // it must FAIL the size gate, not sneak past '> MaxLen' and
    // disable the final declared-size verification
    if (fcsSize > 0 && declared < 0) fail("declared size out of range")
    if (declared > MaxLen) fail(s"declared size $declared too large")
    val prefix = if (dict == null) 0 else dict.content.length
    val out = new Out(prefix + (if (declared >= 0) declared.toInt
                                else math.min(in.length * 4, MaxLen)))
    val st = new FrameState
    if (dict != null) {
      // window prefix + entropy/rep-offset seeds: the first block may
      // open in Treeless-literals or Repeat-sequence mode, and matches
      // may reach into the dictionary's content
      out.append(dict.content, 0, prefix)
      st.huf = dict.huf
      st.ll = dict.ll; st.of = dict.of; st.ml = dict.ml
      st.rep1 = dict.reps(0); st.rep2 = dict.reps(1)
      st.rep3 = dict.reps(2)
    }
    var last = false
    while (!last) {
      val h = le(p, 3).toInt; p += 3
      last = (h & 1) != 0
      val btype = (h >>> 1) & 3
      val size = h >>> 3
      btype match {
        case 0 => // Raw: verbatim bytes
          if (size > MaxBlock) fail("raw block exceeds the block maximum")
          if (p + size > in.length) fail("raw block past the input")
          out.append(in, p, size); p += size
        case 1 => // RLE: one byte repeated size times
          if (size > MaxBlock) fail("RLE block exceeds the block maximum")
          if (p >= in.length) fail("truncated RLE block")
          out.ensure(size)
          java.util.Arrays.fill(out.buf, out.n, out.n + size, in(p))
          out.n += size; p += 1
        case 2 => // Compressed: Huffman literals + FSE sequences
          if (size > MaxBlock) fail("compressed block exceeds the block maximum")
          if (p + size > in.length) fail("compressed block past the input")
          val before = out.n
          decodeCompressedBlock(in, p, p + size, out, st)
          if (out.n - before > MaxBlock)
            fail("compressed block regenerated past the block maximum")
          p += size
        case _ => fail("reserved block type")
      }
    }
    // the checksum and the declared size cover the frame's CONTENT
    // only — never the dictionary prefix preloading the window
    val content =
      if (prefix == 0) out.result
      else java.util.Arrays.copyOfRange(out.buf, prefix, out.n)
    if (hasChecksum) {
      val stored = le(p, 4); p += 4
      val computed = xxh64(content, content.length, 0L) & 0xFFFFFFFFL
      if (stored != computed) fail(
        f"content checksum mismatch (stored 0x$stored%08X, " +
          f"computed 0x$computed%08X)")
    }
    if (p != in.length) fail(s"${in.length - p} trailing bytes after the frame")
    if (declared >= 0 && content.length != declared)
      fail(s"content size ${content.length} != declared $declared")
    content
  }
}
