package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** File-level zone maps for the `graftdocs` source — the doc-source
  * analogue of parquet's row-group min/max statistics (the reference's
  * server delegates this to MongoDB's indexes; a file-based source gets
  * data skipping instead).
  *
  * The batch writer computes per-column `min / max / nulls` for every
  * top-level atomic column while it encodes a batch file and stages a
  * tiny JSON sidecar (`<file>.zmap`) through the same hidden-rename
  * commit protocol as the data file. At planning time, a scan with
  * pushed document-field filters consults the sidecars and drops the
  * files whose predicate is PROVABLY FALSE for every row — a point
  * lookup or range query over a sorted/clustered 100 TB layout then
  * opens only the files whose range intersects the predicate, exactly
  * like parquet footer skipping.
  *
  * Soundness rules (a wrongly skipped file silently loses rows, so
  * every verdict errs toward keeping):
  *  - a missing/corrupt/stale sidecar, an unknown column, or an
  *    incomparable value kind keeps the file;
  *  - a sidecar is trusted only when its recorded data-file length
  *    matches the listed file (files are immutable once committed, so a
  *    length match identifies the commit that wrote both);
  *  - string stats are dropped for a batch when any value exceeds
  *    [[MaxStatString]] chars (truncated bounds would be unsound);
  *  - doubles order NaN largest (Spark's ordering), so NaN rows are
  *    representable as `max = NaN`, never silently outside the range;
  *  - verdicts mirror SQL three-valued logic: only a definite
  *    all-rows-false outcome skips (`And` needs one false side, `Or`
  *    needs both).
  */
private[sources] object ZoneMaps {
  /** Strings longer than this poison the column's stats for the batch. */
  val MaxStatString = 256

  /** Bits per distinct key for the optional per-file Bloom filter
    * (~0.8% false-positive rate at k=7 — parquet's default ballpark). */
  val BloomBitsPerKey = 10

  /** Fixed seed: sidecars written anywhere verify on any reader. */
  private val BloomSeed = 0x47524146L // "GRAF"

  /** Per-file Bloom filter over a column's distinct values — the
    * equality twin of min/max: on a hash-distributed 100 TB layout,
    * where every file spans the whole key range and min/max can prove
    * nothing, a point lookup (`_id = X`, `$in` probes) opens only the
    * files whose filter admits the key. Guava-style double hashing over
    * one xxhash64; `mightContain = false` is a PROOF of absence, so the
    * same soundness contract as the range stats holds. */
  final case class Bloom(bits: Array[Long], k: Int) {
    private def m: Long = bits.length.toLong * 64L
    def mightContain(hash: Long): Boolean = {
      var i = 0
      while (i < k) {
        val bit = bloomBit(hash, i, m)
        if ((bits((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }

  /** The i-th probe's bit position for one xxhash64 value — Guava-style
    * double hashing. ONE definition shared by writer and reader: any
    * divergence between set-time and test-time positions would turn
    * mightContain=false into a false negative (an unsound file skip). */
  private def bloomBit(hash: Long, i: Int, m: Long): Long = {
    val h1 = hash.toInt
    val h2 = (hash >>> 32).toInt
    var combined = h1.toLong + i.toLong * h2.toLong
    if (combined < 0) combined = ~combined
    combined % m
  }

  /** Column tags that may carry a Bloom filter: kinds whose canonical
    * form hashes unambiguously (see [[bloomHash]]). */
  private[sources] val BloomableTags = Set("i64", "str", "date", "ts", "ntz")

  /** xxhash64 of a value under its column tag — defined ONLY for kinds
    * whose canonical form is unambiguous across writer and filter
    * literal: integral i64, UTF-8 str, and the datetime kinds through
    * their EXACT integer forms (epoch day / epoch micros — the same
    * integers Catalyst stores, in both java.sql and java.time literal
    * spellings). Everything else returns None and the Bloom verdict
    * abstains (cross-type literals like 5.0 against an i64 column must
    * never hash-compare). */
  private[sources] def bloomHash(tag: String, v: Any): Option[Long] =
    (tag, v) match {
      case ("i64", n: Byte)  => Some(XXH64.hashLong(n.toLong, BloomSeed))
      case ("i64", n: Short) => Some(XXH64.hashLong(n.toLong, BloomSeed))
      case ("i64", n: Int)   => Some(XXH64.hashLong(n.toLong, BloomSeed))
      case ("i64", n: Long)  => Some(XXH64.hashLong(n, BloomSeed))
      case ("str", s: String) =>
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
        Some(XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes,
          BloomSeed))
      case ("date", d: java.time.LocalDate) =>
        Some(XXH64.hashLong(d.toEpochDay, BloomSeed))
      case ("date", d: java.sql.Date) => // toLocalDate inverts the same
        // default-TZ rendering Catalyst used to build the literal
        Some(XXH64.hashLong(d.toLocalDate.toEpochDay, BloomSeed))
      case ("ts", t: java.time.Instant) =>
        Some(XXH64.hashLong(
          org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(t),
          BloomSeed))
      case ("ts", t: java.sql.Timestamp) =>
        Some(XXH64.hashLong(
          org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t),
          BloomSeed))
      case ("ntz", t: java.time.LocalDateTime) =>
        Some(XXH64.hashLong(
          org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(t),
          BloomSeed))
      case _ => None
    }

  /** min/max are canonical external JVM values (see [[canonical]]);
    * null min/max means the file has no non-null value in the column.
    * `bloom` is present only for columns the writer was asked to index
    * (write option `bloomColumns`). */
  final case class ColStats(tag: String, min: Any, max: Any, nulls: Long,
                            bloom: Option[Bloom] = None)
  final case class FileStats(rows: Long, dataLength: Long,
                             cols: Map[String, ColStats])

  private val mapper = new ObjectMapper()

  // ---- type tags -----------------------------------------------------------

  /** JSON type tag for a stat-able column; None = no stats collected. */
  def tagOf(dt: DataType): Option[String] = dt match {
    case IntegerType | LongType | ShortType | ByteType => Some("i64")
    case DoubleType | FloatType                        => Some("f64")
    case StringType                                    => Some("str")
    case BooleanType                                   => Some("bool")
    case DateType                                      => Some("date")
    case TimestampType                                 => Some("ts")
    case TimestampNTZType                              => Some("ntz")
    case _: DecimalType                                => Some("dec")
    case _                                             => None
  }

  /** External writer value → canonical comparable form for its tag.
    * Conversions are exact and monotone, so comparing canonical stats
    * against filter literals can never invert an ordering the read-side
    * coercion preserves. */
  private def canonical(tag: String, v: Any): Any = (tag, v) match {
    case ("i64", n: java.lang.Number)  => java.lang.Long.valueOf(n.longValue())
    case ("f64", n: java.lang.Number)  => java.lang.Double.valueOf(n.doubleValue())
    case ("str", s: String)            => s
    case ("bool", b: java.lang.Boolean) => b
    case ("date", d: java.sql.Date)    => d.toLocalDate
    case ("date", d: java.time.LocalDate) => d
    case ("ts", t: java.sql.Timestamp) => t.toInstant
    case ("ts", t: java.time.Instant)  => t
    case ("ntz", t: java.time.LocalDateTime) => t
    case ("dec", d: java.math.BigDecimal) => d
    case ("dec", d: scala.math.BigDecimal) => d.bigDecimal
    case _ => throw new IllegalArgumentException(
      s"zonemap: unexpected $tag value ${v.getClass.getName}")
  }

  /** Ordering over canonical values of one tag (NaN largest for f64,
    * binary UTF8 order for strings — both match Spark's semantics). */
  private[sources] def cmpCanon(tag: String, a: Any, b: Any): Int = tag match {
    case "i64"  => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case "f64"  => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case "str"  => org.apache.spark.unsafe.types.UTF8String
      .fromString(a.asInstanceOf[String])
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b.asInstanceOf[String]))
    case "bool" => a.asInstanceOf[Boolean].compareTo(b.asInstanceOf[Boolean])
    case "date" => a.asInstanceOf[java.time.LocalDate]
      .compareTo(b.asInstanceOf[java.time.LocalDate])
    case "ts"   => a.asInstanceOf[java.time.Instant]
      .compareTo(b.asInstanceOf[java.time.Instant])
    case "ntz"  => a.asInstanceOf[java.time.LocalDateTime]
      .compareTo(b.asInstanceOf[java.time.LocalDateTime])
    case "dec"  => a.asInstanceOf[java.math.BigDecimal]
      .compareTo(b.asInstanceOf[java.math.BigDecimal])
  }

  // ---- writer side ---------------------------------------------------------

  /** Per-batch stats accumulator over the data (non-partition) schema.
    * One instance per open batch buffer; O(stat-able columns) min/max
    * state plus, for `bloomCols` members, one hash set bounded by the
    * batch's distinct values (batches flush at maxBatchDocs, so the
    * set — 8 bytes/distinct — is a fraction of the buffered docs). */
  final class Collector(schema: StructType, bloomCols: Set[String] = Set.empty) {
    private case class Acc(name: String, tag: String) {
      var min: Any = null
      var max: Any = null
      var nulls: Long = 0L
      var poisoned: Boolean = false // oversized string: stats unsound, drop
      // distinct value hashes for the Bloom sidecar; null = not requested
      val hashes: java.util.HashSet[java.lang.Long] =
        if (bloomCols.contains(name) && BloomableTags(tag))
          new java.util.HashSet[java.lang.Long]()
        else null
    }
    private val accs: Array[(Int, Acc)] = schema.fields.zipWithIndex.flatMap {
      case (f, i) => tagOf(f.dataType).map(t => i -> Acc(f.name, t))
    }.toArray
    private var rows = 0L

    def nonEmptySchema: Boolean = accs.nonEmpty

    def update(row: Row): Unit = {
      rows += 1
      var k = 0
      while (k < accs.length) {
        val (i, a) = accs(k)
        val v = row.get(i)
        // stats must describe what the READ side produces: the decode
        // coercion matrix nulls NaN (reference lib.pyx:113-121), so a
        // written NaN is a null to every future scan
        val nullsOut = v == null ||
          (a.tag == "f64" && v.asInstanceOf[java.lang.Number].doubleValue().isNaN)
        if (nullsOut) a.nulls += 1
        else if (!a.poisoned) {
          if (a.tag == "str" && v.asInstanceOf[String].length > MaxStatString) {
            a.poisoned = true; a.min = null; a.max = null
          } else {
            val c = canonical(a.tag, v)
            if (a.min == null || cmpCanon(a.tag, c, a.min) < 0) a.min = c
            if (a.max == null || cmpCanon(a.tag, c, a.max) > 0) a.max = c
            if (a.hashes != null)
              bloomHash(a.tag, c).foreach(h => a.hashes.add(h))
          }
        }
        k += 1
      }
    }

    /** Sidecar JSON bytes; `dataLength` is the committed data file's
      * byte length (the read side's integrity check). */
    def encode(dataLength: Long): Array[Byte] = {
      val root = mapper.createObjectNode()
      root.put("rows", rows)
      root.put("len", dataLength)
      val cols = root.putObject("cols")
      accs.foreach { case (_, a) =>
        if (!a.poisoned) { // poisoning drops the column WITH its bloom:
          // hashing stopped when collection stopped, so a partial set
          // must never be trusted (missed hashes = unsound skips)
          val o = cols.putObject(a.name)
          o.put("t", a.tag)
          o.put("nulls", a.nulls)
          putValue(o, "min", a.tag, a.min)
          putValue(o, "max", a.tag, a.max)
          if (a.hashes != null && !a.hashes.isEmpty) {
            val b = buildBloom(a.hashes)
            o.put("bf", java.util.Base64.getEncoder.encodeToString(
              longsToBytes(b.bits)))
            o.put("bk", b.k)
          }
        }
      }
      mapper.writeValueAsBytes(root)
    }
  }

  /** Size to [[BloomBitsPerKey]] bits per DISTINCT key (k=7 ≈ optimal
    * at 10 bits/key), built once at batch-flush time. */
  private def buildBloom(hashes: java.util.HashSet[java.lang.Long]): Bloom = {
    val n = math.max(hashes.size(), 1)
    val words = math.max(1, ((n.toLong * BloomBitsPerKey + 63) / 64).toInt)
    val bloom = Bloom(new Array[Long](words), 7)
    val m = words.toLong * 64L
    val it = hashes.iterator()
    while (it.hasNext) {
      val hash = it.next().longValue()
      var i = 0
      while (i < bloom.k) {
        val bit = bloomBit(hash, i, m)
        bloom.bits((bit >>> 6).toInt) |= (1L << (bit & 63))
        i += 1
      }
    }
    bloom
  }

  private def longsToBytes(ls: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(ls.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(ls)
    bb.array()
  }

  private def bytesToLongs(bs: Array[Byte]): Array[Long] = {
    val out = new Array[Long]((bs.length + 7) / 8)
    java.nio.ByteBuffer.wrap(bs).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(out, 0, bs.length / 8)
    out
  }

  private def putValue(o: ObjectNode, field: String, tag: String, v: Any): Unit =
    if (v == null) o.putNull(field)
    else tag match {
      case "i64"  => o.put(field, v.asInstanceOf[Long])
      case "f64"  => // Double.toString round-trips exactly (incl. NaN/Inf)
        o.put(field, java.lang.Double.toString(v.asInstanceOf[Double]))
      case "str"  => o.put(field, v.asInstanceOf[String])
      case "bool" => o.put(field, v.asInstanceOf[Boolean])
      case "date" => o.put(field, v.asInstanceOf[java.time.LocalDate].toString)
      case "ts"   => o.put(field, org.apache.spark.sql.catalyst.util.DateTimeUtils
        .instantToMicros(v.asInstanceOf[java.time.Instant]))
      case "ntz"  => o.put(field, org.apache.spark.sql.catalyst.util.DateTimeUtils
        .localDateTimeToMicros(v.asInstanceOf[java.time.LocalDateTime]))
      case "dec"  => o.put(field, v.asInstanceOf[java.math.BigDecimal].toPlainString)
    }

  // ---- read side -----------------------------------------------------------

  private def readValue(n: com.fasterxml.jackson.databind.JsonNode,
                        tag: String): Any =
    if (n == null || n.isNull) null
    else tag match {
      case "i64"  => java.lang.Long.valueOf(n.asLong())
      case "f64"  => java.lang.Double.valueOf(java.lang.Double.parseDouble(n.asText()))
      case "str"  => n.asText()
      case "bool" => java.lang.Boolean.valueOf(n.asBoolean())
      case "date" => java.time.LocalDate.parse(n.asText())
      case "ts"   => org.apache.spark.sql.catalyst.util.DateTimeUtils
        .microsToInstant(n.asLong())
      case "ntz"  => org.apache.spark.sql.catalyst.util.DateTimeUtils
        .microsToLocalDateTime(n.asLong())
      case "dec"  => new java.math.BigDecimal(n.asText())
    }

  /** Load + integrity-check the sidecar of one data file. None = no
    * usable stats (missing, unparseable, or length mismatch). */
  def load(fs: FileSystem, dataPath: String, dataLength: Long): Option[FileStats] =
    try {
      val p = new Path(dataPath + ".zmap")
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      val root = try mapper.readTree(in) finally in.close()
      val len = root.path("len").asLong(-1L)
      if (len != dataLength) return None // stale sidecar: distrust
      val cols = root.path("cols")
      val b = Map.newBuilder[String, ColStats]
      val it = cols.fields()
      while (it.hasNext) {
        val e = it.next()
        val o = e.getValue
        val tag = o.path("t").asText()
        val bloom = Option(o.get("bf")).filterNot(_.isNull).flatMap { bf =>
          val k = o.path("bk").asInt(0)
          val raw = java.util.Base64.getDecoder.decode(bf.asText())
          // a malformed filter must abstain, never skip: a payload that
          // is not whole 64-bit words would change the modulus (extra
          // zero word) and shift every probe position — false negatives
          if (k <= 0 || k > 64 || raw.isEmpty || raw.length % 8 != 0) None
          else Some(Bloom(bytesToLongs(raw), k))
        }
        b += e.getKey -> ColStats(tag, readValue(o.get("min"), tag),
          readValue(o.get("max"), tag), o.path("nulls").asLong(0L), bloom)
      }
      Some(FileStats(root.path("rows").asLong(0L), len, b.result()))
    } catch { case _: Exception => None }

  /** Canonical stat value → Catalyst value under the declared read type.
    * Only legal when `tagOf(dt)` equals the stat's tag (the aggregate
    * pushdown refuses mismatched tags — cross-type coercion corners stay
    * on the real scan path). Integral narrowing RAISES on overflow,
    * mirroring the decoder, which would raise on the same value during a
    * real scan of that file. */
  private[sources] def toCatalyst(tag: String, v: Any, dt: DataType): Any = {
    def overflow(l: Long): Nothing = throw new IllegalArgumentException(
      s"graftdocs: value $l overflows declared ${dt.simpleString} (zone-map aggregate)")
    (tag, dt) match {
      case ("i64", LongType) => v.asInstanceOf[Long]
      case ("i64", IntegerType) =>
        val l = v.asInstanceOf[Long]
        if (l < Int.MinValue || l > Int.MaxValue) overflow(l) else l.toInt
      case ("i64", ShortType) =>
        val l = v.asInstanceOf[Long]
        if (l < Short.MinValue || l > Short.MaxValue) overflow(l) else l.toShort
      case ("i64", ByteType) =>
        val l = v.asInstanceOf[Long]
        if (l < Byte.MinValue || l > Byte.MaxValue) overflow(l) else l.toByte
      case ("f64", DoubleType) => v.asInstanceOf[Double]
      case ("f64", FloatType)  => v.asInstanceOf[Double].toFloat
      case ("str", StringType) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(v.asInstanceOf[String])
      case ("bool", BooleanType) => v.asInstanceOf[Boolean]
      case ("date", DateType) => org.apache.spark.sql.catalyst.util.DateTimeUtils
        .localDateToDays(v.asInstanceOf[java.time.LocalDate])
      case ("ts", TimestampType) => org.apache.spark.sql.catalyst.util.DateTimeUtils
        .instantToMicros(v.asInstanceOf[java.time.Instant])
      case ("ntz", TimestampNTZType) => org.apache.spark.sql.catalyst.util.DateTimeUtils
        .localDateTimeToMicros(v.asInstanceOf[java.time.LocalDateTime])
      case other => throw new IllegalStateException(
        s"zonemap: unsupported stat conversion $other")
    }
  }

  // ---- pruning verdict -----------------------------------------------------

  /** May any row of a file with these stats satisfy the filter? False
    * ONLY on proof; unknown columns / incomparable kinds keep the file.
    * Comparisons go through [[DocFilterEval.cmp]], so filter literals in
    * either datetime representation (java.sql vs java.time) compare. */
  def mayMatch(f: Filter, cols: Map[String, ColStats]): Boolean = f match {
    case And(l, r) => mayMatch(l, cols) && mayMatch(r, cols)
    case Or(l, r)  => mayMatch(l, cols) || mayMatch(r, cols)
    case IsNull(a) => cols.get(a).forall(_.nulls > 0)
    case IsNotNull(a) => cols.get(a).forall(_.min != null)
    case EqualTo(a, v) => v == null || cols.get(a).forall(s =>
      s.min != null &&
        DocFilterEval.cmp(s.min, v).forall(_ <= 0) &&
        DocFilterEval.cmp(s.max, v).forall(_ >= 0) &&
        bloomAdmits(s, v))
    // null-safe equality: <=> null keeps only files with null rows;
    // <=> v is EqualTo's verdict (both sides non-null there)
    case EqualNullSafe(a, v) =>
      if (v == null) cols.get(a).forall(_.nulls > 0)
      else mayMatch(EqualTo(a, v), cols)
    case GreaterThan(a, v) => v == null || cols.get(a).forall(s =>
      s.max != null && DocFilterEval.cmp(s.max, v).forall(_ > 0))
    case GreaterThanOrEqual(a, v) => v == null || cols.get(a).forall(s =>
      s.max != null && DocFilterEval.cmp(s.max, v).forall(_ >= 0))
    case LessThan(a, v) => v == null || cols.get(a).forall(s =>
      s.min != null && DocFilterEval.cmp(s.min, v).forall(_ < 0))
    case LessThanOrEqual(a, v) => v == null || cols.get(a).forall(s =>
      s.min != null && DocFilterEval.cmp(s.min, v).forall(_ <= 0))
    case In(a, vs) =>
      // null members never match (SQL IN null → unknown → filtered out)
      vs.exists(v => v != null && mayMatch(EqualTo(a, v), cols))
    case _ => true // unknown shape: no verdict
  }

  /** Bloom verdict for `col = v`: false ONLY on a proof of absence.
    * Abstains (true) when no filter was written or when the literal's
    * kind doesn't hash into the column's tag domain exactly (a Double
    * 5.0 against an i64 bloom of 5 would hash differently — the range
    * stats still judge those through DocFilterEval's cross-kind cmp). */
  private def bloomAdmits(s: ColStats, v: Any): Boolean = s.bloom match {
    case None => true
    case Some(b) => bloomHash(s.tag, v) match {
      case None => true
      case Some(h) => b.mightContain(h)
    }
  }
}
