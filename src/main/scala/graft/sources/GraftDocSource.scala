package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.bson.DocDecoder

import scala.jdk.CollectionConverters._

/** DataSource V2 connector for document batches (`*.jsonl` extended-JSON
  * files, e.g. the output of `graft.sinks.DocWriter`) — the Spark twin of
  * the reference's client: `find_arrow_all` becomes
  * `spark.read.format("graftdocs").schema(s).load(path).where(...)`.
  *
  * Pushdown parity (reference api.py:172-175):
  *  - **column pruning IS the projection synthesis**: the decoder only
  *    materializes the pruned schema's fields — unread document fields
  *    are skipped exactly like the server-side projection doc the
  *    reference synthesizes from its Schema (schema.py:68-85);
  *  - filters are reported back as post-scan (a document file can't
  *    skip rows), mirroring a find against an unindexed collection —
  *    Catalyst evaluates them directly over the decoded batch.
  *
  * Partitioning: one input split per file (file ≈ cursor batch, the
  * reference's unit of parallel decode, api.py:181-199). At 100 TB the
  * batches land as many files and decode embarrassingly parallel.
  *
  * Options: `allowInvalid` (default false) — the reference's
  * strict-vs-null coercion switch (api.py:148-149).
  */
object GraftDocSource {
  /** Single resolver for the input file list, honoring both 'path' and
    * 'paths' (DataFrameReader.load(paths*) JSON-encodes the latter), so
    * schema inference and the scan always agree on what gets read. */
  private[sources] def resolveFiles(options: CaseInsensitiveStringMap): Seq[String] = {
    val raw: Seq[String] =
      Option(options.get("path")).map(Seq(_))
        .orElse(Option(options.get("paths")).map(parsePaths))
        .getOrElse(throw new IllegalArgumentException(
          "graftdocs: 'path' or 'paths' required"))
    raw.flatMap { p =>
      val f = new java.io.File(p)
      if (f.isDirectory)
        f.listFiles((_, n) => n.endsWith(".jsonl")).map(_.getAbsolutePath).sorted.toSeq
      else Seq(p)
    }
  }

  private def parsePaths(s: String): Seq[String] =
    if (s.trim.startsWith("[")) {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      m.readValue(s, classOf[Array[String]]).toSeq
    } else s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
}

class GraftDocSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftdocs"

  // declared schemas are the reference's primary mode (api.py:140-147)
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val docs = spark.read.textFile(GraftDocSource.resolveFiles(options): _*)
    graft.bson.SchemaInference.infer(docs)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftDocTable(schema, properties.asScala.toMap)
}

private[sources] class GraftDocTable(schema: StructType, props: Map[String, String])
  extends Table with SupportsRead {
  override def name(): String = s"graftdocs(${props.getOrElse("path", "?")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(schema, options)
}

private[sources] class GraftScanBuilder(fullSchema: StructType,
                                        options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var filters: Array[Filter] = Array.empty

  // projection synthesis: only the pruned columns are decoded
  override def pruneColumns(requiredSchema: StructType): Unit = {
    val byName = fullSchema.fields.map(f => f.name -> f).toMap
    required = StructType(requiredSchema.fields.map(f => byName.getOrElse(f.name, f)))
  }

  // Filters are evaluated DURING decode (the Spark twin of the
  // reference handing the filter doc to the server, api.py:175): rows
  // failing a supported predicate never pay Catalyst conversion. All
  // filters are also returned for post-scan evaluation, so unsupported
  // shapes (nested paths, exotic types) stay correct.
  override def pushFilters(fs: Array[Filter]): Array[Filter] = { filters = fs; fs }
  override def pushedFilters(): Array[Filter] =
    filters.filter(DocFilterEval.supported(_, fullSchema))

  override def build(): Scan = new GraftScan(required, options, pushedFilters())
}

private[sources] class GraftScan(schema: StructType, options: CaseInsensitiveStringMap,
                                 filters: Array[Filter])
  extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graftdocs PushedFilters: [${filters.mkString(", ")}]"

  private val allowInvalid = options.getBoolean("allowinvalid", false)

  // Large files split into newline-aligned byte ranges (0x0A never
  // occurs inside a UTF-8 multibyte sequence): a split owns every line
  // whose FIRST byte lies in [start, end). One 100 GB file is ~800
  // tasks, not one.
  private val maxSplitBytes = {
    val v = options.getLong("maxsplitbytes", 128L * 1024 * 1024)
    if (v <= 0) throw new IllegalArgumentException(
      s"graftdocs: maxSplitBytes must be positive, got $v")
    v
  }

  override def planInputPartitions(): Array[InputPartition] =
    GraftDocSource.resolveFiles(options).toArray.flatMap { p =>
      val len = new java.io.File(p).length()
      if (len <= maxSplitBytes) Array(GraftFilePartition(p, 0L, math.max(len, 1L)))
      else (0L until len by maxSplitBytes).map(s =>
        GraftFilePartition(p, s, math.min(s + maxSplitBytes, len))).toArray
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(schema, allowInvalid, filters)
}

private[sources] case class GraftFilePartition(path: String, start: Long, end: Long)
  extends InputPartition

/** Evaluates pushed source filters against decoded (pre-Catalyst) row
  * values. Conservative: anything it can't prove unmatched keeps the
  * row — Catalyst re-evaluates every filter post-scan. */
private[sources] object DocFilterEval {
  import org.apache.spark.sql.sources._

  def supported(f: Filter, schema: StructType): Boolean = {
    def topLevel(a: String): Boolean =
      !a.contains(".") && schema.fieldNames.contains(a)
    f match {
      case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
           _: LessThan | _: LessThanOrEqual | _: IsNull | _: IsNotNull |
           _: In =>
        f.references.length == 1 && topLevel(f.references.head)
      case And(l, r) => supported(l, schema) && supported(r, schema)
      case Or(l, r)  => supported(l, schema) && supported(r, schema)
      // Not is NOT supported: eval keeps rows it can't decide, and a
      // negation would turn that conservative keep into a wrong drop
      case _ => false
    }
  }

  private def toBD(n: java.lang.Number): java.math.BigDecimal = n match {
    case d: java.math.BigDecimal => d
    case i: java.math.BigInteger => new java.math.BigDecimal(i)
    case o => new java.math.BigDecimal(o.toString)
  }

  /** Some(ordering) when both sides are comparable same-kind values. */
  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: java.lang.Number, y: java.lang.Number) =>
      (x, y) match {
        // exact decimal path first: longValue() would truncate fractions
        // and WRONGLY DROP rows (unrecoverable post-scan)
        case (_: java.math.BigDecimal, _) | (_, _: java.math.BigDecimal) |
             (_: java.math.BigInteger, _) | (_, _: java.math.BigInteger) =>
          Some(toBD(x).compareTo(toBD(y)))
        case (_: java.lang.Double, _) | (_, _: java.lang.Double) |
             (_: java.lang.Float, _) | (_, _: java.lang.Float) =>
          Some(java.lang.Double.compare(x.doubleValue(), y.doubleValue()))
        case _ => Some(java.lang.Long.compare(x.longValue(), y.longValue()))
      }
    case (x: String, y: String) => // Spark's binary UTF8String order, not
      // UTF-16 code-unit order (they diverge on supplementary planes)
      Some(org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)))
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => Some(x.compareTo(y))
    case (x: java.sql.Date, y: java.sql.Date) => Some(x.compareTo(y))
    case (x: java.time.LocalDateTime, y: java.time.LocalDateTime) => Some(x.compareTo(y))
    case (x: java.time.Instant, y: java.time.Instant) => Some(x.compareTo(y))
    case (x: java.lang.Boolean, y: java.lang.Boolean) => Some(x.compareTo(y))
    case _ => None
  }

  /** false ONLY when the row provably fails the filter. */
  def eval(f: Filter, get: String => Any): Boolean = f match {
    case EqualTo(a, v)            => cmp(get(a), v).forall(_ == 0)
    case GreaterThan(a, v)        => cmp(get(a), v).forall(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(get(a), v).forall(_ >= 0)
    case LessThan(a, v)           => cmp(get(a), v).forall(_ < 0)
    case LessThanOrEqual(a, v)    => cmp(get(a), v).forall(_ <= 0)
    case IsNull(a)    => get(a) == null
    case IsNotNull(a) => get(a) != null
    case In(a, vs)    => get(a) == null || vs.exists(v => cmp(get(a), v).forall(_ == 0))
    case And(l, r)    => eval(l, get) && eval(r, get)
    case Or(l, r)     => eval(l, get) || eval(r, get)
    case _ => true // unknown shape: keep, Catalyst decides
  }
}

/** Test-visible decode counters (rows emitted vs rows skipped by
  * decode-time filters). */
private[sources] object GraftScanMetrics {
  val emitted = new java.util.concurrent.atomic.LongAdder
  val skipped = new java.util.concurrent.atomic.LongAdder
}

private[sources] class GraftReaderFactory(schema: StructType, allowInvalid: Boolean,
                                          filters: Array[Filter])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftFilePartition]
    new PartitionReader[InternalRow] {
      private val mapper = DocDecoder.newMapper()
      private val fileIn = new java.io.FileInputStream(p.path)
      private var pos = if (p.start > 0) p.start - 1 else 0L
      private val in =
        try {
          var toSkip = pos
          while (toSkip > 0) toSkip -= fileIn.skip(toSkip)
          val buffered = new java.io.BufferedInputStream(fileIn, 1 << 16)
          // A split owns lines whose first byte is in [start, end). Read
          // from start-1 and discard through the first newline: when the
          // byte at start-1 IS a newline, the line beginning exactly at
          // start is preserved (reading from start would wrongly discard
          // it — no split would ever emit it); otherwise start landed
          // mid-line and that line belongs to the previous split.
          if (p.start > 0) {
            var b = buffered.read()
            while (b != -1 && b != '\n') { pos += 1; b = buffered.read() }
            if (b != -1) pos += 1
          }
          buffered
        } catch {
          case e: Throwable => fileIn.close(); throw e
        }
      private val lineBuf = new java.io.ByteArrayOutputStream(1 << 12)
      /** Next line whose first byte precedes `end`; null when done. */
      private def readLine(): String = {
        if (pos >= p.end) return null
        lineBuf.reset()
        var b = in.read()
        if (b == -1) return null
        while (b != -1 && b != '\n') { lineBuf.write(b); pos += 1; b = in.read() }
        if (b != -1) pos += 1
        new String(lineBuf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      }
      private val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
      private var current: InternalRow = _
      private val fieldIdx: Map[String, Int] =
        schema.fieldNames.zipWithIndex.toMap

      override def next(): Boolean = {
        var line = readLine()
        while (line != null) {
          if (line.nonEmpty) {
            val row = DocDecoder.decodeStruct(mapper.readTree(line), schema,
              strict = !allowInvalid)
            def get(name: String): Any =
              fieldIdx.get(name).map(row.get).orNull
            if (filters.forall(DocFilterEval.eval(_, get))) {
              current = toCatalyst(row).asInstanceOf[InternalRow]
              GraftScanMetrics.emitted.increment()
              return true
            } else GraftScanMetrics.skipped.increment()
          }
          line = readLine()
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = fileIn.close()
    }
  }
}
