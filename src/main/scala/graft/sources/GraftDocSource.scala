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

  // honest contract: nothing is skipped at the file level; Catalyst
  // re-evaluates everything post-scan
  override def pushFilters(fs: Array[Filter]): Array[Filter] = { filters = fs; fs }
  override def pushedFilters(): Array[Filter] = Array.empty

  override def build(): Scan = new GraftScan(required, options)
}

private[sources] class GraftScan(schema: StructType, options: CaseInsensitiveStringMap)
  extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  private val allowInvalid = options.getBoolean("allowinvalid", false)

  override def planInputPartitions(): Array[InputPartition] =
    GraftDocSource.resolveFiles(options).toArray.map(GraftFilePartition(_))

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(schema, allowInvalid)
}

private[sources] case class GraftFilePartition(path: String) extends InputPartition

private[sources] class GraftReaderFactory(schema: StructType, allowInvalid: Boolean)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[GraftFilePartition].path
    new PartitionReader[InternalRow] {
      private val mapper = DocDecoder.newMapper()
      private val source = scala.io.Source.fromFile(path)("UTF-8")
      private val lines = source.getLines()
      private val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
      private var current: InternalRow = _

      override def next(): Boolean = {
        if (!lines.hasNext) false
        else {
          val row = DocDecoder.decodeStruct(mapper.readTree(lines.next()), schema,
            strict = !allowInvalid)
          current = toCatalyst(row).asInstanceOf[InternalRow]
          true
        }
      }
      override def get(): InternalRow = current
      override def close(): Unit = source.close()
    }
  }
}
