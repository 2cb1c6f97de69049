package graft.bson

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.types._

import java.sql.Timestamp
import scala.jdk.CollectionConverters._

/** Raised on a declared-schema type mismatch in strict mode — the twin of
  * the reference's TypeError naming the BSON types (every builder's
  * append_raw tail, e.g. bindings/python/pymongoarrow/lib.pyx:452-455). */
final class GraftTypeError(msg: String) extends IllegalArgumentException(msg)

/** Schema-directed decoder from document streams (MongoDB extended JSON,
  * the test-fixture stand-in for raw BSON batches) into typed DataFrames.
  *
  * This is the Spark re-expression of the reference's decode core
  * (BuilderManager/parse_document, lib.pyx:123-355): one pass per
  * partition (partition ≈ cursor batch), per-field type coercion with the
  * reference's cross-acceptance matrix, missing fields null-padded.
  * Executors decode partitions independently — the reference's
  * thread/process-pool parallelism (api.py:181-199) is free here.
  *
  * Coercion matrix (lib.pyx:511-601,711-729):
  *  - int32/int64 accept bool/int/double-with-truncation; overflow raises
  *    unconditionally (checked before allow_invalid, lib.pyx:511-577);
  *    NaN → null
  *  - double accepts bool/int32/int64; NaN → null (lib.pyx:113-121)
  *  - string/bool strict; timestamps are epoch-millis ($date)
  *  - struct/array recurse; any mismatch → GraftTypeError or null
  */
object DocDecoder {

  /** Mapper accepting NaN/Infinity literals (BSON doubles allow them;
    * the reference nulls NaN, lib.pyx:113-121). */
  private[graft] def newMapper(): ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_NON_NUMERIC_NUMBERS, true)
    m
  }

  private def isExtended(node: JsonNode, key: String): Boolean =
    node.isObject && node.size() == 1 && node.has(key)

  private def bsonTypeName(node: JsonNode): String =
    if (node == null || node.isNull) "null"
    else if (node.isBoolean) "bool"
    else if (node.isInt) "int32"
    else if (node.isLong || isExtended(node, "$numberLong")) "int64"
    else if (node.isNumber || isExtended(node, "$numberDouble")) "double"
    else if (node.isTextual) "string"
    else if (isExtended(node, "$date")) "datetime"
    else if (isExtended(node, "$oid")) "objectId"
    else if (isExtended(node, "$binary")) "binary"
    else if (isExtended(node, "$numberDecimal")) "decimal128"
    else if (isExtended(node, "$code")) "code"
    else if (node.isArray) "array"
    else if (node.isObject) "document"
    else "unknown"

  /** Decode one value against a declared type. Returns null for absent /
    * invalid-under-allowInvalid; throws GraftTypeError in strict mode.
    * Malformed payloads (bad $date text, non-numeric $numberLong,
    * invalid base64/hex) follow that rule — GraftTypeError when strict,
    * null under allowInvalid — EXCEPT integer overflow, which throws
    * unconditionally: the reference's Int32Builder/Int64Builder check
    * overflow before the allow_invalid branch (lib.pyx:511-577), so an
    * out-of-range integral is an error even in permissive mode. */
  def convert(node: JsonNode, field: StructField, strict: Boolean): Any = {
    def fail(): Any =
      if (strict) throw new GraftTypeError(
        s"field '${field.name}': got unexpected type ${bsonTypeName(node)} " +
          s"expecting ${field.dataType.simpleString}")
      else null
    def overflow(what: Any): Any =
      throw new GraftTypeError(
        s"field '${field.name}': ${field.dataType.simpleString} overflow: $what")

    if (node == null || node.isNull) return null
    try field.dataType match {
      case IntegerType =>
        if (node.isBoolean) { if (node.asBoolean) 1 else 0 }
        else if (node.isIntegralNumber || isExtended(node, "$numberLong")) {
          val l = if (node.isIntegralNumber) node.asLong
                  else node.get("$numberLong").asText.toLong
          if (l < Int.MinValue || l > Int.MaxValue) overflow(l)
          else l.toInt
        } else if (node.isDouble || node.isFloat || node.isBigDecimal ||
                   isExtended(node, "$numberDouble")) {
          val d = if (node.isNumber) node.asDouble
                  else java.lang.Double.parseDouble(node.get("$numberDouble").asText)
          if (d.isNaN) null
          else if (d < Int.MinValue.toDouble || d > Int.MaxValue.toDouble) overflow(d)
          else d.toInt // truncate toward zero (lib.pyx:530-534)
        } else fail()
      case LongType =>
        if (node.isBoolean) { if (node.asBoolean) 1L else 0L }
        else if (node.isIntegralNumber) node.asLong
        else if (isExtended(node, "$numberLong")) node.get("$numberLong").asText.toLong
        else if (node.isDouble || node.isFloat || node.isBigDecimal ||
                 isExtended(node, "$numberDouble")) {
          val d = if (node.isNumber) node.asDouble
                  else java.lang.Double.parseDouble(node.get("$numberDouble").asText)
          if (d.isNaN) null
          else if (d < -9.223372036854776e18 || d >= 9.223372036854776e18) overflow(d)
          else d.toLong
        } else fail()
      case DoubleType =>
        if (node.isBoolean) { if (node.asBoolean) 1.0 else 0.0 }
        else if (node.isNumber) { val d = node.asDouble; if (d.isNaN) null else d }
        else if (isExtended(node, "$numberLong")) node.get("$numberLong").asText.toLong.toDouble
        else if (isExtended(node, "$numberDouble")) {
          // canonical ext-JSON double wrapper; the only legal relaxed form
          // for non-finite values (our own writer emits it for NaN/±Inf)
          val d = java.lang.Double.parseDouble(node.get("$numberDouble").asText)
          if (d.isNaN) null else d
        }
        else fail()
      case StringType =>
        val isCode = field.metadata.contains(graft.schema.MSchema.BsonTypeKey) &&
          field.metadata.getString(graft.schema.MSchema.BsonTypeKey) == "code"
        if (isCode) {
          if (isExtended(node, "$code")) node.get("$code").asText else fail()
        } else if (node.isTextual) node.asText
        else fail()
      case BooleanType => if (node.isBoolean) node.asBoolean else fail()
      case TimestampType =>
        if (isExtended(node, "$date")) {
          val d = node.get("$date")
          if (d.isNumber) new Timestamp(d.asLong)
          else Timestamp.from(java.time.Instant.parse(d.asText))
        } else fail()
      case TimestampNTZType => // tz-naive ms timestamps (§1.4 bare datetime)
        if (isExtended(node, "$date")) {
          val d = node.get("$date")
          val ms = if (d.isNumber) d.asLong
                   else java.time.Instant.parse(d.asText).toEpochMilli
          java.time.LocalDateTime.ofInstant(
            java.time.Instant.ofEpochMilli(ms), java.time.ZoneOffset.UTC)
        } else fail()
      case DateType =>
        // ms → days floor (reference Date32Builder, lib.pyx:675-687)
        if (isExtended(node, "$date")) {
          val d = node.get("$date")
          val ms = if (d.isNumber) d.asLong
                   else java.time.Instant.parse(d.asText).toEpochMilli
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(Math.floorDiv(ms, 86400000L)))
        } else fail()
      case dt: DecimalType =>
        if (isExtended(node, "$numberDecimal"))
          new java.math.BigDecimal(node.get("$numberDecimal").asText)
            .setScale(dt.scale, java.math.RoundingMode.HALF_UP)
        else if (node.isNumber)
          new java.math.BigDecimal(node.asText).setScale(dt.scale, java.math.RoundingMode.HALF_UP)
        else fail()
      case BinaryType =>
        val meta = field.metadata
        val bsonType =
          if (meta.contains(graft.schema.MSchema.BsonTypeKey))
            meta.getString(graft.schema.MSchema.BsonTypeKey) else ""
        // raw-BID decimal128 passthrough (MSchema.decimalRawField):
        // NaN/±Infinity/clamped values keep their canonical payload
        // instead of nulling under DecimalType(38,10)
        if (bsonType == "decimal128") {
          if (isExtended(node, "$numberDecimal"))
            return BsonBinary.decimal128Bid(node.get("$numberDecimal").asText)
          else if (node.isNumber)
            return BsonBinary.decimal128Bid(node.asText)
          else return fail()
        }
        val isOid = bsonType == "objectId"
        if (isOid) {
          if (isExtended(node, "$oid")) hexBytes(node.get("$oid").asText) else fail()
        } else if (isExtended(node, "$binary")) {
          val b = node.get("$binary")
          val declared = if (meta.contains(graft.schema.MSchema.BinarySubtypeKey))
            Some(meta.getLong(graft.schema.MSchema.BinarySubtypeKey)) else None
          val actual = java.lang.Long.parseLong(b.get("subType").asText, 16)
          // subtype mismatch is a type error (lib.pyx:792-799)
          if (declared.exists(_ != actual)) fail()
          else java.util.Base64.getDecoder.decode(b.get("base64").asText)
        } else fail()
      case st: StructType =>
        val isExtWrapper = node.isObject && node.size() == 1 &&
          node.fieldNames().asScala.next().startsWith("$")
        if (node.isObject && !isExtWrapper) decodeStruct(node, st, strict)
        else fail()
      case ArrayType(et, _) =>
        if (node.isArray)
          node.elements().asScala.map(e =>
            convert(e, StructField(field.name, et, metadata = field.metadata), strict)).toSeq
        else fail()
      case NullType => null
      case other => throw new GraftTypeError(s"unsupported declared type $other")
    } catch {
      case e: GraftTypeError => throw e // produced in strict mode only
      case scala.util.control.NonFatal(e) => // malformed payload
        if (strict) throw new GraftTypeError(
          s"field '${field.name}': malformed value for " +
            s"${field.dataType.simpleString}: ${e.getMessage}")
        else null
    }
  }

  private[bson] def hexBytes(hex: String): Array[Byte] =
    hex.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray

  def decodeStruct(node: JsonNode, st: StructType, strict: Boolean): Row =
    Row.fromSeq(st.fields.toSeq.map(f => convert(node.get(f.name), f, strict)))

  /** Decode a dataset of JSON document strings under a declared schema.
    * strict=true mirrors the reference's default; allowInvalid
    * (strict=false) silently nulls mismatches (api.py:148-149). */
  def decode(docs: Dataset[String], schema: StructType,
             allowInvalid: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    val strict = !allowInvalid
    val rdd = docs.rdd.mapPartitions { it =>
      val mapper = newMapper()
      it.map(line => decodeStruct(mapper.readTree(line), schema, strict))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Decode with schema inference (reference inferred mode, §1.3). */
  def decodeInferred(docs: Dataset[String]): DataFrame = {
    val schema = SchemaInference.infer(docs)
    decode(docs, schema, allowInvalid = true)
  }

  /** Streaming-capable decode: identical semantics to [[decode]] but via
    * `mapPartitions` under a row Encoder instead of `.rdd`, so the same
    * schema-directed decode runs inside a Structured Streaming query
    * (continuous document ingest — the streaming twin of
    * find_arrow_all's batch decode). Works on batch Datasets too. */
  def decodeStream(docs: Dataset[String], schema: StructType,
                   allowInvalid: Boolean = false): DataFrame = {
    val strict = !allowInvalid
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    docs.mapPartitions { it =>
      val mapper = newMapper()
      it.map(line => decodeStruct(mapper.readTree(line), schema, strict))
    }
  }
}
