package graft.bson

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.schema.MSchema

/** Ports the reference's decode-kernel unit-test matrix
  * (test_builders.py / test_bson.py / test_arrow.py — see FIXTURES.md §1)
  * against the Spark decoder. */
class DocDecoderSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def decode(docs: Seq[String], schema: StructType,
                     allowInvalid: Boolean = false) =
    DocDecoder.decode(docs.toDS(), schema, allowInvalid)

  test("canonical 4-doc collection: missing field null-padded") {
    // test_arrow.py:94-103
    val docs = Seq(
      """{"_id": 1, "data": 10}""", """{"_id": 2, "data": 20}""",
      """{"_id": 3, "data": 30}""", """{"_id": 4}""")
    val schema = StructType(Seq(
      StructField("_id", IntegerType), StructField("data", LongType)))
    val rows = decode(docs, schema).orderBy("_id").collect()
    assert(rows.map(_.get(1)).toSeq == Seq(10L, 20L, 30L, null))
  }

  test("ragged null padding across documents (test_bson.py:64-80)") {
    val docs = Seq(
      """{"a": 1, "b": 2, "c": 3}""", """{"a": 1, "b": 2}""",
      """{"a": 1}""", """{}""", """{"foo": 1}""")
    val schema = StructType(Seq("a", "b", "c").map(StructField(_, IntegerType)))
    val rows = decode(docs, schema).collect()
    assert(rows.map(r => (0 until 3).count(r.isNullAt)).sorted.toSeq
      == Seq(0, 1, 2, 3, 3))
  }

  test("int coercion matrix incl. truncation, NaN, bool (test_arrow.py:904-972)") {
    val docs = Seq(
      """{"v": 1}""", """{"v": 2.9}""", """{"v": true}""", """{"v": false}""",
      """{"v": NaN}""", """{"v": null}""", """{}""", """{"v": "string"}""")
    val schema = StructType(Seq(StructField("v", IntegerType)))
    val got = decode(docs, schema, allowInvalid = true).collect().map(_.get(0)).toSeq
    assert(got == Seq(1, 2, 1, 0, null, null, null, null))
  }

  test("int32 overflow raises (test_arrow.py:946-972)") {
    val docs = Seq(s"""{"v": ${2L << 34}}""")
    val schema = StructType(Seq(StructField("v", IntegerType)))
    val e = intercept[org.apache.spark.SparkException] {
      decode(docs, schema).collect()
    }
    assert(e.getMessage.contains("overflow") ||
      Option(e.getCause).exists(_.getMessage.contains("overflow")))
  }

  test("overflow raises even under allowInvalid; malformed payloads null") {
    // Int32Builder/Int64Builder check overflow before the allow_invalid
    // branch (lib.pyx:511-577) — overflow is unconditional.
    val intS = StructType(Seq(StructField("i", IntegerType)))
    val longS = StructType(Seq(StructField("l", LongType)))
    intercept[org.apache.spark.SparkException] {
      decode(Seq(s"""{"i": ${2L << 34}}"""), intS, allowInvalid = true).collect()
    }
    intercept[org.apache.spark.SparkException] {
      decode(Seq("""{"l": 1e30}"""), longS, allowInvalid = true).collect()
    }
    // malformed (non-overflow) payloads: strict raises, allowInvalid nulls
    val tsS = StructType(Seq(StructField("ts", TimestampType)))
    val bad = Seq("""{"ts": {"$date": "not-a-date"}}""")
    intercept[org.apache.spark.SparkException] { decode(bad, tsS).collect() }
    assert(decode(bad, tsS, allowInvalid = true).head.isNullAt(0))
    // a long arriving mid-list widens the inferred element type
    // (shared child builder re-inference, lib.pyx:246-255)
    val het = Seq("""{"a": [1, 9999999999]}""")
    val s2 = SchemaInference.infer(het.toDS())
    assert(s2("a").dataType == ArrayType(LongType))
    val arr = DocDecoder.decode(het.toDS(), s2).head.getSeq[Any](0)
    assert(arr == Seq(1L, 9999999999L))
    // struct list elements accumulate the union of field names (the
    // shared DocumentBuilder adds fields as they appear, lib.pyx:212-294)
    val structs = Seq("""{"a": [{"x": 1}, {"y": 2}]}""")
    val s3 = SchemaInference.infer(structs.toDS())
    assert(s3("a").dataType ==
      ArrayType(StructType(Seq(StructField("x", IntegerType),
        StructField("y", IntegerType)))))
  }

  test("inferred schemas decode their own extension-typed documents") {
    val docs = Seq(
      """{"oid": {"$oid": "0123456789abcdef01234567"}, "code": {"$code": "x()"}}""")
    val schema = SchemaInference.infer(docs.toDS())
    assert(schema("oid").metadata.getString(MSchema.BsonTypeKey) == "objectId")
    val r = DocDecoder.decode(docs.toDS(), schema).head
    assert(r.getAs[Array[Byte]](0).length == 12)
    assert(r.getString(1) == "x()")
  }

  test("inference of scalar top-level documents uses the value fallback") {
    val schema = SchemaInference.infer(Seq("1", "2").toDS())
    assert(schema.fieldNames.toSeq == Seq("value"))
    assert(schema("value").dataType == IntegerType)
  }

  test("strict mismatch raises GraftTypeError; allowInvalid nulls (test_arrow.py:555-569)") {
    val docs = Seq("""{"s": {"nested": 1}}""")
    val schema = StructType(Seq(StructField("s", StringType)))
    val e = intercept[org.apache.spark.SparkException] { decode(docs, schema).collect() }
    assert(e.getMessage.contains("unexpected type document") ||
      Option(e.getCause).exists(_.getMessage.contains("unexpected type document")))
    assert(decode(docs, schema, allowInvalid = true).head.isNullAt(0))
  }

  test("double builder accepts bool/int, NaN nulls (lib.pyx:580-601)") {
    val docs = Seq("""{"v": true}""", """{"v": 3}""", """{"v": 2.5}""", """{"v": NaN}""")
    val schema = StructType(Seq(StructField("v", DoubleType)))
    assert(decode(docs, schema).collect().map(_.get(0)).toSeq
      == Seq(1.0, 3.0, 2.5, null))
  }

  test("datetime ms decode + date32 floor-div (lib.pyx:604-694)") {
    val docs = Seq(
      """{"ts": {"$date": "2024-03-05T06:07:08.123Z"}, "d": {"$date": -1}}""")
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("d", DateType)))
    val r = decode(docs, schema).head
    assert(r.getTimestamp(0).toInstant.toString == "2024-03-05T06:07:08.123Z")
    assert(r.getDate(1).toString == "1969-12-31") // ms=-1 floors to previous day
  }

  test("nested struct + list-of-struct with missing lists (golden shape, FIXTURES §1.4)") {
    val docs = Seq(
      """{"object1": {"object11": {"object111": {"list1111": [{"field11111": 1.5}]}}}}""",
      """{"object1": {"object11": {"object111": {}}}}""",
      """{"object1": {"object11": {"object111": {"list1111": [{"field11111": 2.5}, {"field11111": 3.5}]}}}}""")
    val inner = StructType(Seq(StructField("field11111", DoubleType)))
    val schema = StructType(Seq(StructField("object1", StructType(Seq(
      StructField("object11", StructType(Seq(
        StructField("object111", StructType(Seq(
          StructField("list1111", ArrayType(inner)))))))))))))
    val col = decode(docs, schema)
      .select("object1.object11.object111.list1111").collect()
    assert(col(0).getSeq[Row](0).map(_.getDouble(0)) == Seq(1.5))
    assert(col(1).isNullAt(0)) // missing list → null, not empty list
    assert(col(2).getSeq[Row](0).map(_.getDouble(0)) == Seq(2.5, 3.5))
  }

  test("extension types: ObjectId, Binary subtype check, Code (lib.pyx:461-508,771-810)") {
    val docs = Seq(
      """{"oid": {"$oid": "0123456789abcdef01234567"},
          "bin": {"$binary": {"base64": "AQID", "subType": "0a"}},
          "code": {"$code": "function(){}"}}""")
    val schema = StructType(Seq(
      MSchema.objectIdField("oid"), MSchema.binaryField("bin", 10),
      MSchema.codeField("code")))
    val r = decode(docs, schema).head
    assert(r.getAs[Array[Byte]](0).length == 12)
    assert(r.getAs[Array[Byte]](1).toSeq == Seq[Byte](1, 2, 3))
    assert(r.getString(2) == "function(){}")
    // subtype mismatch = type error → null under allowInvalid
    val wrongSub = StructType(Seq(MSchema.binaryField("bin", 20)))
    assert(decode(docs, wrongSub, allowInvalid = true).head.isNullAt(0))
  }

  test("inference: first non-null wins, heterogeneous coerce-or-null (test_arrow.py:765-773)") {
    val docs = Seq("""{"v": 1}""", """{"v": "2"}""", """{"v": true}""", """{"v": 4}""")
    val schema = SchemaInference.infer(docs.toDS())
    assert(schema("v").dataType == IntegerType)
    val got = DocDecoder.decode(docs.toDS(), schema, allowInvalid = true)
      .collect().map(_.get(0)).toSeq
    assert(got == Seq(1, null, 1, 4))
  }

  test("inference: int32→int64 promotion across batches (test_arrow.py:1405-1461)") {
    val docs = ((1 to 10).map(i => s"""{"v": $i}""") :+ s"""{"v": ${1L << 40}}""")
    val ds = spark.createDataset(docs)(org.apache.spark.sql.Encoders.STRING).repartition(3)
    val schema = SchemaInference.infer(ds)
    assert(schema("v").dataType == LongType)
  }

  test("inference: null-first field typed by later value; list element from first non-null") {
    val docs = Seq(
      """{"a": null, "l": [null, 7]}""",
      """{"a": "x", "l": [1, 2]}""")
    val schema = SchemaInference.infer(docs.toDS())
    assert(schema("a").dataType == StringType)
    assert(schema("l").dataType == ArrayType(IntegerType))
  }

  test("inference: first-seen field order preserved") {
    val docs = Seq("""{"b": 1, "a": 2}""", """{"c": 3, "a": 4}""")
    assert(SchemaInference.infer(docs.toDS()).fieldNames.toSeq == Seq("b", "a", "c"))
  }

  test("MSchema projection synthesis (schema.py:68-85)") {
    val s = MSchema(StructType(Seq(
      StructField("x", LongType),
      StructField("doc", StructType(Seq(
        StructField("y", StringType), StructField("z", DoubleType)))),
      StructField("list", ArrayType(StructType(Seq(StructField("a", IntegerType))))))))
    assert(s.projection == Seq("_id" -> false, "x" -> true,
      "doc.y" -> true, "doc.z" -> true, "list.a" -> true))
    // _id declared → no exclusion
    val s2 = MSchema(StructType(Seq(StructField("_id", IntegerType))))
    assert(s2.projection == Seq("_id" -> true))
  }
}
