package graft.bson

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Binary BSON codec: encode→parse round trips per type, decimal128 BID
  * bit-level vectors, and stream iteration over concatenated documents
  * (the reference's native input, lib.pyx:296-311). */
class BsonBinarySpec extends AnyFunSuite {

  private def roundTrip(row: Row, schema: StructType) = {
    val bytes = BsonBinary.encodeRow(row, schema)
    val in = new java.io.ByteArrayInputStream(bytes)
    val docs = BsonBinary.documents(in).toList
    assert(docs.size == 1)
    DocDecoder.decodeStruct(docs.head, schema, strict = true)
  }

  test("scalar round trip: int/long/double/string/bool/null") {
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("b", BooleanType), StructField("n", StringType)))
    val row = Row(42, 1234567890123L, 3.25, "héllo 🎉", true, null)
    assert(roundTrip(row, schema) == row)
  }

  test("datetime round trip is epoch-millis; date floors to UTC day") {
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("d", DateType)))
    val ts = new java.sql.Timestamp(1700000000123L)
    val d = java.sql.Date.valueOf("2024-02-29")
    assert(roundTrip(Row(ts, d), schema) == Row(ts, d))
  }

  test("nested struct and array round trip") {
    val inner = StructType(Seq(
      StructField("x", LongType), StructField("tags", ArrayType(StringType))))
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("doc", inner),
      StructField("nums", ArrayType(DoubleType))))
    val row = Row(1, Row(9L, Seq("a", "b")), Seq(1.5, -2.5))
    assert(roundTrip(row, schema) == row)
  }

  test("binary subtype, ObjectId and code extension types") {
    val oidMeta = new MetadataBuilder()
      .putString(graft.schema.MSchema.BsonTypeKey, "objectId").build()
    val codeMeta = new MetadataBuilder()
      .putString(graft.schema.MSchema.BsonTypeKey, "code").build()
    val schema = StructType(Seq(
      StructField("raw", BinaryType),
      StructField("oid", BinaryType, metadata = oidMeta),
      StructField("js", StringType, metadata = codeMeta)))
    val oid = (1 to 12).map(_.toByte).toArray
    val row = Row(Array[Byte](0, 1, 2), oid, "function() {}")
    val got = roundTrip(row, schema)
    assert(got.getAs[Array[Byte]](0).toSeq == Seq[Byte](0, 1, 2))
    assert(got.getAs[Array[Byte]](1).toSeq == oid.toSeq)
    assert(got.getString(2) == "function() {}")
  }

  test("decimal128 BID vectors") {
    // 1 with exponent 0 → biased 6176 → high = 6176L << 49
    assert(BsonBinary.decimal128Bits(new java.math.BigDecimal("1")) ==
      ((6176L << 49, 1L)))
    // 0.001 = 1E-3 → biased 6173
    assert(BsonBinary.decimal128Bits(new java.math.BigDecimal("0.001")) ==
      ((6173L << 49, 1L)))
    // -42 sets the sign bit
    val (hNeg, lNeg) = BsonBinary.decimal128Bits(new java.math.BigDecimal("-42"))
    assert(lNeg == 42L && (hNeg >>> 63) == 1L)
    // parse inverts encode, including > 64-bit coefficients
    for (s <- Seq("0", "1", "-1", "0.001", "123456789.123456789",
        "-9876543210987654321098765432109876", "1E+10", "-2.5E-15")) {
      val bd = new java.math.BigDecimal(s)
      val (h, l) = BsonBinary.decimal128Bits(bd)
      assert(new java.math.BigDecimal(BsonBinary.decimal128ToString(h, l))
        .compareTo(bd) == 0, s"round trip of $s")
    }
    // special forms parse (combination bits 11)
    assert(BsonBinary.decimal128ToString(0x7C00000000000000L, 0L) == "NaN")
    assert(BsonBinary.decimal128ToString(0x7800000000000000L, 0L) == "Infinity")
    assert(BsonBinary.decimal128ToString(0xF800000000000000L, 0L) == "-Infinity")
  }

  test("decimal round trip through a declared DecimalType") {
    val schema = StructType(Seq(StructField("v", DecimalType(18, 4))))
    val bd = new java.math.BigDecimal("12345.6789")
    val got = roundTrip(Row(bd), schema)
    assert(got.getDecimal(0).compareTo(bd) == 0)
  }

  test("decimal128 raw-BID passthrough: full-domain matrix") {
    // string → BID → string is identity over the WHOLE decimal128
    // domain, including the values DecimalType(38,10) nulls out
    val full = Seq("NaN", "Infinity", "-Infinity",
      "0", "-0.001", "123456789.123456789",
      "1E+10", "-2.5E-15", "9999999999999999999999999999999999",
      "1E-6100", "1E+6100") // exponents far past Spark's decimal scale
    full.foreach { s =>
      val bid = BsonBinary.decimal128Bid(s)
      assert(bid.length == 16)
      val back = BsonBinary.decimal128BidToString(bid)
      val eq = (s, back) match {
        case ("NaN", b) => b == "NaN"
        case (a, b) if a.contains("Infinity") => a == b
        case (a, b) =>
          new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b)) == 0
      }
      assert(eq, s"full-domain round trip of $s gave $back")
    }
    // decode path: MSchema.decimalRawField keeps NaN/Inf as payload...
    val raw = graft.schema.MSchema.decimalRawField("v")
    val schema = StructType(Seq(raw))
    val mapper = DocDecoder.newMapper()
    def decode(json: String) =
      DocDecoder.decodeStruct(mapper.readTree(json), schema, strict = true)
    val nanRow = decode("""{"v": {"$numberDecimal": "NaN"}}""")
    assert(BsonBinary.decimal128BidToString(
      nanRow.get(0).asInstanceOf[Array[Byte]]) == "NaN")
    val infRow = decode("""{"v": {"$numberDecimal": "-Infinity"}}""")
    assert(BsonBinary.decimal128BidToString(
      infRow.get(0).asInstanceOf[Array[Byte]]) == "-Infinity")
    // ...where the DecimalType(38,10) field nulls them (documented §7.4)
    val decSchema = StructType(Seq(StructField("v", DecimalType(38, 10))))
    assert(DocDecoder.decodeStruct(
      mapper.readTree("""{"v": {"$numberDecimal": "NaN"}}"""),
      decSchema, strict = false).isNullAt(0))

    // the decimal128_str native function renders the payload in SQL
    val spark = graft.SparkFixture.spark
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val vals = Seq("NaN", "Infinity", "42.5", "1E+6100")
    val df = vals.map(BsonBinary.decimal128Bid).toDF("bid")
    val out = df.select(org.apache.spark.sql.functions
      .call_function("decimal128_str", $"bid")).collect().map(_.getString(0))
    assert(out(0) == "NaN" && out(1) == "Infinity")
    assert(new java.math.BigDecimal(out(2)).compareTo(
      new java.math.BigDecimal("42.5")) == 0)
    assert(new java.math.BigDecimal(out(3)).compareTo(
      new java.math.BigDecimal("1E+6100")) == 0)
  }

  test("stream of concatenated documents iterates in order") {
    val schema = StructType(Seq(StructField("i", IntegerType)))
    val out = new java.io.ByteArrayOutputStream()
    (1 to 5).foreach(i => out.write(BsonBinary.encodeRow(Row(i), schema)))
    val docs = BsonBinary.documents(
      new java.io.ByteArrayInputStream(out.toByteArray)).toList
    assert(docs.map(_.get("i").asInt()) == List(1, 2, 3, 4, 5))
  }

  test("truncated stream raises; garbage length raises") {
    val schema = StructType(Seq(StructField("i", IntegerType)))
    val bytes = BsonBinary.encodeRow(Row(7), schema)
    intercept[java.io.EOFException] {
      BsonBinary.documents(
        new java.io.ByteArrayInputStream(bytes.dropRight(3))).toList
    }
    intercept[GraftTypeError] {
      BsonBinary.documents(
        new java.io.ByteArrayInputStream(Array[Byte](1, 0, 0, 0))).toList
    }
  }

  test("parsed nodes feed schema inference like text documents") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("s", StringType),
      StructField("ts", TimestampType)))
    val row = Row(5L, "x", new java.sql.Timestamp(1000L))
    val bytes = BsonBinary.encodeRow(row, schema)
    val spark = graft.SparkFixture.spark
    // parse on the executor: shipping JsonNodes through Java
    // serialization re-parses them as JSON text, which would collapse
    // int64 back to int32 (the real source parses executor-side too)
    val nodes = spark.sparkContext.parallelize(Seq(bytes), 1).flatMap { b =>
      BsonBinary.documents(new java.io.ByteArrayInputStream(b))
        .map(n => n: com.fasterxml.jackson.databind.JsonNode)
    }
    val inferred = SchemaInference.inferNodes(nodes)
    assert(inferred.fieldNames.toSeq == Seq("a", "s", "ts"))
    assert(inferred("a").dataType == LongType)
    assert(inferred("ts").dataType == TimestampType)
  }
}
