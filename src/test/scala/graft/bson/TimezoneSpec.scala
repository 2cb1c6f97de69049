package graft.bson

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.api.Graft
import graft.schema.MSchema

/** Ports the reference's tz matrix (test_datetime.py:57-168, SURVEY §1.4):
  * bare datetime → tz-naive ms wall clock; schema tz → converted display;
  * instants are preserved regardless of display zone. */
class TimezoneSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val doc = """{"ts": {"$date": "2024-06-01T12:30:00Z"}}"""

  test("bare datetime decodes tz-naive (UTC wall clock)") {
    val schema = StructType(Seq(MSchema.timestampField("ts")))
    val r = DocDecoder.decode(Seq(doc).toDS(), schema).head
    assert(r.getAs[java.time.LocalDateTime](0).toString == "2024-06-01T12:30")
  }

  test("schema tz converts on read via localize") {
    val schema = StructType(Seq(MSchema.timestampField("ts", Some("Asia/Kolkata"))))
    val decoded = DocDecoder.decode(Seq(doc).toDS(), schema)
    // stored value is the absolute instant
    assert(decoded.head.getAs[java.sql.Timestamp](0).toInstant.toString
      == "2024-06-01T12:30:00Z")
    // localized display: +05:30
    val local = Graft.localize(decoded).head.getAs[java.time.LocalDateTime](0)
    assert(local.toString == "2024-06-01T18:00")
    assert(Graft.localize(decoded).schema("ts").dataType == TimestampNTZType)
  }

  test("different schema tz gives a different wall clock, same instant") {
    def localAt(tz: String): String = {
      val schema = StructType(Seq(MSchema.timestampField("ts", Some(tz))))
      Graft.localize(DocDecoder.decode(Seq(doc).toDS(), schema))
        .head.getAs[java.time.LocalDateTime](0).toString
    }
    assert(localAt("America/New_York") == "2024-06-01T08:30")
    assert(localAt("Asia/Tokyo") == "2024-06-01T21:30")
  }

  test("columns without tz metadata pass through localize unchanged") {
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("x", IntegerType)))
    val df = DocDecoder.decode(Seq("""{"ts": {"$date": 0}, "x": 1}""").toDS(), schema)
    assert(Graft.localize(df).schema == df.schema)
  }
}
