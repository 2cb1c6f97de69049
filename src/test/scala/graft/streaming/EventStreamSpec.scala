package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.api.Graft
import graft.operators.Sessionize

class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming session_window agrees with the batch sessionizer") {
    val events = Graft.table(spark, dir, "events")
    // batch ground truth
    val batch = Sessionize.byGap(events, "user_id", "ts", "event_id", "value", 30)
      .select($"user_id", $"session_start", $"n_events".cast("long"))
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    // streaming path over the same file
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val name = s"graft_sessions_${System.nanoTime()}"
    val q = EventStream.sessionAgg(stream, gap = "30 minutes")
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table(name)
      .select($"user_id", $"session_start", $"n_events")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    assert(streamed == batch)
  }
}
