package graft.api

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.mql.PipelineCompiler

class SkewDensifySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("saltedJoin equals plain join on skewed keys") {
    // one hot key holding 90% of the probe side
    val probe = spark.range(1000)
      .select(when($"id" < 900, "hot").otherwise(concat(lit("k"), $"id")).as("k"),
        $"id".as("v"))
    val build = Seq(("hot", 1), ("k950", 2), ("k999", 3)).toDF("k", "w")
    val plain = probe.join(build, Seq("k")).select("k", "v", "w")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(probe, build, "k", salt = 8).select("k", "v", "w")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 902)
  }

  test("keyHistogram surfaces the hot key") {
    val probe = spark.range(100)
      .select(when($"id" < 80, "hot").otherwise(concat(lit("k"), $"id")).as("k"))
    val top = Skew.keyHistogram(probe, "k", topK = 1).head
    assert(top.getString(0) == "hot" && top.getLong(1) == 80L)
  }

  test("$densify fills numeric gaps with null payloads") {
    val df = Seq((0, "a"), (2, "b"), (5, "c")).toDF("x", "payload")
    val out = PipelineCompiler.run(df, """[
      {"$densify": {"field": "x", "range": {"step": 1, "bounds": "full"}}},
      {"$sort": {"x": 1}}]""")
    assert(out.select("x").as[Int].collect().toSeq == (0 to 5))
    assert(out.where($"payload".isNull).count() == 3)
  }

  test("$densify with partitions and explicit bounds") {
    val df = Seq(("a", 1), ("a", 3), ("b", 2)).toDF("g", "x")
    val out = PipelineCompiler.run(df, """[
      {"$densify": {"field": "x", "partitionByFields": ["g"],
                    "range": {"step": 1, "bounds": [1, 4]}}},
      {"$sort": {"g": 1, "x": 1}}]""")
    // Mongo bounds are half-open: [1, 4) → grid 1,2,3 per partition
    val got = out.select("g", "x").as[(String, Int)].collect().toSeq
    assert(got.filter(_._1 == "a").map(_._2) == Seq(1, 2, 3))
    assert(got.filter(_._1 == "b").map(_._2) == Seq(1, 2, 3))
  }

  test("$densify does not duplicate rows of a null partition key") {
    val df = Seq((Some("a"), 1), (None, 5), (None, 7)).toDF("g", "x")
    val out = PipelineCompiler.run(df, """[
      {"$densify": {"field": "x", "partitionByFields": ["g"],
                    "range": {"step": 1, "bounds": "partition"}}}]""")
    val nullG = out.where($"g".isNull).select("x").as[Int].collect().sorted
    assert(nullG.toSeq == Seq(5, 6, 7)) // 6 generated; 5 and 7 NOT duplicated
  }

  test("$densify bounds 'partition' uses each partition's own min..max") {
    val df = Seq(("a", 1), ("a", 4), ("b", 10), ("b", 12)).toDF("g", "x")
    val out = PipelineCompiler.run(df, """[
      {"$densify": {"field": "x", "partitionByFields": ["g"],
                    "range": {"step": 1, "bounds": "partition"}}},
      {"$sort": {"g": 1, "x": 1}}]""")
    val got = out.select("g", "x").as[(String, Int)].collect().toSeq
    assert(got.filter(_._1 == "a").map(_._2) == Seq(1, 2, 3, 4))
    assert(got.filter(_._1 == "b").map(_._2) == Seq(10, 11, 12))
  }
}
