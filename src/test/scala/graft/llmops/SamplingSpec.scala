package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("stratified sample: rate 1 keeps a stratum whole, rate 0 drops it") {
    val en = docs.where($"lang" === "en").count()
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0), defaultRate = 0.0)
    assert(kept.count() == en)
    assert(kept.where($"lang" =!= "en").count() == 0)
  }

  test("stratified sample is deterministic and partition-invariant") {
    val a = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.3), defaultRate = 0.5).select("doc_id")
      .as[Long].collect().sorted.toSeq
    val b = Sampling.stratifiedSample(docs.repartition(13), "doc_id", "lang",
      Map("en" -> 0.3), defaultRate = 0.5).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("stratified sample rate lands near the target fraction") {
    val total = docs.count().toDouble
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map.empty, defaultRate = 0.5).count().toDouble
    assert(math.abs(kept / total - 0.5) < 0.15) // 500 docs, hash noise
  }

  test("token budget: every kept prefix is within budget, cut is tight") {
    val out = Sampling.tokenBudget(docs, "doc_id", "source",
      TextAnalysis.tokenCount(col("text")), budget = 200L)
    val maxCum = out.agg(max("cum_tokens")).as[Long].head()
    assert(maxCum <= 200L)
    // at least one source actually hit the cut (fixture sources carry
    // far more than 200 tokens)
    val perSource = out.groupBy("source").agg(max("cum_tokens").as("m"))
    assert(perSource.where($"m" > 100L).count() > 0)
    // deterministic across partitioning
    val again = Sampling.tokenBudget(docs.repartition(9), "doc_id", "source",
      TextAnalysis.tokenCount(col("text")), budget = 200L)
    assert(again.select("doc_id").as[Long].collect().sorted.toSeq ==
           out.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("ruleFilter flags agree with hand-computed stats") {
    val df = Seq(
      (1L, "the cat sat on the mat today quite happily indeed"), // clean → keep
      (2L, "a b"),                                    // too few tokens
      (3L, "zzzz qqqq xxxx wwww vvvv uuuu tttt ssss") // no stopwords
    ).toDF("doc_id", "text")
    val f = TextAnalysis.ruleFilter(col("text"))
    val m = df.select(col("doc_id"), f.getField("keep").as("k"),
        f.getField("len_ok").as("l"), f.getField("stopword_ok").as("s"))
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(m(1L) == (true, true, true))
    assert(m(2L)._2 == false && m(2L)._1 == false)
    assert(m(3L)._3 == false && m(3L)._1 == false)
  }
}
