package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, "A", ts("2024-01-01 10:00:00")),
    (2L, "A", ts("2024-01-01 10:05:00")),
    (3L, "A", ts("2024-01-01 09:00:00")), // before any quote
    (4L, "B", ts("2024-01-01 10:00:00")), // exactly at a quote ts (inclusive)
    (5L, "C", ts("2024-01-01 10:00:00"))  // key with no quotes at all
  ).toDF("trade_id", "sym", "t")

  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 09:30:00"), 100L, 1.0),
    ("A", ts("2024-01-01 10:02:00"), 101L, 2.0),
    ("B", ts("2024-01-01 10:00:00"), 200L, 5.0),
    ("B", ts("2024-01-01 10:00:00"), 201L, 6.0)  // same ts: max quote_id wins
  ).toDF("sym", "qt", "quote_id", "px")

  private def run() = AsOfJoin.latestPrior(trades, quotes,
    leftKey = "sym", rightKey = "sym", leftTs = "t", rightTs = "qt",
    payload = Seq("quote_id", "px"), tiebreak = "quote_id")
    .select("trade_id", "quote_id", "px")
    .as[(Long, Option[Long], Option[Double])].collect()
    .map { case (k, q, p) => k -> ((q, p)) }.toMap

  test("latest prior quote per trade, inclusive at equal ts, ties by max id") {
    val m = run()
    assert(m(1L) == (Some(100L), Some(1.0)))   // 09:30 quote is latest ≤ 10:00
    assert(m(2L) == (Some(101L), Some(2.0)))   // 10:02 quote
    assert(m(3L) == (None, None))              // nothing at or before 09:00
    assert(m(4L) == (Some(201L), Some(6.0)))   // equal-ts inclusive + tiebreak
    assert(m(5L) == (None, None))              // unmatched key, left-outer
  }

  test("result is invariant to input partitioning") {
    val base = run()
    val rep = AsOfJoin.latestPrior(trades.repartition(7), quotes.repartition(3),
      "sym", "sym", "t", "qt", Seq("quote_id", "px"), "quote_id")
      .select("trade_id", "quote_id", "px")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, q, p) => k -> ((q, p)) }.toMap
    assert(rep == base)
  }

  test("single shuffle: plan has exactly one exchange below the window") {
    val df = AsOfJoin.latestPrior(trades, quotes,
      "sym", "sym", "t", "qt", Seq("quote_id", "px"), "quote_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("cartesian"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "as-of must not be a join:\n" + plan)
  }
}
