package graft.api

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Bucketed co-located joins: the write-once/join-many layout answer for
  * repeated fact⋈fact equi-joins at scale. The assertion that matters:
  * with both sides bucketed on the join key, the join plan carries NO
  * shuffle Exchange — the scans satisfy the required distribution. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("bucketed orders ⋈ lineitem joins and aggregates exchange-free") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Layout.writeBucketed(orders, "graft_bkt_orders", "o_orderkey", 4)
    Layout.writeBucketed(lineitem, "graft_bkt_lineitem", "l_orderkey", 4)
    try {
      val o = Layout.bucketedTable(spark, "graft_bkt_orders")
      val l = Layout.bucketedTable(spark, "graft_bkt_lineitem")
      // disable broadcast so the exchange-free claim is about bucketing,
      // not about one side fitting in memory
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val joined = o.join(l, $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_orderkey")
          .agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
        joined.collect()
        val plan = joined.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
          case p => p
        }
        assert(Layout.isExchangeFree(plan), plan.toString)
        // and the result is the same as the plain (shuffling) join
        val expect = orders.join(lineitem, $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_orderkey")
          .agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
          .orderBy("o_orderkey").collect().toSeq
        assert(joined.orderBy("o_orderkey").collect().toSeq == expect)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    }
  }

  test("the same join WITHOUT bucketing shuffles both sides (the baseline)") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = orders.join(lineitem, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      assert(!Layout.isExchangeFree(plan), plan.toString)
    }
  }

  private def withConf[T](kv: (String, String)*)(body: => T): T = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
