package graft.api

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Bucketing = the 100 TB co-located-join tool: both tables bucketed on
  * the join key join WITHOUT a shuffle (no Exchange in the plan). This
  * pins that the engine's output tables can be laid out for repeated
  * downstream joins. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("bucketed tables join with zero exchanges") {
    val dir = "/root/testdata/sf0.001"
    // default warehouse (./spark-warehouse, gitignored)
    spark.sql("DROP TABLE IF EXISTS li_b"); spark.sql("DROP TABLE IF EXISTS o_b")
    Seq("li_b", "o_b").foreach { t => // clear leftovers from crashed runs
      val f = new java.io.File(s"spark-warehouse/$t")
      if (f.exists()) { org.apache.commons.io.FileUtils.deleteDirectory(f) }
    }
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")
    // tiny test tables would auto-broadcast; disable to expose the
    // bucket-aware join (at 100 TB neither side broadcasts anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("li_b")
      .join(spark.table("o_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    // the join itself must not shuffle either side
    val beforeAgg = plan.split("HashAggregate").last // join subtree is below the aggs
    assert(beforeAgg.contains("SortMergeJoin") || beforeAgg.contains("ShuffledHashJoin")
      || plan.contains("SortMergeJoin"), s"unexpected join strategy:\n$plan")
    assert(!beforeAgg.contains("Exchange"),
      s"bucketed join still shuffles:\n$plan")
    // and the answer matches the unbucketed join
    val expect = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      == expect.collect().map(r => (r.getString(0), r.getLong(1))).toMap)
    spark.sql("DROP TABLE IF EXISTS li_b"); spark.sql("DROP TABLE IF EXISTS o_b")
  }
}
