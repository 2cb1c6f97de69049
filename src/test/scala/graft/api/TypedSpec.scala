package graft.api

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class TypedSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("typed Dataset reads with compile-time schema") {
    val ds = Typed.lineitem(spark, dir)
    assert(ds.head().l_orderkey >= 0)
    assert(Typed.documents(spark, dir).filter(_.n_chars > 400).count() > 0)
  }

  test("typed Aggregator matches the untyped decimal-exact aggregation") {
    val typedOut = Typed.revenueByFlag(Typed.lineitem(spark, dir))
      .collect().toMap
    val untyped = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy($"l_returnflag")
      .agg(sum($"l_extendedprice".cast(DecimalType(18, 4)) *
        (lit(1).cast(DecimalType(18, 4)) - $"l_discount".cast(DecimalType(18, 4))))
        .cast(DoubleType).as("revenue"))
      .as[(String, Double)].collect().toMap
    assert(typedOut.keySet == untyped.keySet)
    typedOut.foreach { case (k, v) =>
      assert(math.abs(v - untyped(k)) < 1e-6, s"flag $k: $v vs ${untyped(k)}")
    }
  }
}
