package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The non-throwing string→integral parser behind `$convert` to
  * int/long must agree with Spark's `try_cast` on every edge shape —
  * try_cast IS the pinned semantic (the DuckDB oracle was validated
  * against it); TryParseIntegral only removes the per-failing-row
  * exception cost (~35× on columns where most rows hit onError). */
class TryParseSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkFixture.spark
    GraftFunctions.register(s)
    s
  }
  import spark.implicits._

  private val cases = Seq(
    " 5 ", "\t5", "+5", "-5", "5.7", "5.", ".5", "", " ",
    "12345678901234567890", "0x10", "5e3", "007", "-2147483648",
    "2147483648", "-9223372036854775808", "9223372036854775808",
    "٥", "+", "-", "--5", "5 5", "￥5", null)

  test("try_to_int / try_to_long agree with try_cast on the edge matrix") {
    val rows = cases.toDF("s").select($"s",
      $"s".try_cast("int").as("tc_i"),
      call_function("try_to_int", $"s").as("tp_i"),
      $"s".try_cast("long").as("tc_l"),
      call_function("try_to_long", $"s").as("tp_l")).collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2) && r.get(3) == r.get(4),
        s"parity break on '${r.get(0)}': ${r.toSeq}")
    }
  }

  test("property: random strings agree with try_cast") {
    import org.scalacheck.Gen
    def sample[A](g: Gen[A]): A =
      Iterator.continually(g.sample).flatten.next()
    val piece = Gen.oneOf(
      Gen.numStr.map(_.take(22)), Gen.const("+"), Gen.const("-"),
      Gen.const("."), Gen.const(" "), Gen.const("\t"), Gen.const("e"),
      Gen.const("٥"), Gen.const("x"), Gen.const(""))
    val strGen = Gen.chooseNum(0, 5)
      .flatMap(n => Gen.sequence[Seq[String], String](Seq.fill(n)(piece)))
      .map(_.mkString)
    val cases = (1 to 400).map(_ => sample(strGen)).distinct
    val rows = cases.toDF("s").select($"s",
      $"s".try_cast("int").as("tc_i"),
      call_function("try_to_int", $"s").as("tp_i"),
      $"s".try_cast("long").as("tc_l"),
      call_function("try_to_long", $"s").as("tp_l")).collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2) && r.get(3) == r.get(4),
        s"parity break on '${r.get(0)}': ${r.toSeq}")
    }
  }

  test("non-string inputs dispatch to TRY-mode Cast") {
    val got = spark.range(3)
      .select(call_function("try_to_int", $"id" * 2000000000L))
      .collect().map(_.get(0)).toSeq
    // 4e9 overflows int → TRY cast nulls, not wraps
    assert(got == Seq(0, 2000000000, null))
    val dbl = Seq(1.9, -1.9, Double.NaN).toDF("d")
      .select(call_function("try_to_long", $"d")).collect().map(_.get(0)).toSeq
    assert(dbl == Seq(1L, -1L, null))
  }
}
