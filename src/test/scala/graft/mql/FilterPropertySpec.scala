package graft.mql

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Property layer (absent in the reference, SURVEY §5.8): the compiled
  * Catalyst predicate must agree with a direct Scala model of MQL filter
  * semantics on arbitrary data — including null/missing rows.
  * (Plain ScalaCheck generators sampled in a loop; the scalatestplus
  * bridge isn't among the offline deps.) */
class FilterPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val values: Gen[Option[Int]] =
    Gen.frequency(4 -> Gen.choose(-5, 5).map(Some(_)), 1 -> Gen.const(None))
  private val dataGen: Gen[List[Option[Int]]] = Gen.listOfN(40, values)
  private val boundGen: Gen[Int] = Gen.choose(-5, 5)

  private def sample[A](g: Gen[A]): A =
    Iterator.continually(g.sample).flatten.next()

  private def run(data: List[Option[Int]], filter: String): Set[Int] = {
    val df = data.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "a")
    df.where(FilterCompiler.compile(filter)).select("id").as[Int].collect().toSet
  }

  private def ids(data: List[Option[Int]])(p: Option[Int] => Boolean): Set[Int] =
    data.zipWithIndex.collect { case (v, i) if p(v) => i }.toSet

  test("comparison operators agree with the Scala model") {
    for (_ <- 1 to 12) {
      val data = sample(dataGen); val b = sample(boundGen)
      assert(run(data, s"""{"a": {"$$gt": $b}}""") == ids(data)(_.exists(_ > b)))
      assert(run(data, s"""{"a": {"$$lte": $b}}""") == ids(data)(_.exists(_ <= b)))
      assert(run(data, s"""{"a": {"$$eq": $b}}""") == ids(data)(_.contains(b)))
      // Mongo: missing matches $ne
      assert(run(data, s"""{"a": {"$$ne": $b}}""") == ids(data)(v => !v.contains(b)))
    }
  }

  test("$in/$nin/$not agree with the Scala model incl. null semantics") {
    for (_ <- 1 to 12) {
      val data = sample(dataGen)
      val set = sample(Gen.listOfN(3, boundGen))
      val b = sample(boundGen)
      val inList = set.mkString("[", ",", "]")
      assert(run(data, s"""{"a": {"$$in": $inList}}""")
        == ids(data)(_.exists(set.contains)))
      assert(run(data, s"""{"a": {"$$nin": $inList}}""")
        == ids(data)(v => !v.exists(set.contains)))
      assert(run(data, s"""{"a": {"$$not": {"$$gte": $b}}}""")
        == ids(data)(v => !v.exists(_ >= b)))
    }
  }

  test("logical combinators agree with the Scala model") {
    for (_ <- 1 to 12) {
      val data = sample(dataGen)
      val x = sample(boundGen); val y = sample(boundGen)
      assert(run(data, s"""{"$$or": [{"a": {"$$lt": $x}}, {"a": {"$$gt": $y}}]}""")
        == ids(data)(v => v.exists(_ < x) || v.exists(_ > y)))
      assert(run(data, s"""{"$$and": [{"a": {"$$gte": $x}}, {"a": {"$$lte": $y}}]}""")
        == ids(data)(v => v.exists(a => a >= x && a <= y)))
      assert(run(data, s"""{"$$nor": [{"a": {"$$lt": $x}}, {"a": null}]}""")
        == ids(data)(v => !(v.exists(_ < x) || v.isEmpty)))
    }
  }
}
