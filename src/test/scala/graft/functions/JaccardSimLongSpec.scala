package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** JaccardSimLong (merge-intersection over sorted hashed sets) must
  * agree exactly with set jaccard on the same shingle sets — it is the
  * verification kernel of the hashed near-dup path. (Plain ScalaCheck
  * sampled in a loop; the scalatestplus bridge isn't among the offline
  * deps.) */
class JaccardSimLongSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def simLong(a: Seq[Long], b: Seq[Long]): Double = {
    GraftFunctions.register(spark)
    Seq((a.sorted.distinct, b.sorted.distinct)).toDF("a", "b")
      .select(call_function("jaccard_sim_long", $"a", $"b"))
      .as[Double].head()
  }

  test("hand cases: disjoint, identical, partial, empty") {
    assert(simLong(Seq(1L, 2L), Seq(3L, 4L)) == 0.0)
    assert(simLong(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 1.0)
    assert(simLong(Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)) == 0.5)
    assert(simLong(Seq.empty, Seq.empty).isNaN) // 0/0 as the builtin form
  }

  test("property: equals string-set jaccard via the hash view") {
    GraftFunctions.register(spark)
    val words = Gen.listOf(Gen.oneOf((1 to 30).map(i => s"w$i")))
    def sample[A](g: Gen[A]): A =
      Iterator.continually(g.sample).flatten.next()
    for (_ <- 1 to 20) {
      val wa = sample(words); val wb = sample(words)
      val sa = wa.toSet; val sb = wb.toSet
      val u = (sa ++ sb).size
      val expected = if (u == 0) Double.NaN else (sa & sb).size.toDouble / u
      val got = Seq((wa.distinct, wb.distinct)).toDF("a", "b")
        .select(call_function("jaccard_sim_long",
          array_sort(transform($"a", x => xxhash64(x))),
          array_sort(transform($"b", x => xxhash64(x)))))
        .as[Double].head()
      assert(got == expected || (got.isNaN && expected.isNaN))
    }
  }
}
