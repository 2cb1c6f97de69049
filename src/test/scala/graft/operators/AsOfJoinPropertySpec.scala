package graft.operators

import java.sql.Timestamp
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** AsOfJoin vs a brute-force Scala model on random inputs: for every
  * left row the result must carry the payload of the max-(ts, id) right
  * row with ts <= leftTs on the same key, or nulls when none exists.
  * (Plain ScalaCheck generators sampled in a loop; the scalatestplus
  * bridge isn't among the offline deps.) */
class AsOfJoinPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val rowGen = Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0L, 50L))
  private val rowsGen = Gen.listOfN(25, rowGen)
    .map(_.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) })

  private def sample[A](g: Gen[A]): A =
    Iterator.continually(g.sample).flatten.next()

  private def ts(t: Long) = new Timestamp(t * 1000L)

  test("matches the brute-force latest-prior model on random inputs") {
    for (_ <- 1 to 6) {
      val lrows = sample(rowsGen)
      val rrows = sample(rowsGen)
      val left = lrows.map { case (i, k, t) => (i, k, ts(t)) }.toDF("lid", "k", "t")
      val right = rrows.map { case (i, k, t) => (i, k, ts(t)) }.toDF("rid", "k", "rt")
      val got = AsOfJoin.latestPrior(left, right, "k", "k", "t", "rt",
          payload = Seq("rid"), tiebreak = "rid")
        .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
      val expected = lrows.map { case (i, k, t) =>
        val cands = rrows.filter { case (_, rk, rt) => rk == k && rt <= t }
        i -> (if (cands.isEmpty) None
              else Some(cands.maxBy { case (ri, _, rt) => (rt, ri) }._1))
      }.toMap
      assert(got == expected)
    }
  }
}
