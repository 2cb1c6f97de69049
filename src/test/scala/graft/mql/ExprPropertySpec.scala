package graft.mql

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Property layer for the expression compiler: compiled arithmetic /
  * conditional / array expressions must agree with a direct Scala
  * model on generated inputs. */
class ExprPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def sample[A](g: Gen[A]): A =
    Iterator.continually(g.sample).flatten.next()

  private val ints = Gen.choose(-50, 50)

  private def eval(expr: String, rows: Seq[(Int, Int)]): Seq[Any] =
    rows.toDF("x", "y")
      .select(ExprCompiler.compile(Mql.parse(expr)).as("r"))
      .collect().map(r => if (r.isNullAt(0)) null else r.get(0)).toSeq

  test("arithmetic tree agrees with Scala model") {
    for (_ <- 1 to 10) {
      val rows = Seq.fill(20)((sample(ints), sample(ints)))
      val got = eval("""{"$add": [{"$multiply": ["$x", 3]},
                        {"$subtract": ["$y", 7]}, 1]}""", rows)
      assert(got == rows.map { case (x, y) => x * 3 + (y - 7) + 1 })
      val gotAbs = eval("""{"$abs": {"$subtract": ["$x", "$y"]}}""", rows)
      assert(gotAbs == rows.map { case (x, y) => math.abs(x - y) })
    }
  }

  test("$cond/$switch agree with Scala model") {
    for (_ <- 1 to 10) {
      val rows = Seq.fill(20)((sample(ints), sample(ints)))
      val got = eval("""{"$cond": [{"$gt": ["$x", "$y"]}, "gt",
                        {"$cond": [{"$eq": ["$x", "$y"]}, "eq", "lt"]}]}""", rows)
      assert(got == rows.map { case (x, y) =>
        if (x > y) "gt" else if (x == y) "eq" else "lt" })
      val sw = eval("""{"$switch": {"branches": [
          {"case": {"$lt": ["$x", 0]}, "then": "neg"},
          {"case": {"$eq": ["$x", 0]}, "then": "zero"}],
          "default": "pos"}}""", rows)
      assert(sw == rows.map { case (x, _) =>
        if (x < 0) "neg" else if (x == 0) "zero" else "pos" })
    }
  }

  test("array pipeline ($range/$map/$filter/$reduce) agrees with Scala model") {
    for (_ <- 1 to 10) {
      val n = sample(Gen.choose(0, 12))
      val rows = Seq((n, 0))
      val got = eval(
        s"""{"$$reduce": {
              "input": {"$$filter": {
                "input": {"$$map": {"input": {"$$range": [0, "$$x"]},
                                    "as": "i", "in": {"$$multiply": ["$$$$i", "$$$$i"]}}},
                "cond": {"$$eq": [{"$$mod": ["$$$$this", 2]}, 0]}}},
              "initialValue": 0, "in": {"$$add": ["$$$$value", "$$$$this"]}}}""", rows)
      val expect = (0 until n).map(i => i * i).filter(_ % 2 == 0).sum
      assert(got == Seq(expect), s"n=$n")
    }
  }
}
