package graft.mql

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Randomized Mongo-parity sweep for the fiddly array expressions: each
  * operator is checked against a direct Scala model of the documented
  * server semantics over random arrays (with nulls), indices, and
  * window bounds. This is the bug class a hand-picked corner matrix
  * keeps missing ($slice's negative-position off-by-one survived four
  * rounds of example tests). */
class ArrayExprPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private lazy val one = Seq(1).toDF("x")

  private def eval(expr: String): Any =
    one.select(ExprCompiler.compile(Mql.parse(expr)).as("r")).head.get(0)

  private def arrJson(a: Seq[Option[Int]]): String =
    a.map(_.map(_.toString).getOrElse("null")).mkString("[", ", ", "]")

  private def got(expr: String): Seq[Option[Int]] =
    eval(expr).asInstanceOf[scala.collection.Seq[Any]].toSeq
      .map(v => Option(v).map(_.asInstanceOf[Int]))

  test("$slice 2/3-arg ≡ the documented clamp semantics (300 draws)") {
    val rnd = new scala.util.Random(7L)
    for (_ <- 1 to 300) {
      val a = Seq.fill(rnd.nextInt(8))(
        if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(100)))
      if (rnd.nextBoolean()) {
        // 2-arg: n ≥ 0 → first n; n < 0 → LAST |n| (whole array when
        // |n| ≥ len — the server clamps, never empties)
        val k = rnd.nextInt(21) - 10
        val expect = if (k >= 0) a.take(k) else a.takeRight(-k)
        assert(got(s"""{"$$slice": [${arrJson(a)}, $k]}""") == expect,
          s"slice2 a=$a k=$k")
      } else {
        // 3-arg: n > 0; pos ≥ 0 starts there (past-end → empty),
        // pos < 0 starts at max(len + pos, 0)
        val pos = rnd.nextInt(21) - 10
        val k = 1 + rnd.nextInt(6)
        val start = if (pos >= 0) pos else math.max(a.size + pos, 0)
        val expect = a.slice(start, start + k)
        assert(got(s"""{"$$slice": [${arrJson(a)}, $pos, $k]}""") == expect,
          s"slice3 a=$a pos=$pos k=$k")
      }
    }
  }

  test("$arrayElemAt / $indexOfArray ≡ index semantics (300 draws)") {
    val rnd = new scala.util.Random(11L)
    for (_ <- 1 to 300) {
      val a = Seq.fill(1 + rnd.nextInt(7))(Some(rnd.nextInt(5)): Option[Int])
      val idx = rnd.nextInt(2 * a.size + 4) - (a.size + 2)
      // in [-len, len-1] → the element; outside → missing (null)
      val expectElem: Any =
        if (idx >= -a.size && idx < a.size)
          a(if (idx < 0) a.size + idx else idx).orNull
        else null
      assert(eval(s"""{"$$arrayElemAt": [${arrJson(a)}, $idx]}""") == expectElem,
        s"elemAt a=$a idx=$idx")

      // $indexOfArray with a search window: the returned index is in
      // the ORIGINAL array; not-found (or empty window) → -1
      val target = rnd.nextInt(5)
      val start = rnd.nextInt(a.size + 3)
      val end = rnd.nextInt(a.size + 3)
      val window = a.zipWithIndex.slice(start, end)
      val expectIdx = window.collectFirst {
        case (Some(v), i) if v == target => i.toLong }.getOrElse(-1L)
      assert(eval(
        s"""{"$$indexOfArray": [${arrJson(a)}, $target, $start, $end]}""")
        == expectIdx, s"indexOf a=$a t=$target w=[$start,$end)")
    }
  }

  test("$firstN/$lastN keep nulls, $minN/$maxN drop them (200 draws)") {
    val rnd = new scala.util.Random(13L)
    for (_ <- 1 to 200) {
      val a = Seq.fill(1 + rnd.nextInt(7))(
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(50)))
      val n = 1 + rnd.nextInt(8)
      def q(op: String): String =
        s"""{"$$$op": {"input": ${arrJson(a)}, "n": $n}}"""
      assert(got(q("firstN")) == a.take(n), s"firstN a=$a n=$n")
      assert(got(q("lastN")) == a.takeRight(n), s"lastN a=$a n=$n")
      val nonNull = a.flatten
      assert(got(q("minN")) == nonNull.sorted.take(n).map(Some(_)),
        s"minN a=$a n=$n")
      assert(got(q("maxN")) == nonNull.sorted(Ordering[Int].reverse).take(n)
        .map(Some(_)), s"maxN a=$a n=$n")
    }
  }

  test("$range ≡ the integer sequence semantics (200 draws)") {
    val rnd = new scala.util.Random(17L)
    for (_ <- 1 to 200) {
      val start = rnd.nextInt(21) - 10
      val end = rnd.nextInt(21) - 10
      val step = { val s = rnd.nextInt(9) - 4; if (s == 0) 1 else s }
      val expect = Range(start, end, step).toSeq
      assert(got(s"""{"$$range": [$start, $end, $step]}""")
        == expect.map(Some(_)), s"range($start,$end,$step)")
    }
  }
}
