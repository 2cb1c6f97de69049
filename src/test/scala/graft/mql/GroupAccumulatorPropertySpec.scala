package graft.mql

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Group-side accumulator semantics vs a direct Scala model of the
  * Mongo contract, on random data with nulls — the $group twin of the
  * window-accumulator property (which caught $sum's empty-input
  * deviation). Null handling is the battleground: numeric accumulators
  * ignore nulls ($sum of none = 0, $avg/$min/$max of none = null),
  * $push keeps nulls in position, $addToSet includes an explicit null,
  * $first/$last take the sorted row's value null or not. */
class GroupAccumulatorPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val vGen: Gen[Option[Double]] = Gen.frequency(
    3 -> Gen.choose(-9, 9).map(v => Some(v.toDouble)),
    1 -> Gen.const(None))
  private val rowsGen: Gen[List[(String, Option[Double])]] =
    Gen.choose(1, 30).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.oneOf("a", "b", "c"), vGen)))

  private def sample[A](g: Gen[A]): A =
    Iterator.continually(g.sample).flatten.next()

  test("numeric/array accumulators agree with the Mongo model") {
    for (round <- 1 to 20) {
      val rows = sample(rowsGen)
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (i.toLong, g, v) }.toDF("id", "grp", "v")
      val out = PipelineCompiler.run(df, """[
        {"$sort": {"id": 1}},
        {"$group": {"_id": "$grp",
          "s":  {"$sum": "$v"},   "a": {"$avg": "$v"},
          "mn": {"$min": "$v"},   "mx": {"$max": "$v"},
          "c":  {"$count": {}},
          "p":  {"$push": "$v"},  "f": {"$first": "$v"},
          "l":  {"$last": "$v"}}},
        {"$sort": {"_id": 1}}]""").collect()
      val byG = rows.zipWithIndex.groupBy(_._1._1)
      out.foreach { r =>
        val g = r.getString(0)
        val vs = byG(g).map(_._1._2) // in id order (input order)
        val valid = vs.flatten
        val ctx = s"round $round grp $g vs=$vs"
        assert(r.getDouble(1) == valid.sum, s"$ctx sum")
        val avg = if (valid.isEmpty) None else Some(valid.sum / valid.size)
        assert((if (r.isNullAt(2)) None else Some(r.getDouble(2))) ==
          avg.map(identity), s"$ctx avg")
        assert((if (r.isNullAt(3)) None else Some(r.getDouble(3))) ==
          (if (valid.isEmpty) None else Some(valid.min)), s"$ctx min")
        assert((if (r.isNullAt(4)) None else Some(r.getDouble(4))) ==
          (if (valid.isEmpty) None else Some(valid.max)), s"$ctx max")
        assert(r.getLong(5) == vs.size, s"$ctx count")
        // $push keeps nulls in position, in the pipeline's sort order
        val pushed = r.getSeq[Any](6).map(Option(_).map(_.asInstanceOf[Double]))
        assert(pushed == vs, s"$ctx push")
        assert((if (r.isNullAt(7)) None else Some(r.getDouble(7))) ==
          vs.head, s"$ctx first")
        assert((if (r.isNullAt(8)) None else Some(r.getDouble(8))) ==
          vs.last, s"$ctx last")
      }
    }
  }

  test("$addToSet includes an explicit null when the group saw one") {
    val df = Seq((1L, "a", Some(1.0)), (2L, "a", None: Option[Double]),
      (3L, "a", Some(1.0)), (4L, "b", Some(2.0)))
      .toDF("id", "grp", "v")
    val out = PipelineCompiler.run(df, """[
      {"$group": {"_id": "$grp", "s": {"$addToSet": "$v"}}},
      {"$sort": {"_id": 1}}]""").collect()
    val aSet = out(0).getSeq[Any](1).map(Option(_)).toSet
    assert(aSet == Set(Some(1.0), None))
    assert(out(1).getSeq[Any](1).map(Option(_)).toSet == Set(Some(2.0)))
  }
}
