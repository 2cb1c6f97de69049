package graft.mql

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Property layer for the $integral decomposition: the staged
  * lag-increment + frame-sum plan must agree with a direct Scala model
  * of the original trapezoid fold — (prev t, prev y, running area)
  * threaded through the frame's points in order, null-poisoning and
  * all — on arbitrary series with nulls and arbitrary document frames.
  * (The fold was O(frame²) per partition; the decomposition is what
  * ships, so this pins their equivalence.) */
class WindowCalculusPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val yGen: Gen[Option[Double]] = Gen.frequency(
    5 -> Gen.choose(-50, 50).map(v => Some(v.toDouble)),
    1 -> Gen.const(None))
  private val seriesGen: Gen[List[Option[Double]]] =
    Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, yGen))
  private val boundGen: Gen[(String, String)] = Gen.oneOf(
    // spanning frames
    ("\"unbounded\"", "\"current\""), ("\"unbounded\"", "2"),
    ("-3", "0"), ("-1", "0"), ("-3", "2"), ("0", "2"),
    // pure-past / pure-future frames (empty at the partition edges —
    // the fold integrates an empty frame to 0.0)
    ("-2", "-1"), ("1", "3"))

  private def sample[A](g: Gen[A]): A =
    Iterator.continually(g.sample).flatten.next()

  /** The original fold, verbatim in Scala: acc = (prevT, prevY, area);
    * a point with prevT set adds (y+prevY)/2*(t-prevT) — null if any
    * component is null, and a null area stays null (poisoning). */
  private def foldModel(pts: Seq[(Double, Option[Double])]): Option[Double] = {
    var prev: Option[(Double, Option[Double])] = None
    var area: Option[Double] = Some(0.0)
    pts.foreach { case (t, y) =>
      prev match {
        case None => // first frame point contributes 0
        case Some((pt, py)) =>
          val trap = for (a <- y; b <- py) yield (a + b) / 2 * (t - pt)
          area = for (s <- area; tr <- trap) yield s + tr
      }
      prev = Some((t, y))
    }
    area
  }

  test("standard window accumulators equal the Scala model on random frames") {
    for (round <- 1 to 25) {
      val series = sample(seriesGen)
      val (lo, hi) = sample(boundGen)
      val df = series.zipWithIndex
        .map { case (y, i) => (i.toLong, "g", i.toDouble, y) }
        .toDF("id", "grp", "t", "y")
      val out = PipelineCompiler.run(df, s"""[
        {"$$setWindowFields": {"partitionBy": "$$grp", "sortBy": {"t": 1},
          "output": {
            "s": {"$$sum": "$$y", "window": {"documents": [$lo, $hi]}},
            "mn": {"$$min": "$$y", "window": {"documents": [$lo, $hi]}},
            "mx": {"$$max": "$$y", "window": {"documents": [$lo, $hi]}},
            "c": {"$$count": {}, "window": {"documents": [$lo, $hi]}},
            "a": {"$$avg": "$$y", "window": {"documents": [$lo, $hi]}}}}},
        {"$$sort": {"id": 1}}]""")
        .select("s", "mn", "mx", "c", "a").collect()
      val n = series.length
      series.indices.foreach { i =>
        val a = if (lo == "\"unbounded\"") 0 else math.max(0, i + lo.toInt)
        val b = if (hi == "\"current\"") i else math.min(n - 1, i + hi.toInt)
        val frame = if (a > b) Seq.empty
          else (a to b).flatMap(j => series(j))
        val r = out(i)
        def d(k: Int): Option[Double] =
          if (r.isNullAt(k)) None else Some(r.getDouble(k))
        // Mongo $sum over an all-null/empty window is 0, not null
        assert(math.abs(r.getDouble(0) - frame.sum) < 1e-9,
          s"round $round row $i sum")
        assert(d(1) == (if (frame.isEmpty) None else Some(frame.min)),
          s"round $round row $i min")
        assert(d(2) == (if (frame.isEmpty) None else Some(frame.max)),
          s"round $round row $i max")
        // $count counts DOCUMENTS in frame (nulls included)
        val docs = if (a > b) 0 else b - a + 1
        assert(r.getLong(3) == docs, s"round $round row $i count")
        val avg = if (frame.isEmpty) None
          else Some(frame.sum / frame.size)
        assert((d(4), avg) match {
          case (None, None) => true
          case (Some(g), Some(w)) => math.abs(g - w) < 1e-9
          case _ => false
        }, s"round $round row $i avg: ${d(4)} vs $avg")
      }
    }
  }

  test("$integral frame sums equal the trapezoid fold on random series") {
    for (round <- 1 to 40) {
      val series = sample(seriesGen)
      val (lo, hi) = sample(boundGen)
      val df = series.zipWithIndex
        .map { case (y, i) => (i.toLong, "g", i.toDouble, y) }
        .toDF("id", "grp", "t", "y")
      val out = PipelineCompiler.run(df, s"""[
        {"$$setWindowFields": {"partitionBy": "$$grp", "sortBy": {"t": 1},
          "output": {"ar": {"$$integral": {"input": "$$y"},
                     "window": {"documents": [$lo, $hi]}}}}},
        {"$$sort": {"id": 1}}]""")
        .select("ar").collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      val n = series.length
      val expected = series.indices.map { i =>
        val a = if (lo == "\"unbounded\"") 0 else math.max(0, i + lo.toInt)
        val b = if (hi == "\"current\"") i else math.min(n - 1, i + hi.toInt)
        if (a > b) Some(0.0) // empty frame integrates to 0
        else foldModel((a to b).map(j => (j.toDouble, series(j))))
      }
      out.toSeq.zip(expected).zipWithIndex.foreach { case ((got, want), i) =>
        val same = (got, want) match {
          case (None, None) => true
          case (Some(g), Some(w)) => math.abs(g - w) < 1e-9
          case _ => false
        }
        assert(same,
          s"round $round row $i frame [$lo,$hi]: got $got want $want " +
            s"series=$series")
      }
    }
  }
}
