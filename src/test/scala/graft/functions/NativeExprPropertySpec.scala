package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Property layer for the round-5 native expressions: each must agree
  * with an independent plain-Scala reference implementation on
  * generated inputs — the guard against the native pass drifting from
  * the semantics its Column/HOF predecessor (and the DuckDB twins)
  * defined. */
class NativeExprPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def sample[A](g: Gen[A]): A =
    Iterator.continually(g.sample).flatten.next()

  // word/line soup with duplicates, blank lines, stray tabs and spaces
  private val word = Gen.oneOf("spark", "fast", "DB", "a", "bb", "Spark", "x1")
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 40)
    ws <- Gen.listOfN(n, word)
    sep <- Gen.listOfN(math.max(n - 1, 0), Gen.oneOf(" ", "  ", "\n", " \n ", "\t"))
  } yield ws.zipAll(sep, "", "").flatMap { case (w, s) => Seq(w, s) }.mkString

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Reference gopherRepetition (the pre-native Column semantics). */
  private def gopherRef(text: String, n: Int): (Double, Double, Double) = {
    def trimSp(s: String) = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    val lines = text.split("\n", -1).map(trimSp).filter(_.nonEmpty)
    val counts = lines.groupBy(identity).view.mapValues(_.length).toMap
    val nL = lines.length
    val lineChars = lines.map(_.length.toLong).sum
    val uniqOnce = counts.collect { case (l, 1) => l.length.toLong }.sum
    val dlf = if (nL > 1) r6((nL - counts.size).toDouble / nL) else 0.0
    val dlcf = if (nL > 1 && lineChars > 0)
      r6((lineChars - uniqOnce).toDouble / lineChars) else 0.0
    val toks = trimSp(text.toLowerCase).split("\\s+").filter(_.nonEmpty)
    val tokChars = toks.map(_.length.toLong).sum
    val grams = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
    val tf =
      if (grams.isEmpty || tokChars == 0) 0.0
      else {
        val gc = grams.groupBy(identity).view.mapValues(_.length).toMap
        val (g, c) = gc.maxBy { case (g, c) => (c, g.length, g) }
        math.min(1.0, r6(c.toDouble * (g.length - (n - 1)) / tokChars))
      }
    (dlf, dlcf, tf)
  }

  test("GopherRep agrees with the reference model on generated text") {
    for (_ <- 1 to 5) {
      val rows = Seq.fill(30)(sample(textGen)).zipWithIndex.map(_.swap)
      val got = rows.toDF("id", "text")
        .select($"id", graft.llmops.TextAnalysis.gopherRepetition($"text").as("g"))
        .orderBy("id").collect()
        .map(r => (r.getStruct(1).getDouble(0), r.getStruct(1).getDouble(1),
          r.getStruct(1).getDouble(2)))
      val want = rows.map { case (_, t) => gopherRef(t, 2) }
      assert(got.toSeq == want)
    }
  }

  test("QuantInt8 invariants on generated vectors") {
    val vecGen = for {
      d <- Gen.choose(1, 32)
      vs <- Gen.listOfN(d, Gen.choose(-1000.0, 1000.0))
    } yield vs.toArray
    for (_ <- 1 to 5) {
      val rows = Seq.fill(25)(sample(vecGen)).zipWithIndex.map(_.swap)
      val got = rows.toDF("id", "vec")
        .select($"id", graft.llmops.Similarity.quantizeInt8Full($"vec").as("q"))
        .orderBy("id").collect()
      rows.zip(got).foreach { case ((_, v), r) =>
        val q = r.getStruct(1)
        val (mn, sc) = (q.getDouble(0), q.getDouble(1))
        val codes = q.getSeq[Int](2)
        assert(mn == v.min && sc == (v.max - v.min) / 255.0)
        assert(codes.length == v.length && codes.forall(c => c >= 0 && c <= 255))
        // per-element reconstruction within half a quantization step
        if (sc > 0) v.zip(codes).foreach { case (x, c) =>
          assert(math.abs(x - (mn + c * sc)) <= sc / 2 + 1e-9) }
        // mse equals the mean of squared reconstruction errors
        val errs = v.zip(codes).map { case (x, c) =>
          val e = x - (mn + c * sc); e * e }
        assert(math.abs(q.getDouble(3) - errs.sum / v.length) < 1e-9)
      }
    }
  }

  test("SearchHighlights reconstructs the token stream; hits = term matches") {
    val terms = Set("spark", "fast")
    for (_ <- 1 to 5) {
      val rows = Seq.fill(30)(sample(textGen)).zipWithIndex.map(_.swap)
      GraftFunctions.register(spark)
      val got = rows.toDF("id", "text")
        .select($"id", call_function("search_highlights", $"text",
          typedlit(terms.toSeq), lit("text")).as("h"))
        .orderBy("id").collect()
      rows.zip(got).foreach { case ((_, t), r) =>
        val toks = t.trim.split("\\s+").filter(_.nonEmpty)
        val hitCount = toks.count(w => terms(w.toLowerCase))
        val passages = r.getSeq[Row](1)
        if (hitCount == 0) assert(passages.isEmpty)
        else {
          val p = passages.head
          assert(p.getDouble(0) == hitCount.toDouble && p.getString(1) == "text")
          val texts = p.getSeq[Row](2)
          // concatenating the runs reproduces the token stream
          assert(texts.flatMap(_.getString(0).split(" ")).toSeq == toks.toSeq)
          // hit runs are exactly the matching tokens, in order
          assert(texts.filter(_.getString(1) == "hit").map(_.getString(0))
            == toks.filter(w => terms(w.toLowerCase)).toSeq)
          // runs alternate: no two adjacent "text" runs
          texts.map(_.getString(1)).sliding(2).foreach { w =>
            if (w.length == 2) assert(w != Seq("text", "text")) }
        }
      }
    }
  }
}
