package graft.mql

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Randomized Mongo-parity sweep for the byte- vs code-point-indexed
  * string expressions over strings mixing 1/2/3/4-byte UTF-8 characters
  * (the 4-byte emoji is one CODE POINT but two UTF-16 units — the case
  * that separates code-point semantics from String.length arithmetic).
  * Models implement the documented server contracts directly. */
class StringExprPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private lazy val one = Seq(1).toDF("x")

  private def eval(expr: String): Any =
    one.select(ExprCompiler.compile(Mql.parse(expr)).as("r")).head.get(0)

  private val alphabet = Seq("a", "b", "é", "€", "😀")

  private def randStr(rnd: scala.util.Random, maxLen: Int): String =
    Seq.fill(rnd.nextInt(maxLen + 1))(alphabet(rnd.nextInt(alphabet.size))).mkString

  private def cps(s: String): Seq[String] = {
    // split into code points (not UTF-16 units)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      val n = Character.charCount(s.codePointAt(i))
      out += s.substring(i, i + n)
      i += n
    }
    out.toSeq
  }

  private def j(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  test("$substrCP / $strLenCP ≡ code-point models (300 draws)") {
    val rnd = new scala.util.Random(3L)
    for (_ <- 1 to 300) {
      val s = randStr(rnd, 8)
      val pts = cps(s)
      assert(eval(s"""{"$$strLenCP": ${j(s)}}""") == pts.size, s"strLenCP '$s'")
      val start = rnd.nextInt(pts.size + 3)
      val len = rnd.nextInt(pts.size + 3)
      val expect = pts.slice(start, start + len).mkString
      assert(eval(s"""{"$$substrCP": [${j(s)}, $start, $len]}""") == expect,
        s"substrCP '$s' $start $len")
    }
  }

  test("$substrBytes ≡ the byte-range model incl. the mid-character raise (300 draws)") {
    val rnd = new scala.util.Random(5L)
    var raises = 0
    for (_ <- 1 to 300) {
      val s = randStr(rnd, 6)
      val bytes = s.getBytes("UTF-8")
      val start = rnd.nextInt(bytes.length + 3)
      val len = rnd.nextInt(bytes.length + 3)
      def cont(i: Int): Boolean = (bytes(i) & 0xC0) == 0x80
      val endI = math.min(start + len, bytes.length)
      val expectRaise = start < bytes.length &&
        (cont(start) || (endI < bytes.length && cont(endI)))
      val q = s"""{"$$substrBytes": [${j(s)}, $start, $len]}"""
      if (expectRaise) {
        raises += 1
        val e = intercept[Exception](eval(q))
        assert(e.getMessage.contains("$substrBytes"), s"'$s' $start $len: $e")
      } else {
        val expect =
          if (start >= bytes.length) ""
          else new String(bytes.slice(start, endI), "UTF-8")
        assert(eval(q) == expect, s"substrBytes '$s' $start $len")
      }
    }
    assert(raises > 20, s"generator degenerate: only $raises raising draws")
  }

  test("$indexOfCP / $indexOfBytes windows ≡ the search models (300 draws)") {
    val rnd = new scala.util.Random(9L)
    for (_ <- 1 to 300) {
      val s = randStr(rnd, 8)
      val sub = randStr(rnd, 2) match { case "" => "a"; case t => t }
      val pts = cps(s)
      val start = rnd.nextInt(pts.size + 3)
      val end = rnd.nextInt(pts.size + 3)
      // CP window: occurrence fully inside [start, end), index in the
      // original string's code points
      val win = pts.slice(start, end).mkString
      val cpIdx = cps(win).indexOfSlice(cps(sub)) match {
        case -1 => -1L
        case i  => (start + i).toLong
      }
      val gotCp = eval(
        s"""{"$$indexOfCP": [${j(s)}, ${j(sub)}, $start, $end]}""") match {
        case n: Number => n.longValue(); case other => other
      }
      assert(gotCp == cpIdx, s"indexOfCP '$s' '$sub' [$start,$end)")

      // byte window
      val bytes = s.getBytes("UTF-8")
      val needle = sub.getBytes("UTF-8")
      val bStart = rnd.nextInt(bytes.length + 3)
      val bEnd = rnd.nextInt(bytes.length + 3)
      val bIdx: Long =
        if (bStart > bytes.length) -1L
        else {
          val lim = math.min(bEnd, bytes.length) - needle.length
          (bStart to math.max(lim, -1)).find(i =>
            needle.indices.forall(k => bytes(i + k) == needle(k)))
            .map(_.toLong).getOrElse(-1L)
        }
      assert(eval(
        s"""{"$$indexOfBytes": [${j(s)}, ${j(sub)}, $bStart, $bEnd]}""") == bIdx,
        s"indexOfBytes '$s' '$sub' [$bStart,$bEnd)")
    }
  }
}
