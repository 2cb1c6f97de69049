package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** PhraseTf (graft_phrase_tf) — the codegen'd phrase-occurrence
  * primitive behind $search.phrase and find-$text. Pins the contract the
  * replaced HOF formulation carried (slop window semantics, greedy
  * in-order completion, null-doc → 0.0) against hand-computed counts,
  * both codegen'd and interpreted paths. */
class PhraseTfSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def tf(text: String, terms: Seq[String], slop: Int): Double = {
    GraftFunctions.register(spark)
    val df = Seq(Option(text)).toDF("text")
    df.select(call_function("graft_phrase_tf",
      graft.llmops.TextAnalysis.tokens(lower(col("text"))),
      array(terms.map(lit): _*), lit(slop)).as("tf"))
      .collect().head.getDouble(0)
  }

  test("slop 0: consecutive-run starts, overlaps count per start") {
    assert(tf("a b a b a", Seq("a", "b"), 0) == 2.0)
    assert(tf("a a a", Seq("a", "a"), 0) == 2.0)            // overlapping starts
    assert(tf("x y z", Seq("a", "b"), 0) == 0.0)
    assert(tf("a b c", Seq("a", "b", "c"), 0) == 1.0)
    assert(tf("a c b", Seq("a", "b"), 0) == 0.0)            // gap breaks slop 0
    assert(tf("one", Seq("one", "two"), 0) == 0.0)          // doc shorter than phrase
  }

  test("slop window: in-order completion within L-1+slop of the start") {
    assert(tf("a c b", Seq("a", "b"), 1) == 1.0)            // span 2 = L-1+1
    assert(tf("a c c b", Seq("a", "b"), 1) == 0.0)          // span 3 > window
    assert(tf("a c c b", Seq("a", "b"), 2) == 1.0)
    assert(tf("b a", Seq("a", "b"), 2) == 0.0)              // out of order never matches
    assert(tf("a x b x c", Seq("a", "b", "c"), 2) == 1.0)   // span 4 = L-1+2
    assert(tf("a x b x x c", Seq("a", "b", "c"), 2) == 0.0) // span 5 > window
  }

  test("single term counts occurrences; null doc scores 0.0 not null") {
    assert(tf("a b a b a", Seq("a"), 0) == 3.0)
    assert(tf("a b a b a", Seq("a"), 3) == 3.0)
    assert(tf(null, Seq("a", "b"), 0) == 0.0)
    assert(tf("", Seq("a"), 0) == 0.0)
  }

  test("interpreted eval agrees with codegen (no silent fallback drift)") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    def u(s: String) = UTF8String.fromString(s)
    val expr = PhraseTf(
      Literal(new GenericArrayData(Array[Any](u("a"), u("c"), u("b"))),
        ArrayType(StringType)),
      Literal(new GenericArrayData(Array[Any](u("a"), u("b"))),
        ArrayType(StringType)),
      Literal(1))
    assert(expr.eval(null) == 1.0)
    val exprNull = PhraseTf(
      Literal(null, ArrayType(StringType)),
      Literal(new GenericArrayData(Array[Any](u("a"))), ArrayType(StringType)),
      Literal(0))
    assert(exprNull.eval(null) == 0.0)
  }
}
