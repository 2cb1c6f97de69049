package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The Porter 1980 paper's own per-step example tables, pinned end to
  * end (each pair is the full algorithm's output for the word, derived
  * from the paper's step examples), plus the famous whole-word
  * reductions and the guard rails (short words, non-ASCII, digits). */
class PorterSpec extends AnyFunSuite {

  private def check(pairs: (String, String)*): Unit =
    pairs.foreach { case (w, s) =>
      assert(Porter.stem(w) == s, s"stem($w) was ${Porter.stem(w)}, want $s")
    }

  test("step 1a: plurals") {
    check("caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat")
  }

  test("step 1b: ed/ing with cleanup") {
    check(
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
      "filing" -> "file")
  }

  test("step 1c: y → i after a vowel-bearing stem") {
    check("happy" -> "happi", "sky" -> "sky")
  }

  test("step 2: the double-suffix table") {
    check(
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "valenci" -> "valenc",
      "hesitanci" -> "hesit", "digitizer" -> "digit",
      "conformabli" -> "conform", "radicalli" -> "radic",
      "differentli" -> "differ", "vileli" -> "vile",
      "analogousli" -> "analog", "vietnamization" -> "vietnam",
      "predication" -> "predic", "operator" -> "oper",
      "feudalism" -> "feudal", "decisiveness" -> "decis",
      "hopefulness" -> "hope", "callousness" -> "callous",
      "formaliti" -> "formal", "sensitiviti" -> "sensit",
      "sensibiliti" -> "sensibl")
  }

  test("step 3") {
    check(
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electriciti" -> "electr",
      "electrical" -> "electr", "hopeful" -> "hope",
      "goodness" -> "good")
  }

  test("step 4: single-suffix strips at m > 1") {
    check(
      "revival" -> "reviv", "allowance" -> "allow",
      "inference" -> "infer", "airliner" -> "airlin",
      "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
      "defensible" -> "defens", "irritant" -> "irrit",
      "replacement" -> "replac", "adjustment" -> "adjust",
      "dependent" -> "depend", "adoption" -> "adopt",
      "communism" -> "commun", "activate" -> "activ",
      "angulariti" -> "angular", "homologous" -> "homolog",
      "effective" -> "effect", "bowdlerize" -> "bowdler")
  }

  test("step 5: final e and double l") {
    check("probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll")
  }

  test("whole-word classics") {
    check(
      "generalizations" -> "gener", // the paper's flagship example
      "oscillators" -> "oscil",     // ditto
      "connection" -> "connect", "connections" -> "connect",
      "connected" -> "connect", "connecting" -> "connect",
      "running" -> "run", "argument" -> "argument",
      "arguments" -> "argument")
  }

  test("guard rails: short, non-lowercase-ASCII, digit-bearing words " +
       "pass through") {
    check("as" -> "as", "is" -> "is", "be" -> "be", "a" -> "a", "" -> "",
      "Sky" -> "Sky", "naïve" -> "naïve", "b2b" -> "b2b", "x86" -> "x86")
  }

  test("the expression form equals the Scala form and stays codegen'd") {
    import org.apache.spark.sql.functions._
    val spark = graft.SparkFixture.spark
    import spark.implicits._
    GraftFunctions.register(spark)
    val words = Seq("generalizations", "connections", "happy", "sky",
      "running", null)
    // build over range() so the projection cannot constant-fold into a
    // LocalTableScan — the codegen assertion needs a real projection
    val arr = array(words.map(w =>
      if (w == null) lit(null).cast("string") else lit(w)): _*)
    val df = spark.range(words.length)
      .select(element_at(arr, (col("id") + 1).cast("int")).as("w"))
      .select(col("w"), call_function("porter_stem", col("w")).as("s"))
      .orderBy(col("w").asc_nulls_last)
    val got = df.collect().map(r => Option(r.getString(1)).orNull)
    val expect = words.filter(_ != null).sorted.map(Porter.stem) :+ null
    assert(got.toSeq == expect)
    // stays inside whole-stage codegen: the Project carrying the stem
    // is starred (AQE plan strings mark codegen'd stages with *(n))
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project .*porter_stem""".r
      .findFirstIn(plan).isDefined, plan)
  }
}
