package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Porter stemming algorithm, implemented from the published paper
  * (M.F. Porter, "An algorithm for suffix stripping", Program 14(3),
  * 1980) — the stemmer Lucene's English analysis chain applies
  * (PorterStemFilter), which is what Atlas's `porterStemming` token
  * filter and the `lucene.english` analyzer run server-side. The
  * reference delegates `$search` to Atlas (P/api.py passes pipelines
  * through uninterpreted), so the stemmer lives engine-side here.
  *
  * This is the ORIGINAL published algorithm (ABLI→ABLE, no LOGI rule),
  * not the later "Porter2"/Snowball revision. Words of length ≤ 2 are
  * returned unchanged (the paper's implementation note). Only ASCII
  * a-z participate in measure/condition logic; the input is expected
  * lowercase (the analyzer chain lowercases first) — uppercase or
  * non-ASCII letters make the word pass through unchanged rather than
  * mis-stem. PorterSpec pins the paper's per-step example tables. */
object Porter {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var i = 0
    while (i < word.length) {
      val c = word.charAt(i)
      if (c < 'a' || c > 'z') return word // not a lowercase ASCII word
      i += 1
    }
    val b = new java.lang.StringBuilder(word)

    // ---- the paper's condition vocabulary over b[0..k] ----------------
    def k: Int = b.length - 1
    def cons(j: Int): Boolean = b.charAt(j) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => j == 0 || !cons(j - 1)
      case _ => true
    }
    /** m(): VC sequence count of b[0..upTo] — [C](VC)^m[V]. */
    def measure(upTo: Int): Int = {
      var n = 0
      var j = 0
      // skip initial consonants
      while (j <= upTo && cons(j)) j += 1
      while (j <= upTo) {
        // in vowels
        while (j <= upTo && !cons(j)) j += 1
        if (j > upTo) return n
        n += 1
        while (j <= upTo && cons(j)) j += 1
      }
      n
    }
    def vowelInStem(upTo: Int): Boolean =
      (0 to upTo).exists(j => !cons(j))
    def doubleC(j: Int): Boolean =
      j >= 1 && b.charAt(j) == b.charAt(j - 1) && cons(j)
    /** *o: stem ends cvc where the final c is not w, x or y. */
    def cvc(j: Int): Boolean =
      j >= 2 && cons(j) && !cons(j - 1) && cons(j - 2) && {
        val c = b.charAt(j)
        c != 'w' && c != 'x' && c != 'y'
      }
    def endsWith(s: String): Boolean =
      b.length >= s.length &&
        b.indexOf(s, b.length - s.length) == b.length - s.length
    /** stem length (last index) if the suffix were removed */
    def stemEnd(s: String): Int = b.length - s.length - 1
    def setTo(suffixLen: Int, repl: String): Unit = {
      b.setLength(b.length - suffixLen)
      b.append(repl): Unit
    }

    // ---- Step 1a ------------------------------------------------------
    if (endsWith("sses")) setTo(4, "ss")
    else if (endsWith("ies")) setTo(3, "i")
    else if (endsWith("ss")) ()
    else if (endsWith("s")) setTo(1, "")

    // ---- Step 1b ------------------------------------------------------
    var cleanup = false
    if (endsWith("eed")) {
      if (measure(stemEnd("eed")) > 0) setTo(3, "ee")
    } else if (endsWith("ed") && vowelInStem(stemEnd("ed"))) {
      setTo(2, ""); cleanup = true
    } else if (endsWith("ing") && vowelInStem(stemEnd("ing"))) {
      setTo(3, ""); cleanup = true
    }
    if (cleanup) {
      if (endsWith("at")) setTo(2, "ate")
      else if (endsWith("bl")) setTo(2, "ble")
      else if (endsWith("iz")) setTo(2, "ize")
      else if (doubleC(k)) {
        val c = b.charAt(k)
        if (c != 'l' && c != 's' && c != 'z') b.setLength(b.length - 1)
      } else if (measure(k) == 1 && cvc(k)) b.append('e'): Unit
    }

    // ---- Step 1c ------------------------------------------------------
    if (endsWith("y") && vowelInStem(stemEnd("y")))
      b.setCharAt(k, 'i')

    // rule application helper for steps 2-4. The paper: within a step
    // only the rule with the longest matching suffix is tried; if its
    // condition fails, NO rule of the step applies. Lists below are
    // ordered so any overlapping suffixes appear longest-first.
    def rules(rs: (String, String)*)(cond: (String, Int) => Boolean): Unit = {
      val it = rs.iterator
      var done = false
      while (!done && it.hasNext) {
        val (suf, repl) = it.next()
        if (endsWith(suf)) {
          done = true // the matching suffix decides, fire or not
          if (cond(suf, stemEnd(suf))) setTo(suf.length, repl)
        }
      }
    }

    // ---- Step 2 (m > 0) — the paper's 20-rule table --------------------
    rules(
      "ational" -> "ate", "tional" -> "tion",
      "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize",
      "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "ousli" -> "ous", "eli" -> "e",
      "ization" -> "ize", "ation" -> "ate", "ator" -> "ate",
      "alism" -> "al",
      "iveness" -> "ive", "fulness" -> "ful", "ousness" -> "ous",
      "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble"
    )((_, se) => measure(se) > 0)

    // ---- Step 3 (m > 0) ------------------------------------------------
    rules(
      "icate" -> "ic", "ative" -> "", "alize" -> "al",
      "iciti" -> "ic", "ical" -> "ic", "ful" -> "", "ness" -> ""
    )((_, se) => measure(se) > 0)

    // ---- Step 4 (m > 1) ------------------------------------------------
    rules(
      "al" -> "", "ance" -> "", "ence" -> "", "er" -> "", "ic" -> "",
      "able" -> "", "ible" -> "", "ant" -> "", "ement" -> "",
      "ment" -> "", "ent" -> "", "ion" -> "", "ou" -> "",
      "ism" -> "", "ate" -> "", "iti" -> "", "ous" -> "",
      "ive" -> "", "ize" -> ""
    ) { (suf, se) =>
      // "ion" only when the stem ends s or t — the paper's (*S or *T) ION
      measure(se) > 1 && (suf != "ion" ||
        b.charAt(se) == 's' || b.charAt(se) == 't')
    }

    // ---- Step 5a -------------------------------------------------------
    if (endsWith("e")) {
      val m = measure(k - 1)
      if (m > 1 || (m == 1 && !cvc(k - 1))) b.setLength(b.length - 1)
    }
    // ---- Step 5b -------------------------------------------------------
    if (doubleC(k) && b.charAt(k) == 'l' && measure(k) > 1)
      b.setLength(b.length - 1)

    b.toString
  }

  /** Codegen entry point (UTF8String in/out, null-safe at the
    * expression layer). */
  def stemUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(stem(s.toString))
}

/** `porter_stem(str)` — scalar expression form; stays inside
  * whole-stage codegen (one static call per row, no UDF wrapping). */
case class PorterStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    Porter.stemUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Porter.stemUtf8($c)")
  override def prettyName: String = "porter_stem"
  override protected def withNewChildInternal(c: Expression): PorterStem =
    copy(child = c)
}
