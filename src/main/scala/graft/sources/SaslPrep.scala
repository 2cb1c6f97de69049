package graft.sources

import java.text.Normalizer

/** SASLprep (RFC 4013) — the stringprep profile SCRAM requires for
  * usernames and passwords, implemented from the RFC's table
  * selections over RFC 3454 appendices (the tables are short enough to
  * carry as explicit ranges; no library exists on this classpath).
  *
  * Pipeline, exactly the RFC's order:
  *   1. Map: B.1 "commonly mapped to nothing" → removed; C.1.2
  *      non-ASCII spaces → U+0020. (U+200B sits in both tables; B.1 is
  *      applied first, matching RFC 4013 §2.1's listing order and the
  *      behavior of the widely deployed implementations.)
  *   2. Normalize: Unicode NFKC.
  *   3. Prohibit: C.1.2, C.2.1, C.2.2, C.3–C.9 (RFC 4013 §2.3).
  *   4. Bidi (RFC 3454 §6): a string containing RandALCat (R/AL)
  *      characters must contain no LCat character and must both start
  *      and end with a RandALCat character.
  *   5. Unassigned code points are prohibited (stored-string rule —
  *      credentials are stored strings, RFC 4013 §2.5).
  *
  * Correctness is pinned by SaslPrepSpec against the RFC 4013 §3
  * examples (soft hyphen dropped, U+00AA → 'a', U+2168 → "IX",
  * prohibited control, bidi violation). The reference delegates auth
  * to the MongoDB driver (api.py uses pymongo's connection); this is
  * the engine-side twin of that driver behavior. */
object SaslPrep {

  private def in(cp: Int, ranges: Array[Int]): Boolean = {
    // ranges is a flat [lo0, hi0, lo1, hi1, ...] array, sorted by lo
    var i = 0
    while (i < ranges.length) {
      if (cp >= ranges(i) && cp <= ranges(i + 1)) return true
      i += 2
    }
    false
  }

  // RFC 3454 B.1 — commonly mapped to nothing
  private val mapToNothing = Array(
    0x00AD, 0x00AD, 0x034F, 0x034F, 0x1806, 0x1806, 0x180B, 0x180D,
    0x200B, 0x200D, 0x2060, 0x2060, 0xFE00, 0xFE0F, 0xFEFF, 0xFEFF)

  // RFC 3454 C.1.2 — non-ASCII space characters
  private val nonAsciiSpace = Array(
    0x00A0, 0x00A0, 0x1680, 0x1680, 0x2000, 0x200B,
    0x202F, 0x202F, 0x205F, 0x205F, 0x3000, 0x3000)

  // RFC 4013 §2.3 prohibited output: C.1.2, C.2.1, C.2.2, C.3–C.9
  private val prohibited: Array[Int] = {
    val r = Array.newBuilder[Int]
    def add(lo: Int, hi: Int): Unit = { r += lo; r += hi }
    // C.2.1 ASCII control
    add(0x0000, 0x001F); add(0x007F, 0x007F)
    // C.2.2 non-ASCII control
    add(0x0080, 0x009F); add(0x06DD, 0x06DD); add(0x070F, 0x070F)
    add(0x180E, 0x180E); add(0x200C, 0x200D); add(0x2028, 0x2029)
    add(0x2060, 0x2063); add(0x206A, 0x206F); add(0xFEFF, 0xFEFF)
    add(0xFFF9, 0xFFFC); add(0x1D173, 0x1D17A)
    // C.3 private use
    add(0xE000, 0xF8FF); add(0xF0000, 0xFFFFD); add(0x100000, 0x10FFFD)
    // C.4 non-character code points
    add(0xFDD0, 0xFDEF)
    var plane = 0
    while (plane <= 16) {
      add((plane << 16) | 0xFFFE, (plane << 16) | 0xFFFF); plane += 1
    }
    // C.5 surrogate codes (unpaired surrogates; paired ones never
    // surface as code points from codePointAt)
    add(0xD800, 0xDFFF)
    // C.6 inappropriate for plain text
    add(0xFFF9, 0xFFFD)
    // C.7 inappropriate for canonical representation
    add(0x2FF0, 0x2FFB)
    // C.8 change display properties / deprecated
    add(0x0340, 0x0341); add(0x200E, 0x200F); add(0x202A, 0x202E)
    add(0x206A, 0x206F)
    // C.9 tagging characters
    add(0xE0001, 0xE0001); add(0xE0020, 0xE007F)
    // C.1.2 is prohibited too (mapped to space in step 1, but NFKC or
    // raw input can reintroduce only U+0020 which is allowed — keep the
    // table anyway for strictness against direct non-ASCII spaces)
    nonAsciiSpace.grouped(2).foreach(g => add(g(0), g(1)))
    r.result()
  }

  private def isRandAL(cp: Int): Boolean = {
    val d = Character.getDirectionality(cp)
    d == Character.DIRECTIONALITY_RIGHT_TO_LEFT ||
      d == Character.DIRECTIONALITY_RIGHT_TO_LEFT_ARABIC
  }
  private def isL(cp: Int): Boolean =
    Character.getDirectionality(cp) == Character.DIRECTIONALITY_LEFT_TO_RIGHT

  private def codePoints(s: String): Array[Int] = {
    val out = Array.newBuilder[Int]
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out += cp
      i += Character.charCount(cp)
    }
    out.result()
  }

  private def fail(what: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"SASLprep: $what $msg")

  /** Prepare a stored string (RFC 4013). Raises IllegalArgumentException
    * with a message naming `what` on prohibited output, bidi violation,
    * unassigned code points, or an empty result. */
  def prepare(s: String, what: String = "string"): String = {
    // 1. map
    val mapped = new java.lang.StringBuilder(s.length)
    codePoints(s).foreach { cp =>
      if (in(cp, mapToNothing)) ()                // B.1 → nothing
      else if (in(cp, nonAsciiSpace)) mapped.append(' ') // C.1.2 → space
      else mapped.appendCodePoint(cp)
    }
    // 2. NFKC
    val norm = Normalizer.normalize(mapped, Normalizer.Form.NFKC)
    val cps = codePoints(norm)
    // 3. prohibited output + 5. unassigned
    cps.foreach { cp =>
      if (in(cp, prohibited))
        fail(what, f"contains prohibited code point U+$cp%04X")
      if (!Character.isDefined(cp))
        fail(what, f"contains unassigned code point U+$cp%04X")
    }
    // 4. bidi
    if (cps.exists(isRandAL)) {
      if (cps.exists(isL))
        fail(what, "mixes right-to-left and left-to-right characters")
      if (!isRandAL(cps.head) || !isRandAL(cps.last))
        fail(what, "right-to-left string must start and end with " +
          "right-to-left characters")
    }
    if (norm.isEmpty) fail(what, "prepared to an empty string")
    norm
  }
}
