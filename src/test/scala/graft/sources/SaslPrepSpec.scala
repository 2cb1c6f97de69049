package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** RFC 4013 section-3 examples pinned byte for byte, plus the SCRAM
  * integration rows (non-ASCII credentials authenticate; escaped
  * usernames cross the attribute framing intact). All non-ASCII input
  * is spelled as \ u escapes so the fixture bytes are unambiguous. */
class SaslPrepSpec extends AnyFunSuite {

  // ---- the RFC's own example table ----------------------------------------
  test("RFC 4013 examples") {
    // #1  SOFT HYPHEN mapped to nothing
    assert(SaslPrep.prepare("I\u00ADX") === "IX")
    // #2  no transformation
    assert(SaslPrep.prepare("user") === "user")
    // #3  case preserved, will not match #2
    assert(SaslPrep.prepare("USER") === "USER")
    // #4  output is NFKC (FEMININE ORDINAL INDICATOR -> a)
    assert(SaslPrep.prepare("\u00AA") === "a")
    // #5  output is NFKC (ROMAN NUMERAL NINE -> IX)
    assert(SaslPrep.prepare("\u2168") === "IX")
    // #6  Error - prohibited character (BELL)
    val e6 = intercept[IllegalArgumentException](SaslPrep.prepare("\u0007"))
    assert(e6.getMessage.contains("prohibited"))
    // #7  Error - bidi violation (ALEF followed by a European digit)
    val e7 = intercept[IllegalArgumentException](
      SaslPrep.prepare("\u06271"))
    assert(e7.getMessage.contains("right-to-left"))
  }

  test("mapping and prohibition details") {
    // non-ASCII spaces map to U+0020 (NO-BREAK SPACE, EN QUAD)
    assert(SaslPrep.prepare("a\u00A0b") === "a b")
    assert(SaslPrep.prepare("a\u2000b") === "a b")
    // ZERO WIDTH SPACE is in both B.1 and C.1.2 - B.1 wins (-> nothing)
    assert(SaslPrep.prepare("a\u200Bb") === "ab")
    // ZWJ/ZWNJ are mapped to nothing (B.1), never reach the C.2.2 check
    assert(SaslPrep.prepare("a\u200Db") === "ab")
    // NFKC recombination happens after mapping
    assert(SaslPrep.prepare("\u2168\u00AD") === "IX")
    // private use, direction override, interlinear annotation refuse
    for (bad <- Seq("\uE000", "a\u202Eb", "a\uFFF9b"))
      assert(intercept[IllegalArgumentException](SaslPrep.prepare(bad))
        .getMessage.contains("prohibited"))
    // non-characters refuse
    assert(intercept[IllegalArgumentException](SaslPrep.prepare("a\uFDD0b"))
      .getMessage.contains("prohibited"))
    // valid RTL string (all RandALCat) passes the bidi rule
    assert(SaslPrep.prepare("\u0627\u0644") === "\u0627\u0644")
    // empty result refuses (a password of only soft hyphens is no password)
    assert(intercept[IllegalArgumentException](SaslPrep.prepare("\u00AD"))
      .getMessage.contains("empty"))
  }

  test("idempotence: prepare(prepare(x)) == prepare(x) over 400 draws") {
    val rnd = new scala.util.Random(11)
    // mixed alphabet: plain ASCII, mapped-to-nothing, non-ASCII space,
    // NFKC-unstable compatibility chars, combining marks
    val alphabet = ("abcXYZ09.,;!" + "\u00AD\u200B" + "\u00A0\u2000" +
      "\u00AA\u2168\uFB01" + "\u0301\u0308").toCharArray
    var prepared = 0
    (1 to 400).foreach { _ =>
      val s = Array.fill(1 + rnd.nextInt(12))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val once =
        try Some(SaslPrep.prepare(s))
        catch { case _: IllegalArgumentException => None }
      once.foreach { p =>
        prepared += 1
        assert(SaslPrep.prepare(p) == p, s"not idempotent on '$s'")
      }
    }
    assert(prepared > 100, s"fixture alphabet too hostile: $prepared")
  }

  // ---- SCRAM integration ---------------------------------------------------

  private def converse(client: Scram.Client, server: Scram.Server): Unit = {
    val sf = server.serverFirst(client.clientFirst)
    val fin = server.serverFinal(client.clientFinal(sf))
    client.verifyServerFinal(fin)
  }

  test("SCRAM: NFKC-equivalent passwords authenticate") {
    val salt = Array.tabulate[Byte](16)(_.toByte)
    // credential stored from "password"; client types p + U+00AA + ssword,
    // which SASLprep normalizes to the same bytes
    val cred = Scram.credential("password", salt, 4096)
    converse(new Scram.Client("user", "p\u00AAssword"),
      new Scram.Server("user", cred))
    // soft hyphen in the typed password disappears
    val cred2 = Scram.credential("pencil", salt, 4096)
    converse(new Scram.Client("user", "pen\u00ADcil"),
      new Scram.Server("user", cred2))
  }

  test("SCRAM: usernames with ',' and '=' escape per RFC 5802") {
    val salt = Array.tabulate[Byte](16)(i => (i * 3).toByte)
    val cred = Scram.credential("pw-ok", salt, 4096)
    val c = new Scram.Client("na,me=x", "pw-ok")
    assert(c.clientFirstBare.startsWith("n=na=2Cme=3Dx,r="))
    converse(c, new Scram.Server("na,me=x", cred))
    // a DIFFERENT user carrying the raw escape bytes must not collide:
    // '=' in the name escapes to =3D, so 'na=2Cme=3Dx' cannot alias
    val c2 = new Scram.Client("na=2Cme=3Dx", "pw-ok")
    assert(c2.clientFirstBare.startsWith("n=na=3D2Cme=3D3Dx,r="))
    val e = intercept[SecurityException](
      new Scram.Server("na,me=x", cred).serverFirst(c2.clientFirst))
    assert(e.getMessage.contains("unknown user"))
  }

  test("SCRAM: prohibited and bidi-invalid credentials refuse loudly") {
    val salt = new Array[Byte](16)
    assert(intercept[IllegalArgumentException](
      Scram.credential("pass\u0007word", salt, 4096))
      .getMessage.contains("prohibited"))
    assert(intercept[IllegalArgumentException](
      new Scram.Client("user", "\u06271"))
      .getMessage.contains("right-to-left"))
    // malformed escape in a wire-level saslname refuses server-side
    val cred = Scram.credential("x-pw", salt, 4096)
    val srv = new Scram.Server("user", cred)
    assert(intercept[SecurityException](
      srv.serverFirst("n,,n=bad=4Zname,r=abcdef"))
      .getMessage.contains("escape"))
  }
}
