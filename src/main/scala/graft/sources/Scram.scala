package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SCRAM-SHA-256 (RFC 5802 framing, RFC 7677 hash suite) — the auth
  * conversation MongoDB runs inside `saslStart`/`saslContinue`. Both
  * roles are implemented from the RFC with JDK crypto only
  * (PBKDF2WithHmacSHA256, HmacSHA256, SHA-256):
  *
  *   C: client-first  `n,,n=<user>,r=<cnonce>`
  *   S: server-first  `r=<cnonce+snonce>,s=<salt_b64>,i=<iters>`
  *   C: client-final  `c=biws,r=<nonce>,p=<ClientProof>`
  *   S: server-final  `v=<ServerSignature>`
  *
  * with SaltedPassword = PBKDF2(password, salt, i), ClientKey =
  * HMAC(SaltedPassword, "Client Key"), StoredKey = H(ClientKey),
  * ClientProof = ClientKey XOR HMAC(StoredKey, AuthMessage), and the
  * server holding only (salt, i, StoredKey, ServerKey) — it can VERIFY
  * a proof (H(proof XOR HMAC(StoredKey, auth)) == StoredKey) without
  * ever learning the password, and the client verifies the server's
  * signature back (mutual authentication). ScramSpec pins the RFC 7677
  * test-vector conversation byte for byte plus the tamper/wrong-
  * password refusals.
  *
  * Usernames and passwords are prepared with SASLprep (RFC 4013, see
  * [[SaslPrep]]) before hashing/comparison, and usernames are escaped
  * per RFC 5802 ('=' → "=3D", ',' → "=2C") so the attribute framing
  * can never be corrupted; the server unescapes and compares prepared
  * forms. Prohibited/bidi-invalid strings refuse loudly. */
object Scram {
  private val Mechanism = "SCRAM-SHA-256"

  private def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(data)
  }
  private def h(data: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(data)
  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }
  private def b64(b: Array[Byte]): String = Base64.getEncoder.encodeToString(b)
  private def unb64(s: String): Array[Byte] = Base64.getDecoder.decode(s)

  def saltedPassword(password: String, salt: Array[Byte],
                     iterations: Int): Array[Byte] = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iterations, 256)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  /** RFC 5802 saslname escaping, applied AFTER SASLprep: '=' and ','
    * would corrupt the comma-separated attribute framing. */
  private def escapeName(s: String): String =
    s.replace("=", "=3D").replace(",", "=2C")
  private def unescapeName(s: String): String = {
    // reject any '=' not part of the two legal escape sequences
    var i = s.indexOf('=')
    while (i >= 0) {
      val seq = s.slice(i, i + 3)
      if (seq != "=2C" && seq != "=3D")
        fail(s"malformed saslname escape in '$s'")
      i = s.indexOf('=', i + 3)
    }
    s.replace("=2C", ",").replace("=3D", "=")
  }

  /** What a server stores per user (mongod's user credential document):
    * never the password. */
  final case class Credential(salt: Array[Byte], iterations: Int,
                              storedKey: Array[Byte], serverKey: Array[Byte])

  def credential(password: String, salt: Array[Byte],
                 iterations: Int): Credential = {
    val sp = saltedPassword(SaslPrep.prepare(password, "password"),
      salt, iterations)
    val clientKey = hmac(sp, "Client Key".getBytes(UTF_8))
    Credential(salt, iterations, h(clientKey),
      hmac(sp, "Server Key".getBytes(UTF_8)))
  }

  /** Client side of the conversation. `nonce` is injectable for the
    * RFC test vector; production callers use the random default. */
  final class Client(user: String, password: String,
                     nonce: String = defaultNonce()) {
    private val preparedPassword = SaslPrep.prepare(password, "password")
    private val gs2 = "n,,"
    val clientFirstBare =
      s"n=${escapeName(SaslPrep.prepare(user, "username"))},r=$nonce"
    def clientFirst: String = gs2 + clientFirstBare

    private var authMessage: String = _
    private var salted: Array[Byte] = _

    /** server-first → client-final; raises on a nonce that does not
      * extend ours (a replayed/foreign conversation). */
    def clientFinal(serverFirst: String): String = {
      val attrs = parse(serverFirst)
      val combined = attrs.getOrElse("r", fail("server-first missing r"))
      if (!combined.startsWith(nonce))
        fail("server nonce does not extend the client nonce")
      val salt = unb64(attrs.getOrElse("s", fail("server-first missing s")))
      val iters = attrs.getOrElse("i", fail("server-first missing i")).toInt
      if (iters < 4096) fail(s"iteration count $iters below the RFC floor")
      salted = saltedPassword(preparedPassword, salt, iters)
      val channel = "c=" + b64(gs2.getBytes(UTF_8))
      val withoutProof = s"$channel,r=$combined"
      authMessage = s"$clientFirstBare,$serverFirst,$withoutProof"
      val clientKey = hmac(salted, "Client Key".getBytes(UTF_8))
      val proof = xor(clientKey,
        hmac(h(clientKey), authMessage.getBytes(UTF_8)))
      s"$withoutProof,p=${b64(proof)}"
    }

    /** server-final: VERIFY the server signature (mutual auth) —
      * raises if the server could not have known ServerKey. */
    def verifyServerFinal(serverFinal: String): Unit = {
      val attrs = parse(serverFinal)
      attrs.get("e").foreach(e => fail(s"server rejected authentication: $e"))
      val v = attrs.getOrElse("v", fail("server-final missing v"))
      val expect = hmac(hmac(salted, "Server Key".getBytes(UTF_8)),
        authMessage.getBytes(UTF_8))
      if (!MessageDigest.isEqual(unb64(v), expect))
        fail("server signature verification failed — not the real server")
    }
  }

  /** Server side: holds credentials, never passwords. */
  final class Server(user: String, cred: Credential,
                     snonce: String = defaultNonce()) {
    private val preparedUser = SaslPrep.prepare(user, "username")
    private var clientFirstBare: String = _
    private var combinedNonce: String = _
    private var authMessage: String = _

    def serverFirst(clientFirst: String): String = {
      if (!clientFirst.startsWith("n,,"))
        fail("unsupported gs2 header (channel binding is not spoken)")
      val bare = clientFirst.drop(3)
      val attrs = parse(bare)
      val u = unescapeName(attrs.getOrElse("n", fail("client-first missing n")))
      // the client sends the PREPARED name; prepare the unescaped form
      // anyway so a raw-sending client still matches (prep idempotent)
      if (SaslPrep.prepare(u, "username") != preparedUser)
        fail(s"unknown user '$u'")
      val cnonce = attrs.getOrElse("r", fail("client-first missing r"))
      clientFirstBare = bare
      combinedNonce = cnonce + snonce
      s"r=$combinedNonce,s=${b64(cred.salt)},i=${cred.iterations}"
    }

    /** client-final → server-final; raises on a bad proof. */
    def serverFinal(clientFinal: String): String = {
      val attrs = parse(clientFinal)
      if (attrs.getOrElse("r", "") != combinedNonce)
        fail("client-final nonce mismatch")
      if (attrs.getOrElse("c", "") != b64("n,,".getBytes(UTF_8)))
        fail("client-final channel binding mismatch")
      val proof = unb64(attrs.getOrElse("p", fail("client-final missing p")))
      val withoutProof = clientFinal.substring(0, clientFinal.lastIndexOf(",p="))
      authMessage = s"$clientFirstBare," +
        s"r=$combinedNonce,s=${b64(cred.salt)},i=${cred.iterations}," +
        withoutProof
      // RecoveredKey = proof XOR HMAC(StoredKey, auth); H(RecoveredKey)
      // must equal StoredKey — the server never needs ClientKey itself
      val recovered = xor(proof,
        hmac(cred.storedKey, authMessage.getBytes(UTF_8)))
      if (!MessageDigest.isEqual(h(recovered), cred.storedKey))
        fail("authentication failed: bad proof")
      s"v=${b64(hmac(cred.serverKey, authMessage.getBytes(UTF_8)))}"
    }
  }

  private def parse(msg: String): Map[String, String] =
    msg.split(",").iterator.filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      if (i <= 0) fail(s"malformed SCRAM attribute '$kv'")
      kv.substring(0, i) -> kv.substring(i + 1)
    }.toMap

  private def defaultNonce(): String = {
    val b = new Array[Byte](18)
    new java.security.SecureRandom().nextBytes(b)
    Base64.getEncoder.encodeToString(b).replace(",", "-").replace("=", "_")
  }

  private def fail(msg: String): Nothing =
    throw new SecurityException(s"$Mechanism: $msg")
}
