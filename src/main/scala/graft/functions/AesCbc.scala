package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** AES-256-CBC with the reference's key-derivation contract
  * (reference `etl/utils/encryption.py:94-271`):
  *   key = SHA-256(password), iv = SHA-256(password + "_iv")[0:16],
  *   PKCS7 padding, base64 transport encoding.
  */
object AesCbc {

  private def sha256(s: String): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes(StandardCharsets.UTF_8))

  def derive(password: String): (Array[Byte], Array[Byte]) =
    (sha256(password), java.util.Arrays.copyOf(sha256(password + "_iv"), 16))

  private def cipher(mode: Int, key: Array[Byte], iv: Array[Byte]): Cipher = {
    val c = Cipher.getInstance("AES/CBC/PKCS5Padding") // PKCS5 == PKCS7 for AES
    c.init(mode, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c
  }

  def encrypt(plaintext: String, password: String): String = {
    val (key, iv) = derive(password)
    val ct = cipher(Cipher.ENCRYPT_MODE, key, iv)
      .doFinal(plaintext.getBytes(StandardCharsets.UTF_8))
    Base64.getEncoder.encodeToString(ct)
  }

  def decrypt(base64Ciphertext: String, password: String): String = {
    val (key, iv) = derive(password)
    val pt = cipher(Cipher.DECRYPT_MODE, key, iv)
      .doFinal(Base64.getDecoder.decode(base64Ciphertext))
    new String(pt, StandardCharsets.UTF_8)
  }
}

/** The reference's message re-encryption pipeline
  * (`etl/utils/encryption.py:290-324`, `data_transformer.py:350-394`):
  * try Salsa20-decrypt the legacy payload; if it yields valid UTF-8 text it
  * was encrypted — re-encrypt with AES-CBC and keep the plaintext; otherwise
  * pass the original through untouched.
  */
object ReEncrypt {

  final case class Result(decrypted: String, reencrypted: String, wasEncrypted: Boolean)

  /** Cheap base64-shape test: rejects non-alphabet characters and bad
    * lengths WITHOUT the decoder's exception path — most payloads in a real
    * corpus are plaintext (spaces, accents), and per-row exception
    * construction dominated the 2M-message pipeline bench.
    */
  private def looksLikeBase64(s: String): Boolean = {
    val n = s.length
    if (n == 0 || n % 4 != 0) return false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val ok = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '/' ||
        (c == '=' && i >= n - 2)
      if (!ok) return false
      i += 1
    }
    true
  }

  /** Attempt Salsa20 decryption; `None` when the result is not valid UTF-8
    * (the reference's "was it encrypted?" test — `encryption.py:78-86`).
    */
  def tryDecryptSalsa20(base64Payload: String, legacyKey: String): Option[String] = {
    if (base64Payload == null || !looksLikeBase64(base64Payload)) return None
    try {
      val raw = Base64.getDecoder.decode(base64Payload)
      if (raw.length < 8) return None // 8-byte nonce prefix (empty body is legal)
      val nonce = java.util.Arrays.copyOf(raw, 8)
      val body = java.util.Arrays.copyOfRange(raw, 8, raw.length)
      val pt = Salsa20.crypt(legacyKey.getBytes(StandardCharsets.UTF_8), nonce, body)
      val decoder = StandardCharsets.UTF_8.newDecoder()
      val decoded = decoder.decode(java.nio.ByteBuffer.wrap(pt)).toString
      if (decoded.forall(c => !Character.isISOControl(c) || c == '\n' || c == '\r' || c == '\t'))
        Some(decoded)
      else None
    } catch { case _: Exception => None }
  }

  /** Deterministic Salsa20 encryption used by tests/fixtures: nonce is
    * derived from the payload (first 8 SHA-1 bytes) instead of random, so
    * round-trips are reproducible.
    */
  def encryptSalsa20(plaintext: String, legacyKey: String): String = {
    val nonce = java.util.Arrays.copyOf(
      MessageDigest.getInstance("SHA-1").digest(plaintext.getBytes(StandardCharsets.UTF_8)), 8)
    val ct = Salsa20.crypt(legacyKey.getBytes(StandardCharsets.UTF_8), nonce,
      plaintext.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Byte](8 + ct.length)
    System.arraycopy(nonce, 0, out, 0, 8)
    System.arraycopy(ct, 0, out, 8, ct.length)
    Base64.getEncoder.encodeToString(out)
  }

  def migrate(payload: String, legacyKey: String, newPassword: String): Result =
    tryDecryptSalsa20(payload, legacyKey) match {
      case Some(pt) => Result(pt, AesCbc.encrypt(pt, newPassword), wasEncrypted = true)
      case None     => Result(payload, payload, wasEncrypted = false)
    }
}
