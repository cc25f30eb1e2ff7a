package graft

import java.util.Base64

import graft.functions.{AesCbc, ReEncrypt, Salsa20}

/** X15–X17: crypto round-trips mirroring the reference's self-test
  * (`etl/utils/encryption.py:326-353`) plus boundary cases the reference
  * never probes (multi-block payloads, non-UTF-8 rejects, empty input).
  */
class CryptoSpec extends SparkSpecBase {

  private val key = "legacy-key"

  test("salsa20 round-trips across block boundaries") {
    for (len <- Seq(0, 1, 63, 64, 65, 200, 4096)) {
      val plain = Array.tabulate[Byte](len)(i => (i * 7 + 3).toByte)
      val nonce = Array.tabulate[Byte](8)(_.toByte)
      val ct = Salsa20.crypt(key.getBytes, nonce, plain)
      assert(Salsa20.crypt(key.getBytes, nonce, ct).toSeq === plain.toSeq)
      if (len > 0) assert(ct.toSeq !== plain.toSeq)
    }
  }

  test("salsa20 keystream depends on key and nonce") {
    val data = Array.fill[Byte](64)(0)
    val n1 = Array.fill[Byte](8)(1)
    val n2 = Array.fill[Byte](8)(2)
    assert(Salsa20.crypt("k1".getBytes, n1, data).toSeq !== Salsa20.crypt("k2".getBytes, n1, data).toSeq)
    assert(Salsa20.crypt("k1".getBytes, n1, data).toSeq !== Salsa20.crypt("k1".getBytes, n2, data).toSeq)
  }

  test("fit pads/truncates like the reference (encryption.py:33-43)") {
    assert(Salsa20.fit("abc".getBytes, 8).toSeq === ("abc".getBytes ++ Array.fill[Byte](5)(0)).toSeq)
    assert(Salsa20.fit("abcdefghij".getBytes, 4).toSeq === "abcd".getBytes.toSeq)
  }

  test("encryptSalsa20/tryDecryptSalsa20 round-trip incl. unicode") {
    for (plain <- Seq("hello world", "", "ñandú 中文 😀", "a" * 10000)) {
      val payload = ReEncrypt.encryptSalsa20(plain, key)
      assert(ReEncrypt.tryDecryptSalsa20(payload, key) === Some(plain))
    }
  }

  test("tryDecryptSalsa20 rejects plaintext, bad base64, and wrong keys") {
    assert(ReEncrypt.tryDecryptSalsa20("not base64 at all!", key).isEmpty)
    assert(ReEncrypt.tryDecryptSalsa20("", key).isEmpty)
    // valid base64 but too short for nonce+body
    assert(ReEncrypt.tryDecryptSalsa20(Base64.getEncoder.encodeToString("tiny".getBytes), key).isEmpty)
    // wrong key yields non-UTF-8 noise -> None (the reference's "was it encrypted?" test)
    val payload = ReEncrypt.encryptSalsa20("some secret message body", key)
    assert(ReEncrypt.tryDecryptSalsa20(payload, "other-key").isEmpty)
  }

  test("aes-cbc round-trips with the reference's key derivation") {
    for (plain <- Seq("x", "", "mensaje largo " * 100, "中文 emoji 😀")) {
      assert(AesCbc.decrypt(AesCbc.encrypt(plain, "some password"), "some password") === plain)
    }
  }

  test("aes key derivation: key=sha256(pwd), iv=sha256(pwd+\"_iv\")[0:16]") {
    val (k, iv) = AesCbc.derive("some password")
    assert(k.length === 32)
    assert(iv.length === 16)
    // deterministic ciphertext given the fixed password (no random IV)
    assert(AesCbc.encrypt("m", "p") === AesCbc.encrypt("m", "p"))
    assert(AesCbc.encrypt("m", "p") !== AesCbc.encrypt("m", "q"))
  }

  test("migrate: encrypted payloads re-encrypt, plaintext passes through (encryption.py:290-324)") {
    val enc = ReEncrypt.encryptSalsa20("secret", key)
    val r1 = ReEncrypt.migrate(enc, key, "newpwd")
    assert(r1.wasEncrypted)
    assert(r1.decrypted === "secret")
    assert(AesCbc.decrypt(r1.reencrypted, "newpwd") === "secret")
    val r2 = ReEncrypt.migrate("plain text stays", key, "newpwd")
    assert(!r2.wasEncrypted)
    assert(r2.decrypted === "plain text stays")
    assert(r2.reencrypted === "plain text stays")
  }
}
