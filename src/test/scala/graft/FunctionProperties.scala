package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{AesCbc, MinHashSig, ReEncrypt, Salsa20, TimeUuid, Uuid5}

/** Property tests over the pure function layer (no Spark session needed):
  * the total-function / round-trip / determinism contracts SURVEY.md §5
  * calls for.
  */
object FunctionProperties extends Properties("graft.functions") {

  private val utf8Gen: Gen[String] = Gen.listOf(Gen.asciiPrintableChar).map(_.mkString)
  private val anyStringGen: Gen[String] =
    Gen.oneOf(utf8Gen, Gen.listOf(Gen.alphaNumChar).map(_.mkString),
      Gen.const(""), Gen.const("ñ中😀 tab\t nl\n"))

  property("uuid5 is deterministic and canonical") = forAll(anyStringGen) { s =>
    val u = UTF8String.fromString(s)
    val a = Uuid5.compute(u).toString
    a == Uuid5.compute(u).toString &&
      a.matches("[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}")
  }

  property("uuid3 is deterministic and canonical") = forAll(anyStringGen) { s =>
    val v = Uuid5.computeV3(Uuid5.NamespaceGraft, UTF8String.fromString(s)).toString
    v.matches("[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}")
  }

  property("timeuuid timestamp round-trips for any non-negative micros") =
    forAll(Gen.chooseNum(0L, 4102444800000000L), anyStringGen) { (micros, seed) =>
      TimeUuid.extractEpochMicros(TimeUuid.compute(micros, seed)) == micros
    }

  property("timeuuid preserves time order") =
    forAll(Gen.chooseNum(0L, 1L << 50), Gen.chooseNum(1L, 1000000L)) { (t, delta) =>
      val a = TimeUuid.compute(t, "s")
      val b = TimeUuid.compute(t + delta, "s")
      TimeUuid.extractEpochMicros(a) < TimeUuid.extractEpochMicros(b)
    }

  property("salsa20 crypt is an involution for any key/nonce/payload") =
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      anyStringGen, Gen.listOfN(8, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)) {
      (data, key, nonce) =>
        Salsa20.crypt(key.getBytes, nonce, Salsa20.crypt(key.getBytes, nonce, data))
          .toSeq == data.toSeq
    }

  property("salsa20 payload round-trip through base64 envelope") =
    forAll(anyStringGen, Gen.alphaNumStr.suchThat(_.nonEmpty)) { (plain, key) =>
      ReEncrypt.tryDecryptSalsa20(ReEncrypt.encryptSalsa20(plain, key), key).contains(plain)
    }

  property("aes-cbc round-trips any string under any password") =
    forAll(anyStringGen, Gen.alphaNumStr.suchThat(_.nonEmpty)) { (plain, pwd) =>
      AesCbc.decrypt(AesCbc.encrypt(plain, pwd), pwd) == plain
    }

  property("migrate(encrypt(x)) recovers x and re-encrypts under the new key") =
    forAll(anyStringGen) { plain =>
      val r = ReEncrypt.migrate(ReEncrypt.encryptSalsa20(plain, "k"), "k", "p2")
      r.wasEncrypted && r.decrypted == plain && AesCbc.decrypt(r.reencrypted, "p2") == plain
    }

  property("unsignedLess is a strict total order consistent with hex order") =
    forAll(Gen.listOfN(16, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      Gen.listOfN(16, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)) { (a, b) =>
      val hexCmp = MinHashSig.hex(a).compareTo(MinHashSig.hex(b))
      val lt = MinHashSig.unsignedLess(a, b)
      val gt = MinHashSig.unsignedLess(b, a)
      (hexCmp < 0) == lt && (hexCmp > 0) == gt && !(lt && gt)
    }

  private val pgmGen: Gen[(Int, Int, Array[Byte])] = for {
    w <- Gen.choose(1, 24)
    h <- Gen.choose(1, 24)
    px <- Gen.listOfN(w * h, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield (w, h, px.toArray)

  property("PGM encode→decode round-trips any image") = forAll(pgmGen) {
    case (w, h, px) =>
      import graft.operators.Multimodal.PgmCodec
      PgmCodec.decodeImage(PgmCodec.encode(w, h, 255, px)) match {
        case Some((dw, dh, dm, dpx)) =>
          dw == w && dh == h && dm == 255 && java.util.Arrays.equals(dpx, px)
        case None => false
      }
  }

  property("PGM resize to the same dimensions is the identity") = forAll(pgmGen) {
    case (w, h, px) =>
      import graft.operators.Multimodal.PgmCodec
      val img = PgmCodec.encode(w, h, 255, px)
      PgmCodec.resize(img, w, h).exists(r =>
        java.util.Arrays.equals(PgmCodec.decodeImage(r).get._4, px))
  }

  property("PGM stats equals the decoded pixel sum (zero-copy path agrees)") =
    forAll(pgmGen) { case (w, h, px) =>
      import graft.operators.Multimodal.PgmCodec
      val img = PgmCodec.encode(w, h, 255, px)
      PgmCodec.stats(img).contains((w, h, px.map(_ & 0xff).map(_.toLong).sum))
    }

  property("PGM frames split a concatenated clip back into its images") =
    forAll(Gen.listOfN(3, pgmGen)) { imgs =>
      import graft.operators.Multimodal.PgmCodec
      val encoded = imgs.map { case (w, h, px) => PgmCodec.encode(w, h, 255, px) }
      val clip = encoded.reduce(_ ++ _)
      val frames = PgmCodec.frames(clip, 1).map(_._2).toList
      frames.size == 3 && frames.zip(encoded).forall {
        case (f, e) => java.util.Arrays.equals(f, e)
      }
    }

  property("PII redaction is idempotent (placeholders contain no PII patterns)") =
    forAll(anyStringGen) { s =>
      // column-free check via the same regexes the Column op applies
      val once = graft.operators.TextAnalysis.PiiPatterns.foldLeft(s) {
        case (t, (p, r)) => t.replaceAll(p, r)
      }
      val twice = graft.operators.TextAnalysis.PiiPatterns.foldLeft(once) {
        case (t, (p, r)) => t.replaceAll(p, r)
      }
      once == twice
    }
}
