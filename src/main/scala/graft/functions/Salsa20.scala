package graft.functions

/** Salsa20 stream cipher (D. J. Bernstein, public specification).
  *
  * The reference's legacy payloads are Salsa20-encrypted
  * (reference `etl/utils/encryption.py:20-91`: key padded/truncated to 32
  * bytes, 8-byte nonce, base64 ciphertext). The JDK ships no Salsa20, so the
  * core is implemented here from the public spec: a 16-word state of
  * little-endian u32 ("expand 32-byte k" constants + key + nonce + block
  * counter), 20 rounds (10 double-rounds of column+row quarter-rounds),
  * keystream = core(state) serialized LE, XORed with the data.
  */
object Salsa20 {

  // "expand 32-byte k" as 4 little-endian u32 words
  private val Sigma = Array(0x61707865, 0x3320646e, 0x79622d32, 0x6b206574)

  @inline private def rotl(x: Int, n: Int): Int = Integer.rotateLeft(x, n)

  @inline private def quarter(x: Array[Int], a: Int, b: Int, c: Int, d: Int): Unit = {
    // quarterround(y0=x(a), y1=x(b), y2=x(c), y3=x(d)) per the spec
    x(b) ^= rotl(x(a) + x(d), 7)
    x(c) ^= rotl(x(b) + x(a), 9)
    x(d) ^= rotl(x(c) + x(b), 13)
    x(a) ^= rotl(x(d) + x(c), 18)
  }

  /** The Salsa20/20 core: 16 input words -> 16 output words. */
  def core(input: Array[Int]): Array[Int] = {
    val x = input.clone()
    var i = 0
    while (i < 10) {
      // columnround
      quarter(x, 0, 4, 8, 12)
      quarter(x, 5, 9, 13, 1)
      quarter(x, 10, 14, 2, 6)
      quarter(x, 15, 3, 7, 11)
      // rowround
      quarter(x, 0, 1, 2, 3)
      quarter(x, 5, 6, 7, 4)
      quarter(x, 10, 11, 8, 9)
      quarter(x, 15, 12, 13, 14)
      i += 1
    }
    var j = 0
    while (j < 16) { x(j) += input(j); j += 1 }
    x
  }

  /** Normalize an arbitrary-length key/nonce the way the reference does:
    * truncate or zero-pad to `len` bytes (`encryption.py:33-43`).
    */
  def fit(bytes: Array[Byte], len: Int): Array[Byte] =
    java.util.Arrays.copyOf(bytes, len)

  private def readLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** XOR `data` with the keystream for (key32, nonce8) starting at block 0.
    * Encryption and decryption are the same operation.
    */
  def crypt(key: Array[Byte], nonce: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val k = fit(key, 32)
    val n = fit(nonce, 8)
    val state = new Array[Int](16)
    state(0) = Sigma(0)
    var i = 0
    while (i < 4) { state(1 + i) = readLE(k, 4 * i); i += 1 }
    state(5) = Sigma(1)
    state(6) = readLE(n, 0)
    state(7) = readLE(n, 4)
    // state(8), state(9): 64-bit block counter, little-endian word order
    state(10) = Sigma(2)
    i = 0
    while (i < 4) { state(11 + i) = readLE(k, 16 + 4 * i); i += 1 }
    state(15) = Sigma(3)

    val out = new Array[Byte](data.length)
    var block = 0L
    var pos = 0
    while (pos < data.length) {
      state(8) = block.toInt
      state(9) = (block >>> 32).toInt
      val ks = core(state)
      var b = 0
      val lim = math.min(64, data.length - pos)
      while (b < lim) {
        val word = ks(b >> 2)
        val ksByte = ((word >>> ((b & 3) * 8)) & 0xff).toByte
        out(pos + b) = (data(pos + b) ^ ksByte).toByte
        b += 1
      }
      block += 1
      pos += lim
    }
    out
  }
}
