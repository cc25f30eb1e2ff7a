package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video travel
  * as opaque `binary` columns with typed metadata structs; decode /
  * feature-extract / resize / frame-sample run as partition-local batch
  * functions (`mapPartitions` — the JVM analogue of arrow-batched UDFs).
  *
  * Native codec libraries are NOT in this environment; three format
  * families decode for REAL anyway — binary PGM images ([[PgmCodec]], pure
  * JVM), PNG images ([[PngCodec]], via the JDK's javax.imageio, which also
  * ships JPEG/BMP/GIF readers), and RIFF/WAVE PCM audio ([[WavCodec]],
  * direct RIFF parse + javax.sound.sampled fallback) — while the formats
  * that genuinely need ffmpeg (video containers, compressed audio) run
  * through a clearly-marked deterministic STUB ([[StubCodec]]) behind the
  * same interface a real decoder (javacv / ffmpeg bindings) would implement; the
  * Spark-side plumbing — schema contract, batch shape, partition-local
  * reuse of a (normally expensive) codec handle, row-count-preserving and
  * exploding variants — is real and tested.
  *
  * Scale notes: media blobs must NEVER be shuffled — all per-asset work is
  * map-side; `repartition` happens on metadata before the blobs are
  * attached, and frame explosion multiplies rows AFTER the narrow decode so
  * Spark can spill row-by-row.
  */
object Multimodal {

  /** Schema contract for a media table: id + opaque payload + typed metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  val FeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** A codec handle is expensive to create (native contexts, model weights)
    * — the mapPartitions plumbing instantiates ONE per partition and reuses
    * it across the partition's rows.
    */
  trait Codec extends Serializable {
    def features(modality: String, content: Array[Byte], dim: Int): Array[Float]
    def frames(content: Array[Byte], everyMs: Long): Iterator[(Long, Array[Byte])]
  }

  /** Codec that can additionally decode + re-encode still images. */
  trait ImageCodec extends Codec {
    /** (width, height, maxval, pixels) — None when the payload isn't this format. */
    def decodeImage(content: Array[Byte]): Option[(Int, Int, Int, Array[Byte])]
    def resize(content: Array[Byte], w: Int, h: Int): Option[Array[Byte]]

    /** (width, height, pixel sum) — default decodes then sums; codecs that
      * know their layout override to sum in place without the pixel copy.
      */
    def stats(content: Array[Byte]): Option[(Int, Int, Long)] =
      decodeImage(content).map { case (w, h, _, px) =>
        var s = 0L; var i = 0
        while (i < px.length) { s += px(i) & 0xff; i += 1 }
        (w, h, s)
      }

    /** Features: [width, height, mean/maxval, (dim-3)-bin pixel histogram
      * as fractions] — requires `dim ≥ 4` (fail loudly; a silent stub
      * fallback on a VALID image would hand back plausible-looking but
      * meaningless numbers). Payloads this codec can't decode fall back to
      * the stub's byte histogram so mixed-format tables don't fail the
      * whole partition.
      */
    def features(modality: String, content: Array[Byte], dim: Int): Array[Float] = {
      require(dim >= 4, s"image features need dim >= 4 (w, h, mean + bins); got $dim")
      decodeImage(content) match {
        case Some((w, h, m, px)) =>
          val out = new Array[Float](dim)
          out(0) = w.toFloat
          out(1) = h.toFloat
          val bins = dim - 3
          var sum = 0L
          var i = 0
          while (i < px.length) {
            val p = px(i) & 0xff
            sum += p
            out(3 + math.min(p * bins / (m + 1), bins - 1)) += 1.0f / px.length
            i += 1
          }
          out(2) = (sum.toDouble / (px.length.toDouble * m)).toFloat
          out
        case _ => StubCodec.features(modality, content, dim)
      }
    }
  }

  /** REAL pure-JVM codec for binary PGM (P5) grayscale images — the
    * simplest raster format, parsed byte-for-byte with no library at all
    * ([[PngCodec]] covers the JDK-decodable compressed formats; only video
    * containers and compressed audio remain with [[StubCodec]]). Handles
    * `#` comments and arbitrary header whitespace per the netpbm spec;
    * maxval ≤ 255.
    * `frames` treats the payload as a concatenation of P5 images (the
    * simplest multi-frame container) and yields each frame as its own PGM.
    */
  object PgmCodec extends ImageCodec {
    private def isSpace(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'

    /** Parse one P5 image starting at `off`; returns (w, h, maxval,
      * pixelOffset) or None. Pixels run for w*h bytes from pixelOffset.
      */
    private def parseHeader(c: Array[Byte], off: Int): Option[(Int, Int, Int, Int)] = {
      if (c == null || off + 2 > c.length || c(off) != 'P' || c(off + 1) != '5') return None
      var i = off + 2
      val vals = new Array[Int](3)
      var v = 0
      while (v < 3) {
        // skip whitespace and # comments (comment runs to end of line)
        var moved = true
        while (moved) {
          moved = false
          while (i < c.length && isSpace(c(i))) { i += 1; moved = true }
          if (i < c.length && c(i) == '#') {
            while (i < c.length && c(i) != '\n') i += 1
            moved = true
          }
        }
        if (i >= c.length || c(i) < '0' || c(i) > '9') return None
        // long accumulation with an explicit cap: Int wrap on an oversized
        // field would otherwise accept a corrupt header as a small image
        var n = 0L
        while (i < c.length && c(i) >= '0' && c(i) <= '9') {
          n = n * 10 + (c(i) - '0')
          if (n > Int.MaxValue) return None
          i += 1
        }
        vals(v) = n.toInt
        v += 1
      }
      // exactly ONE whitespace byte separates maxval from the pixel stream
      if (i >= c.length || !isSpace(c(i))) return None
      i += 1
      val (w, h, maxval) = (vals(0), vals(1), vals(2))
      if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
      if (i.toLong + w.toLong * h > c.length) return None
      Some((w, h, maxval, i))
    }

    def decodeImage(content: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
      parseHeader(content, 0).map { case (w, h, m, p) =>
        (w, h, m, java.util.Arrays.copyOfRange(content, p, p + w * h))
      }

    def encode(w: Int, h: Int, maxval: Int, pixels: Array[Byte]): Array[Byte] = {
      // an oversized pixel array would encode to a payload decodeImage
      // accepts (ignoring the tail) while frames() rejects it — fail the
      // inconsistent caller at construction instead
      require(pixels.length.toLong == w.toLong * h,
        s"encode: ${pixels.length} pixels for ${w}x$h image")
      val header = s"P5\n$w $h\n$maxval\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + pixels.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(pixels, 0, out, header.length, pixels.length)
      out
    }

    /** Nearest-neighbor resample — real pixel work, no interpolation libs. */
    def resize(content: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      decodeImage(content).map { case (sw, sh, m, px) =>
        val out = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          val sy = y * sh / h
          var x = 0
          while (x < w) {
            out(y * w + x) = px(sy * sw + x * sw / w)
            x += 1
          }
          y += 1
        }
        encode(w, h, m, out)
      }

    /** Zero-copy stats: sum the pixel run in place via the header offsets —
      * no per-image pixel-array allocation (decodeImage copies; at corpus
      * scale that copy is pure GC pressure for a sum).
      */
    override def stats(content: Array[Byte]): Option[(Int, Int, Long)] =
      parseHeader(content, 0).map { case (w, h, _, p) =>
        var s = 0L
        var i = p
        val end = p + w * h
        while (i < end) { s += content(i) & 0xff; i += 1 }
        (w, h, s)
      }

    /** A malformed or truncated TRAILING frame throws (matching
      * decodeImage's truncation rejection) — silently yielding fewer frames
      * would make a corrupted clip indistinguishable from a short one.
      *
      * Parsing is LAZY per frame (the header at offset k is only parsed
      * when `hasNext` first asks past frame k−1): a bounded consumer
      * ([[videoFingerprint]]'s `maxFrames`) that stops after its sample
      * budget never pays for — and never throws on — the unread tail.
      * Full iteration keeps the original contract: the corrupt-tail throw
      * surfaces at the `hasNext` after the last good frame.
      */
    def frames(content: Array[Byte], everyMs: Long): Iterator[(Long, Array[Byte])] =
      new Iterator[(Long, Array[Byte])] {
        private var off = 0
        private var idx = 0L
        private var parsed = false
        private var nextHdr: Option[(Int, Int, Int, Int)] = None
        private def ensure(): Unit = if (!parsed) {
          nextHdr = if (content == null) None else parseHeader(content, off)
          if (nextHdr.isEmpty && content != null && off < content.length)
            throw new IllegalArgumentException(
              s"corrupt P5 clip: unparseable bytes at offset $off of ${content.length}")
          parsed = true
        }
        def hasNext: Boolean = { ensure(); nextHdr.isDefined }
        def next(): (Long, Array[Byte]) = {
          ensure()
          val (w, h, _, p) = nextHdr.get
          val end = p + w * h
          val frame = java.util.Arrays.copyOfRange(content, off, end)
          val t = idx * everyMs
          idx += 1; off = end
          parsed = false
          (t, frame)
        }
      }
  }

  /** Decompression-bomb ceiling for the `javax.imageio` codecs: a
    * compressed payload declares its dimensions in a tiny header, so a
    * crafted file can promise a raster thousands of times its own size —
    * `rd.read(0)` then allocates w·h (×4 for color) and dies with
    * OutOfMemoryError, which NonFatal does NOT catch, killing the
    * partition (ADVICE r12). [[JdkImageCodec]] therefore reads the
    * header-only dimensions first and rejects anything past this cap as
    * undecodable — a deliberate trade: an over-cap asset reports as the
    * −1/null degradation row, indistinguishable from corruption in the
    * audit counts, so corpora with legitimate ultra-high-resolution
    * assets must RAISE the cap (`AutoCodec(maxPixels)` /
    * `RunMediaAudit --max-pixels`) rather than lose them. The default,
    * 2²⁷ ≈ 134 M px, clears every consumer sensor in production use
    * (108 MP phone sensors, 100 MP medium format, most panoramas) while
    * bounding the worst-case transient raster at 512 MB (color int
    * raster) per decoding thread regardless of what the header claims.
    * Raw PGM needs no cap: its header must be followed by the actual w·h
    * pixel bytes, so there is no amplification to exploit.
    */
  val DefaultMaxImagePixels: Long = 1L << 27

  /** Shared base for the JDK `javax.imageio`-backed still-image codecs —
    * the stock JDK ships PNG, JPEG, BMP and GIF readers, so these formats
    * need no native libraries (VERDICT r11 next #3, r12 next #3). Decode
    * goes through a per-thread cached `ImageReader` over a memory-cached
    * stream: `ImageIO.read(InputStream)` would probe the reader registry
    * AND spill through the disk cache on every call — the per-clip
    * provider-probing constant factor the WavCodec fast path exists to
    * avoid (SCALE_r11 §4 q76).
    *
    * Pixel contract: 8-bit grayscale, maxval 255. A gray payload
    * round-trips its raster bytes exactly where the container is lossless
    * (PNG, BMP, and GIF — gray palettes index to their own value; JPEG is
    * the one lossy member, pinned by spec round-trip tolerance instead of
    * exact equality); color payloads reduce by integer ITU-R BT.601 luma
    * ((299·R + 587·G + 114·B) / 1000, truncating) so stats stay
    * exact-integer and oracle-comparable.
    */
  abstract class JdkImageCodec(
      formatName: String,
      val maxPixels: Long = DefaultMaxImagePixels) extends ImageCodec {

    /** Cheap magic-bytes check — decode never even touches the reader for
      * a payload that cannot be this format.
      */
    protected def formatSignature(content: Array[Byte]): Boolean

    // ImageReader is stateful (setInput) and not thread-safe — one per
    // executor thread, reused across every row the thread decodes.
    // @transient lazy: ThreadLocal is not Serializable, and unlike the
    // singleton objects (serialized by module reference) INSTANCES of
    // this class ride inside mapPartitions closures — each executor
    // re-creates its ThreadLocals on first decode after deserialization.
    @transient private lazy val reader = new ThreadLocal[javax.imageio.ImageReader] {
      override def initialValue(): javax.imageio.ImageReader =
        javax.imageio.ImageIO.getImageReadersByFormatName(formatName).next()
    }
    @transient private lazy val writer = new ThreadLocal[javax.imageio.ImageWriter] {
      override def initialValue(): javax.imageio.ImageWriter =
        javax.imageio.ImageIO.getImageWritersByFormatName(formatName).next()
    }

    def encode(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
      require(pixels.length.toLong == w.toLong * h,
        s"encode: ${pixels.length} pixels for ${w}x$h image")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, pixels)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      val wr = writer.get()
      try {
        wr.setOutput(ios)
        wr.write(img)
      } finally {
        wr.setOutput(null)
        ios.close() // close flushes the memory cache into bos
      }
      bos.toByteArray
    }

    def decodeImage(content: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
      if (!formatSignature(content)) return None
      try {
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(content))
        val rd = reader.get()
        val img =
          try {
            rd.setInput(iis)
            // header-only dimensions BEFORE read(0): a decompression bomb
            // declaring huge dims must be rejected without allocating its
            // raster (OutOfMemoryError kills the partition — ADVICE r12)
            val hw = rd.getWidth(0).toLong
            val hh = rd.getHeight(0).toLong
            if (hw <= 0 || hh <= 0 || hw * hh > maxPixels) null else rd.read(0)
          } finally { rd.setInput(null); iis.close() }
        if (img == null) return None
        val w = img.getWidth
        val h = img.getHeight
        val px = new Array[Byte](w * h)
        if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
          img.getRaster.getDataElements(0, 0, w, h, px)
        } else {
          var p = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              px(p) = ((((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000).toByte
              p += 1
              x += 1
            }
            y += 1
          }
        }
        Some((w, h, 255, px))
      } catch {
        // a corrupt stream past the signature must not fail the partition
        case scala.util.control.NonFatal(_) => None
      }
    }

    /** Nearest-neighbor resample, re-encoded in this codec's own format
      * (PgmCodec rule: real pixel work, deterministic, no interpolation
      * libs).
      */
    def resize(content: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      decodeImage(content).map { case (sw, sh, _, px) =>
        val out = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          val sy = y * sh / h
          var x = 0
          while (x < w) {
            out(y * w + x) = px(sy * sw + x * sw / w)
            x += 1
          }
          y += 1
        }
        encode(w, h, out)
      }

    /** These are single-image containers for our purposes: one frame at
      * t=0 when the payload carries the format signature (no
      * length-prefixed concatenation like PGM's P5 run; an animated GIF's
      * extra frames are out of contract — frame 0 only, like every other
      * member). Signature check only — a full decode here would inflate
      * the compressed stream once to DECIDE and leave the caller to
      * inflate it again to USE; a signature-valid-but-corrupt payload
      * emits its frame and the caller's decode returns None downstream,
      * same net semantics.
      */
    def frames(content: Array[Byte], everyMs: Long): Iterator[(Long, Array[Byte])] =
      if (formatSignature(content)) Iterator((0L, content)) else Iterator.empty

    private[operators] def hasSignature(content: Array[Byte]): Boolean =
      formatSignature(content)
  }

  /** Magic-bytes predicates shared by the singleton codecs and the
    * capped [[AutoCodec]] instances.
    */
  private[operators] object ImageSig {
    private val Png = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    def png(c: Array[Byte]): Boolean = {
      if (c == null || c.length < 8) return false
      var i = 0
      while (i < 8) { if ((c(i) & 0xff) != Png(i)) return false; i += 1 }
      true
    }
    def jpeg(c: Array[Byte]): Boolean =
      c != null && c.length >= 2 && (c(0) & 0xff) == 0xff && (c(1) & 0xff) == 0xd8
    def bmp(c: Array[Byte]): Boolean =
      c != null && c.length >= 2 && c(0) == 'B' && c(1) == 'M'
    def gif(c: Array[Byte]): Boolean =
      c != null && c.length >= 4 && c(0) == 'G' && c(1) == 'I' && c(2) == 'F' && c(3) == '8'
    def pgm(c: Array[Byte]): Boolean =
      c != null && c.length >= 2 && c(0) == 'P' && c(1) == '5'
  }

  /** PNG via the shared [[JdkImageCodec]] machinery (8-byte signature). */
  class PngImageCodec(maxPx: Long = DefaultMaxImagePixels)
      extends JdkImageCodec("png", maxPx) {
    protected def formatSignature(content: Array[Byte]): Boolean = ImageSig.png(content)
  }
  object PngCodec extends PngImageCodec()

  /** JPEG (JFIF/Exif both start FF D8). The one LOSSY member: encode →
    * decode round-trips within a few gray levels, never exactly — so JPEG
    * stats have no closed-form oracle; correctness is pinned by spec
    * tolerance + the hamming-0 cross-container pairing trick
    * (RunMediaAuditSpec pattern) instead.
    */
  class JpegImageCodec(maxPx: Long = DefaultMaxImagePixels)
      extends JdkImageCodec("jpeg", maxPx) {
    protected def formatSignature(content: Array[Byte]): Boolean = ImageSig.jpeg(content)
  }
  object JpegCodec extends JpegImageCodec()

  /** BMP ("BM"): uncompressed in the JDK writer's default form, so gray
    * rasters round-trip exactly — closed-form oracle possible (q86).
    */
  class BmpImageCodec(maxPx: Long = DefaultMaxImagePixels)
      extends JdkImageCodec("bmp", maxPx) {
    protected def formatSignature(content: Array[Byte]): Boolean = ImageSig.bmp(content)
  }
  object BmpCodec extends BmpImageCodec()

  /** GIF ("GIF8" covers 87a and 89a): LZW is lossless and a gray palette
    * indexes to its own value, so gray rasters round-trip exactly.
    */
  class GifImageCodec(maxPx: Long = DefaultMaxImagePixels)
      extends JdkImageCodec("gif", maxPx) {
    protected def formatSignature(content: Array[Byte]): Boolean = ImageSig.gif(content)
  }
  object GifCodec extends GifImageCodec()

  /** Format-sniffing image codec for MIXED corpora: binary PGM payloads
    * (2-byte `P5` signature, checked first — a free comparison) decode via
    * [[PgmCodec]]; PNG / JPEG / BMP / GIF route to their [[JdkImageCodec]]
    * singleton by magic bytes (VERDICT r12 next #3 — a real crawl corpus
    * is mostly JPEG, which previously fell through to PngCodec's signature
    * check and was miscounted as undecodable); anything else is None.
    * Re-encoding operations (resize) keep the payload's own format. This
    * is the codec a real media audit runs — a 100 TB crawl corpus never
    * carries one uniform image format.
    */
  class AutoCodec(maxPixels: Long = DefaultMaxImagePixels) extends ImageCodec {
    private val png = new PngImageCodec(maxPixels)
    private val jpeg = new JpegImageCodec(maxPixels)
    private val bmp = new BmpImageCodec(maxPixels)
    private val gif = new GifImageCodec(maxPixels)

    /** One branchy sniff, shared by every operation: the per-payload cost
      * is a handful of byte compares; PNG is the fallthrough so a
      * short/null payload still lands on a codec whose signature check
      * rejects it (None, never a throw). PGM needs no cap — its pixels
      * must be present in the payload byte-for-byte, so there is no
      * decompression amplification to exploit.
      */
    private def route(c: Array[Byte]): ImageCodec =
      if (ImageSig.pgm(c)) PgmCodec
      else if (ImageSig.jpeg(c)) jpeg
      else if (ImageSig.bmp(c)) bmp
      else if (ImageSig.gif(c)) gif
      else png

    def decodeImage(content: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
      route(content).decodeImage(content)

    def resize(content: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      route(content).resize(content, w, h)

    // PGM keeps its zero-copy header stats path through the route
    override def stats(content: Array[Byte]): Option[(Int, Int, Long)] =
      route(content).stats(content)

    /** Multi-frame only exists in the P5-concat container; the compressed
      * stills are their own single frame ([[JdkImageCodec]] rule).
      */
    def frames(content: Array[Byte], everyMs: Long): Iterator[(Long, Array[Byte])] =
      route(content).frames(content, everyMs)
  }

  /** The default-capped sniffing instance (production knob: construct an
    * [[AutoCodec]] with a corpus-appropriate `maxPixels`, e.g.
    * `RunMediaAudit --max-pixels`).
    */
  object AutoImageCodec extends AutoCodec()

  /** REAL pure-JVM codec for RIFF/WAVE PCM audio — the audio analogue of
    * [[PgmCodec]] (VERDICT r10 next #5): `javax.sound.sampled` ships in the
    * JDK, so unlike the formats [[StubCodec]] stands in for, WAV decode
    * needs no native libraries. `encode` writes the canonical 44-byte RIFF
    * header + little-endian 16-bit PCM frames; `decode` round-trips any
    * 16-bit PCM_SIGNED stream `AudioSystem` can parse (either endianness),
    * returning exact integer samples so downstream stats are
    * oracle-comparable without float drift (the q59 discipline).
    */
  object WavCodec {
    final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

    def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
      require(sampleRate > 0 && channels > 0, s"bad format: ${sampleRate}Hz x$channels")
      require(samples.length % channels == 0,
        s"encode: ${samples.length} samples not a whole number of $channels-channel frames")
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(channels.toShort)
        .putInt(sampleRate)
        .putInt(sampleRate * channels * 2) // byte rate
        .putShort((channels * 2).toShort) // block align
        .putShort(16) // bits per sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
      bb.array()
    }

    /** None for anything that isn't a parseable 16-bit PCM stream — an
      * undecodable asset must not fail the partition (imageStats rule).
      *
      * Two-tier decode (VERDICT r11 next #2): the canonical 44-byte RIFF
      * PCM16 layout — which is what [[encode]] writes and what the
      * overwhelming majority of real PCM WAV files carry — parses directly
      * (a header check + one bulk LE sample copy). Everything else falls
      * back to `AudioSystem`, whose per-call provider probing costs ~8 ms
      * per clip (measured: 131 s for 500 k 364-byte clips at the 100×
      * rung — an order of magnitude over the byte work) and is only worth
      * paying for non-canonical-but-valid streams (extra chunks before
      * `data`, extended fmt blocks, big-endian AIFF-style payloads).
      */
    def decode(content: Array[Byte]): Option[Audio] = {
      val fast = decodeCanonical(content)
      if (fast.isDefined) fast else decodeViaAudioSystem(content)
    }

    /** Strictly-canonical fast path: "RIFF" len "WAVE" + a 16-byte PCM fmt
      * chunk + "data" at offset 36, 16-bit samples, payload exactly
      * 44 + dataLen bytes. ANY deviation — extra chunks, extensible fmt,
      * inconsistent block-align/byte-rate, trailing bytes — returns None
      * so the AudioSystem fallback (the reference semantics) decides;
      * the fast path must never accept a stream the fallback would parse
      * differently. Package-visible so the spec can pin the split.
      */
    private[graft] def decodeCanonical(c: Array[Byte]): Option[Audio] = {
      if (c == null || c.length < 44) return None
      def tag(off: Int, s: String): Boolean =
        c(off) == s.charAt(0) && c(off + 1) == s.charAt(1) &&
          c(off + 2) == s.charAt(2) && c(off + 3) == s.charAt(3)
      if (!tag(0, "RIFF") || !tag(8, "WAVE") || !tag(12, "fmt ") || !tag(36, "data"))
        return None
      val bb = java.nio.ByteBuffer.wrap(c).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      if (bb.getInt(16) != 16 || bb.getShort(20) != 1 || bb.getShort(34) != 16)
        return None // non-canonical fmt length / non-PCM / non-16-bit
      val channels = bb.getShort(22).toInt
      val rate = bb.getInt(24)
      val dataLen = bb.getInt(40)
      if (channels <= 0 || rate <= 0 || dataLen < 0 || dataLen % 2 != 0 ||
        dataLen % (channels * 2) != 0 || 44L + dataLen != c.length) return None
      // the redundant header fields must agree with the primary ones — a
      // disagreement is a non-canonical stream the fallback should judge
      if (bb.getInt(4) != 36 + dataLen || bb.getInt(28) != rate * channels * 2 ||
        bb.getShort(32) != channels * 2) return None
      val out = new Array[Short](dataLen / 2)
      bb.position(44)
      bb.asShortBuffer().get(out)
      Some(Audio(rate, channels, out))
    }

    /** The general-format fallback. NonFatal, not just the two checked
      * exceptions (ADVICE r11): a crafted RIFF header can drive the JDK
      * parser into runtime exceptions (NegativeArraySizeException et al.),
      * and an undecodable asset must not fail the partition.
      */
    private def decodeViaAudioSystem(content: Array[Byte]): Option[Audio] = {
      if (content == null) return None
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        try {
          val f = in.getFormat
          if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            f.getSampleSizeInBits != 16) None
          else {
            val bytes = in.readAllBytes()
            val bb = java.nio.ByteBuffer.wrap(bytes).order(
              if (f.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
            val out = new Array[Short](bytes.length / 2)
            var i = 0
            while (i < out.length) { out(i) = bb.getShort(); i += 1 }
            Some(Audio(f.getSampleRate.toInt, f.getChannels, out))
          }
        } finally in.close()
      } catch {
        case scala.util.control.NonFatal(_) => None
      }
    }
  }

  /** Decode-level audio statistics as EXACT integers — sample rate,
    * channels, sample count, duration, signed-sample sum, peak — the audio
    * analogue of [[imageStats]] and the corpus audit a training pipeline
    * runs before filtering (clip length / silence / clipping screens).
    * Same partition-local mapPartitions shape; blobs never shuffle.
    * Undecodable payloads yield a -1 row rather than failing the partition.
    * duration_ms is frame-count arithmetic in integer space
    * (`frames * 1000 / rate`), bit-equal across engines.
    */
  def audioStats(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("duration_ms", LongType, nullable = false),
      StructField("sum_samples", LongType, nullable = false),
      StructField("peak", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    // positional access: chained after another object-typed map, the
    // optimizer elides the serialize/deserialize pair (imageStats rule)
    media.select("media_id", "content").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        WavCodec.decode(r.getAs[Array[Byte]](1)) match {
          case Some(a) =>
            var sum = 0L
            var peak = Int.MinValue
            var i = 0
            while (i < a.samples.length) {
              val v = a.samples(i).toInt
              sum += v
              if (v > peak) peak = v
              i += 1
            }
            val frames = a.samples.length / a.channels
            Row(id, a.sampleRate, a.channels, a.samples.length.toLong,
              frames.toLong * 1000L / a.sampleRate, sum,
              if (a.samples.isEmpty) 0 else peak)
          case None => Row(id, -1, -1, -1L, -1L, -1L, -1)
        }
      }
    }(enc)
  }

  /** Deterministic stand-in for the decoders that genuinely need native
    * libraries — video containers (mp4/mkv frame demux) and compressed
    * audio (mp3/aac/opus); still images and PCM audio decode for REAL via
    * [[PgmCodec]]/[[PngCodec]]/[[WavCodec]] above. Features are a seeded
    * byte-histogram projection, frames are fixed-size slices. Replace with
    * a javacv/ffmpeg-backed Codec in a full environment — the operator
    * code below does not change.
    */
  object StubCodec extends Codec {
    def features(modality: String, content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (content != null) {
        var i = 0
        while (i < content.length) {
          out(i % dim) += (content(i) & 0xff) / 255.0f
          i += 1
        }
      }
      out
    }
    def frames(content: Array[Byte], everyMs: Long): Iterator[(Long, Array[Byte])] =
      if (content == null) Iterator.empty
      else content.grouped(64).zipWithIndex.map { case (chunk, i) => (i * everyMs, chunk) }
  }

  /** Row-preserving feature extraction: one feature vector per asset.
    * Partition-local codec handle; output is columnar-friendly (no blobs).
    */
  def extractFeatures(
      media: DataFrame,
      dim: Int = 16,
      codec: Codec = StubCodec): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(FeatureSchema)
    // positional access throughout the mapPartitions operators: chained
    // after another object-typed map, EliminateSerialization hands over the
    // producer's schemaless Rows and name lookup throws
    media.select("media_id", "modality", "content").mapPartitions { rows =>
      val c = codec // one handle per partition
      rows.map { r =>
        val modality = r.getString(1)
        val content = r.getAs[Array[Byte]](2)
        Row(r.getLong(0), modality,
          if (content == null) 0L else content.length.toLong,
          c.features(modality, content, dim))
      }
    }(enc)
  }

  /** Exploding frame-sampler: video/audio rows fan out to one row per
    * sampled frame AFTER the narrow decode (no blob shuffle).
    */
  def sampleFrames(
      media: DataFrame,
      everyMs: Long = 1000L,
      codec: Codec = StubCodec): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_ms", LongType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select("media_id", "content").mapPartitions { rows =>
      val c = codec
      rows.flatMap { r =>
        val id = r.getLong(0)
        c.frames(r.getAs[Array[Byte]](1), everyMs).map { case (ms, bytes) =>
          Row(id, ms, bytes)
        }
      }
    }(enc)
  }

  /** Decode-level image statistics as EXACT integers (dims + pixel sum) —
    * oracle-comparable without float drift, and the corpus-wide size/
    * brightness audit a curation pipeline runs before filtering. Same
    * partition-local mapPartitions shape as [[extractFeatures]]; blobs
    * never shuffle. Undecodable payloads yield (-1, -1, -1) rather than
    * failing the partition.
    */
  def imageStats(media: DataFrame, codec: ImageCodec = PgmCodec): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sum_px", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    // positional access: when chained after another object-typed map, the
    // optimizer elides the serialize/deserialize pair and hands over the
    // producer's schemaless Rows — name lookup would throw
    media.select("media_id", "content").mapPartitions { rows =>
      val c = codec
      rows.map { r =>
        val id = r.getLong(0)
        c.stats(r.getAs[Array[Byte]](1)) match {
          case Some((w, h, s)) => Row(id, w, h, s)
          case None => Row(id, -1, -1, -1L)
        }
      }
    }(enc)
  }

  /** Row-preserving resize: each image re-encoded at (w, h) — the thumbnail
    * normalization step before feature extraction. Undecodable payloads
    * pass through null.
    */
  def resizeImages(
      media: DataFrame,
      w: Int,
      h: Int,
      codec: ImageCodec = PgmCodec): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select("media_id", "content").mapPartitions { rows =>
      val c = codec
      rows.map(r => Row(r.getLong(0), c.resize(r.getAs[Array[Byte]](1), w, h).orNull))
    }(enc)
  }

  /** Row-preserving audio resample — the audio analogue of
    * [[resizeImages]], the normalization step before fingerprinting or
    * feature extraction when a crawl corpus mixes sample rates:
    * nearest-FRAME pick at the target rate (the resize() index rule —
    * output frame j reads source frame ⌊j·srcRate/targetRate⌋; real
    * sample work, deterministic, no interpolation libs), channels kept
    * interleaved frame-wise, re-encoded as canonical RIFF PCM16 (which
    * then rides [[WavCodec]]'s fast decode path downstream). Output
    * frame count is ⌊frames·target/src⌋ — a ≥1-frame clip at any rate
    * pair stays decodable. Undecodable payloads pass through null
    * ([[resizeImages]] rule). Map-only; blobs never shuffle.
    */
  def resampleAudio(media: DataFrame, targetRate: Int): DataFrame = {
    require(targetRate > 0, s"targetRate must be positive; got $targetRate")
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val target = targetRate
    media.select("media_id", "content").mapPartitions { rows =>
      rows.map { r =>
        val out: Array[Byte] = WavCodec.decode(r.getAs[Array[Byte]](1)) match {
          case Some(a) =>
            val ch = a.channels
            val frames = a.samples.length / ch
            val outFrames = (frames.toLong * target / a.sampleRate).toInt
            val res = new Array[Short](outFrames * ch)
            var j = 0
            while (j < outFrames) {
              val src = (j.toLong * a.sampleRate / target).toInt
              var c = 0
              while (c < ch) { res(j * ch + c) = a.samples(src * ch + c); c += 1 }
              j += 1
            }
            WavCodec.encode(target, ch, res)
          case None => null
        }
        Row(r.getLong(0), out)
      }
    }(enc)
  }

  /** Audio content fingerprint — the audio analogue of [[imageAHash]]: the
    * decoded clip's samples split into `frames` contiguous windows, one bit
    * per window = "window mean |amplitude| above the clip mean" — an
    * energy-envelope signature that survives re-encoding and small edits
    * while staying EXACT-integer (the bit rule is the cross-multiplied
    * comparison `energy_w · n > total · len_w`, evaluated as an unsigned
    * 128-bit product compare so a billion-sample clip cannot overflow —
    * no float mean, so the DuckDB oracle reproduces it bit-for-bit; with
    * equal window lengths it reduces to `frames · energy_w > total`, the
    * form the q81 oracle evaluates). `frames ≤ 62` keeps the fingerprint
    * in a non-negative long (DuckDB's checked `<<` on the oracle side).
    * Undecodable payloads yield a null fingerprint. Map-only, blobs never
    * shuffle.
    */
  def audioFingerprint(media: DataFrame, frames: Int = 32): DataFrame = {
    require(frames > 0 && frames <= 62, s"fingerprint needs 1..62 frame bits; got $frames")
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("afp", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val nf = frames
    media.select("media_id", "content").mapPartitions { rows =>
      // unsigned 128-bit compare of two non-negative long products —
      // exact at any clip length (a plain long multiply overflows past
      // ~5·10^5 samples when cross-multiplying against the clip total)
      def productGt(a: Long, b: Long, c: Long, d: Long): Boolean = {
        val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
        val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
        hi1 > hi2 || (hi1 == hi2 && java.lang.Long.compareUnsigned(lo1, lo2) > 0)
      }
      rows.map { r =>
        val id = r.getLong(0)
        WavCodec.decode(r.getAs[Array[Byte]](1)) match {
          case Some(a) if a.samples.nonEmpty =>
            val n = a.samples.length
            var total = 0L
            var i = 0
            while (i < n) { total += math.abs(a.samples(i).toLong); i += 1 }
            var fp = 0L
            var w = 0
            while (w < nf) {
              val lo = (w.toLong * n / nf).toInt
              val hi = ((w + 1).toLong * n / nf).toInt
              var e = 0L
              i = lo
              while (i < hi) { e += math.abs(a.samples(i).toLong); i += 1 }
              if (productGt(e, n.toLong, total, (hi - lo).toLong)) fp |= 1L << w
              w += 1
            }
            Row(id, fp)
          case _ => Row(id, null)
        }
      }
    }(enc)
  }

  /** Audio near-dup pairs from [[audioFingerprint]] output: the
    * [[imageNearDupPairs]] recipe over a single fingerprint column —
    * `bands` equal bit-bands key the candidate self-join, candidates
    * verified at `hamming ≤ maxHamming` (pigeonhole: a pair within
    * `bands - 1` bits always shares a clean band — recall 1.0 at
    * maxHamming ≤ 3 with the default 4 bands). Same scale posture as the
    * image tier: bucket size is bounded by the duplicate-cluster size;
    * replica-heavy corpora pass `maxBucketSize` to route oversized buckets
    * through [[Dedup.guardedBandPairs]]' star-collapse (the q17 pattern —
    * see [[imageNearDupPairs]] for the semantics and disclosure contract).
    */
  def audioNearDupPairs(
      fps: DataFrame,
      idCol: String = "media_id",
      frames: Int = 32,
      bands: Int = 4,
      maxHamming: Int = 3,
      maxBucketSize: Option[Int] = None): DataFrame = {
    require(bands > 0 && frames % bands == 0,
      s"bands must divide the fingerprint width; got $frames/$bands")
    import Ckpt.CkptOps
    val bandBits = frames / bands
    val mask = (1L << bandBits) - 1
    val h = fps.filter(col("afp").isNotNull)
      .select(col(idCol).as("__pid"), col("afp").as("__fp"))
      .lazySerCkpt // the self-join must not decode the corpus twice
    maxBucketSize match {
      case Some(max) =>
        // guarded route: same band explode, flattened to the (id, fp,
        // band, bucket, sub) shape guardedBandPairs consumes. fp = the
        // fingerprint itself (identical fp ⇔ identical envelope — the
        // star-collapse groups exact audio dups); sub = fp too, because
        // the bands consume every fingerprint bit (see imageNearDupPairs)
        val banded = h.select(col("__pid").as("id"), col("__fp").as("fp"),
          col("__fp").as("sub"),
          explode(array((0 until bands).map(b =>
            struct(lit(b).as("band"),
              shiftrightunsigned(col("__fp"), b * bandBits).bitwiseAND(lit(mask))
                .as("bucket"))): _*)).as("__b"))
          .select(col("id"), col("fp"), col("__b.band").as("band"),
            col("__b.bucket").as("bucket"), col("sub"))
        Dedup.guardedBandPairs(banded, max).distinct()
          .join(h.select(col("__pid").as("id1"), col("__fp").as("__fp1")), Seq("id1"))
          .join(h.select(col("__pid").as("id2"), col("__fp").as("__fp2")), Seq("id2"))
          .withColumn("hamming",
            Dedup.hamming64(col("__fp1"), col("__fp2")).cast("int"))
          .filter(col("hamming") <= maxHamming)
          .select("id1", "id2", "hamming")
      case None =>
        val banded = h.select(col("__pid"), col("__fp"),
          explode(array((0 until bands).map(b =>
            struct(lit(b).as("band_idx"),
              shiftrightunsigned(col("__fp"), b * bandBits).bitwiseAND(lit(mask))
                .as("band_val"))): _*)).as("__b"))
        val a = banded.select(col("__pid").as("id1"), col("__fp").as("__fp1"),
          col("__b").as("__b1"))
        val b = banded.select(col("__pid").as("id2"), col("__fp").as("__fp2"),
          col("__b").as("__b2"))
        a.join(b, col("__b1") === col("__b2") && col("id1") < col("id2"))
          .select("id1", "id2", "__fp1", "__fp2").distinct()
          .withColumn("hamming",
            Dedup.hamming64(col("__fp1"), col("__fp2")).cast("int"))
          .filter(col("hamming") <= maxHamming)
          .select("id1", "id2", "hamming")
    }
  }

  /** Perceptual average-hash (aHash) per image — the decode-side half of
    * image-level near-dup detection, the visual analogue of the text tier's
    * SimHash (q19/q47): nearest-neighbor downsample to `size`×`size`, then
    * one bit per sample = "above the downsampled mean" (strict, in exact
    * integer form `size²·v > Σv` — no float mean, so the DuckDB oracle
    * reproduces it bit-for-bit). The 64-bit hash ships as two longs
    * (`ahash_hi` = bits 32..63, `ahash_lo` = bits 0..31): bit 63 in one
    * signed 64-bit column would read negative on the engine and overflow
    * DuckDB's checked `<<` on the oracle side, and the split halves are
    * what the band extraction reads anyway. Undecodable payloads yield
    * null hashes (they cannot be "visually similar" to anything — the
    * pairing stage filters them).
    *
    * Same partition-local mapPartitions shape as [[imageStats]]: map-only,
    * blobs never shuffle, embarrassingly parallel at any corpus size.
    */
  /** The aHash core shared by [[imageAHash]] (per image) and
    * [[videoFingerprint]] (per frame): nearest-neighbor sample grid (the
    * resize() index rule), exact-integer mean threshold over exactly the
    * n² samples, bits packed (hi = 32..63, lo = 0..31).
    */
  private def ahashOf(px: Array[Byte], w: Int, h: Int, n: Int): (Long, Long) = {
    val v = new Array[Int](n * n)
    var sum = 0L
    var y = 0
    while (y < n) {
      val sy = y * h / n
      var x = 0
      while (x < n) {
        val s = px(sy * w + x * w / n) & 0xff
        v(y * n + x) = s
        sum += s
        x += 1
      }
      y += 1
    }
    var hi = 0L
    var lo = 0L
    var pos = 0
    while (pos < n * n) {
      if (v(pos).toLong * (n * n) > sum) {
        if (pos >= 32) hi |= 1L << (pos - 32) else lo |= 1L << pos
      }
      pos += 1
    }
    (hi, lo)
  }

  private val AHashSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("ahash_hi", LongType, nullable = true),
    StructField("ahash_lo", LongType, nullable = true)))

  def imageAHash(media: DataFrame, codec: ImageCodec = PgmCodec, size: Int = 8): DataFrame = {
    require(size > 0 && size * size <= 64, s"aHash needs 1..64 sample bits; size=$size")
    val enc = org.apache.spark.sql.Encoders.row(AHashSchema)
    val n = size
    media.select("media_id", "content").mapPartitions { rows =>
      val c = codec
      rows.map { r =>
        val id = r.getLong(0)
        c.decodeImage(r.getAs[Array[Byte]](1)) match {
          case Some((w, h, _, px)) =>
            val (hi, lo) = ahashOf(px, w, h, n)
            Row(id, hi, lo)
          case None => Row(id, null, null)
        }
      }
    }(enc)
  }

  /** Video clip fingerprint — temporal pooling of per-frame aHashes, the
    * shape real video dedup uses (pooled frame hashes survive re-encodes
    * and small cuts): iterate the clip's frames through the codec's
    * [[Codec.frames]], aHash each decodable frame, and set a clip bit by
    * PER-BIT MAJORITY (`2·count ≥ n_frames` — the ≥-half rule, ties set).
    * Output columns match [[imageAHash]] (`ahash_hi`/`ahash_lo` plus
    * `n_frames`), so [[imageNearDupPairs]] consumes clip fingerprints
    * unchanged — video rides the same banded near-dup tier. A clip with
    * zero decodable frames (or one the codec rejects mid-stream —
    * PgmCodec.frames throws on corrupt trailing bytes by design) yields
    * null: an unreadable clip must not fail the partition here, the
    * corpus-audit rule.
    *
    * FRAME-SAMPLING CONTRACT (VERDICT r12 next #5): per-frame hashing is
    * the cost ceiling on real clips (an hour at 25 fps is 90 000 frames),
    * so the pooled hash can be computed over a bounded, deterministic
    * SAMPLE: `frameStride` hashes every stride-th frame (positions 0,
    * stride, 2·stride, …) and `maxFrames` stops the clip's decode after
    * that many frames were HASHED — cost per clip is then
    * O(maxFrames · decode), independent of clip length. `frameStride = 1,
    * maxFrames = MaxValue` is bit-identical to the unsampled semantics
    * (spec-pinned). Two consequences of bounded sampling, both by design:
    * skipped frames still pay the container's frame PARSE (the iterator
    * must advance — a real seeking codec would skip cheaper), and a
    * corrupt region AFTER the sampled prefix is never seen (the clip
    * fingerprints from its healthy prefix instead of nulling — bounded
    * cost is the contract, tail validation is the full scan's job).
    */
  def videoFingerprint(
      media: DataFrame,
      codec: ImageCodec = PgmCodec,
      size: Int = 8,
      everyMs: Long = 40L,
      frameStride: Int = 1,
      maxFrames: Int = Int.MaxValue): DataFrame = {
    require(size > 0 && size * size <= 64, s"aHash needs 1..64 sample bits; size=$size")
    require(frameStride >= 1, s"frameStride must be >= 1; got $frameStride")
    require(maxFrames >= 1, s"maxFrames must be >= 1; got $maxFrames")
    val schema = StructType(AHashSchema.fields.toSeq :+
      StructField("n_frames", LongType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val n = size
    val stride = frameStride
    val cap = maxFrames
    media.select("media_id", "content").mapPartitions { rows =>
      val c = codec
      rows.map { r =>
        val id = r.getLong(0)
        val counts = new Array[Int](n * n)
        var frames = 0
        try {
          val it = c.frames(r.getAs[Array[Byte]](1), everyMs)
          var pos0 = 0L
          while (frames < cap && it.hasNext) {
            val (_, bytes) = it.next()
            if (pos0 % stride == 0) {
              c.decodeImage(bytes) match {
                case Some((w, h, _, px)) =>
                  val (hi, lo) = ahashOf(px, w, h, n)
                  var pos = 0
                  while (pos < n * n) {
                    val set =
                      if (pos >= 32) (hi >>> (pos - 32)) & 1L else (lo >>> pos) & 1L
                    counts(pos) += set.toInt
                    pos += 1
                  }
                  frames += 1
                case None => // skip undecodable frame
              }
            }
            pos0 += 1
          }
        } catch {
          case scala.util.control.NonFatal(_) => frames = 0 // corrupt clip
        }
        if (frames == 0) Row(id, null, null, 0L)
        else {
          var hi = 0L
          var lo = 0L
          var pos = 0
          while (pos < n * n) {
            if (2 * counts(pos) >= frames) {
              if (pos >= 32) hi |= 1L << (pos - 32) else lo |= 1L << pos
            }
            pos += 1
          }
          Row(id, hi, lo, frames.toLong)
        }
      }
    }(enc)
  }

  /** One-pass image audit: [[imageStats]] AND [[imageAHash]] from a single
    * decode of each blob — the production-audit form ([[RunMediaAudit]]):
    * writing stats and hashes as two separate jobs decodes the whole
    * corpus twice, and for PNG payloads the "stats" half is a full zlib
    * inflate (only PGM has a zero-copy stats path). Columns are the union
    * of the two operators' outputs; undecodable rows carry the −1 stats
    * markers and null hashes together.
    */
  def imageAudit(media: DataFrame, codec: ImageCodec = PgmCodec, size: Int = 8): DataFrame = {
    require(size > 0 && size * size <= 64, s"aHash needs 1..64 sample bits; size=$size")
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sum_px", LongType, nullable = false),
      StructField("ahash_hi", LongType, nullable = true),
      StructField("ahash_lo", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val n = size
    media.select("media_id", "content").mapPartitions { rows =>
      val c = codec
      rows.map { r =>
        val id = r.getLong(0)
        c.decodeImage(r.getAs[Array[Byte]](1)) match {
          case Some((w, h, _, px)) =>
            var s = 0L
            var i = 0
            while (i < px.length) { s += px(i) & 0xff; i += 1 }
            val (hi, lo) = ahashOf(px, w, h, n)
            Row(id, w, h, s, hi, lo)
          case None => Row(id, -1, -1, -1L, null, null)
        }
      }
    }(enc)
  }

  /** One-pass audio audit: [[audioStats]] AND [[audioFingerprint]] from a
    * single decode of each clip (the [[imageAudit]] rationale).
    */
  def audioAudit(media: DataFrame, frames: Int = 32): DataFrame = {
    require(frames > 0 && frames <= 62, s"fingerprint needs 1..62 frame bits; got $frames")
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("duration_ms", LongType, nullable = false),
      StructField("sum_samples", LongType, nullable = false),
      StructField("peak", IntegerType, nullable = false),
      StructField("afp", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val nf = frames
    media.select("media_id", "content").mapPartitions { rows =>
      def productGt(a: Long, b: Long, c: Long, d: Long): Boolean = {
        val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
        val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
        hi1 > hi2 || (hi1 == hi2 && java.lang.Long.compareUnsigned(lo1, lo2) > 0)
      }
      rows.map { r =>
        val id = r.getLong(0)
        WavCodec.decode(r.getAs[Array[Byte]](1)) match {
          case Some(a) =>
            var sum = 0L
            var total = 0L
            var peak = Int.MinValue
            var i = 0
            while (i < a.samples.length) {
              val v = a.samples(i).toInt
              sum += v
              total += math.abs(v.toLong)
              if (v > peak) peak = v
              i += 1
            }
            val n = a.samples.length
            val fp: Any =
              if (n == 0) null
              else {
                var out = 0L
                var w = 0
                while (w < nf) {
                  val lo = (w.toLong * n / nf).toInt
                  val hi = ((w + 1).toLong * n / nf).toInt
                  var e = 0L
                  i = lo
                  while (i < hi) { e += math.abs(a.samples(i).toLong); i += 1 }
                  if (productGt(e, n.toLong, total, (hi - lo).toLong)) out |= 1L << w
                  w += 1
                }
                out
              }
            val frames0 = n / a.channels
            Row(id, a.sampleRate, a.channels, n.toLong,
              frames0.toLong * 1000L / a.sampleRate, sum,
              if (n == 0) 0 else peak, fp)
          case None => Row(id, -1, -1, -1L, -1L, -1L, -1, null)
        }
      }
    }(enc)
  }

  /** Image near-dup pairs from [[imageAHash]] output: 16-bit band-exact
    * LSH over the hash halves (two bands per half), candidates verified at
    * `hamming ≤ maxHamming` — visually-near-identical images (re-encodes,
    * slight brightness shifts) land within a few bits while distinct
    * images scatter. A true pair within the threshold disagrees in ≤
    * maxHamming bits, so with 4 bands any pair at maxHamming ≤ 3 shares a
    * clean band by pigeonhole (recall 1.0 there; above that, recall is the
    * standard banded-LSH trade).
    *
    * CONTRACT: the input hashes must be FULL 64-bit aHashes (size 8 —
    * the [[imageAHash]] default). A narrower hash leaves its high bands
    * constant zero, every row co-buckets on them, and the candidate join
    * silently degenerates to ~n²/2 — callers with sub-64-bit hashes must
    * band to their own width instead (the [[audioNearDupPairs]] shape).
    *
    * Scale shape: the self-join keys on (band_idx, band_val) — bucket size
    * is bounded by the perceptual-duplicate cluster size, the same
    * replica-cluster exposure as every banded-LSH tier here. On a
    * replication-heavy corpus (one meme repeated millions of times) the
    * plain join's verified output grows quadratically per cluster — pass
    * `maxBucketSize` to route oversized buckets through
    * [[Dedup.guardedBandPairs]]' star-collapse instead (VERDICT r12 next
    * #1): a bucket over the limit emits (rep = min id per fingerprint,
    * member) star pairs plus one rep-level clique, so output per bucket is
    * linear in members + quadratic only in DISTINCT fingerprints.
    * Activation is disclosed through the `lsh_bucket_guard_*` observed
    * metrics, and oracle-gated runs treat any nonzero counter as
    * divergence from the plain join (graft.Verify) unless the oracle
    * itself mirrors the guard (q87).
    *
    * Guard sub-key note: the four bands consume all 64 hash bits, so —
    * unlike the embedding tier, which has sign bits no band used — there
    * is no extra signature signal for the sub-split level; sub = fp, which
    * makes the sub-split degenerate to per-fingerprint singletons (zero
    * extra pairs, nothing dropped). A bucket with more than
    * `maxBucketSize` DISTINCT fingerprints therefore contributes only its
    * star pairs, with `subsplit_rep_rows` disclosing the recall loss.
    *
    * Null hashes (undecodable images) are filtered before banding.
    */
  def imageNearDupPairs(
      hashes: DataFrame,
      idCol: String = "media_id",
      maxHamming: Int = 6,
      maxBucketSize: Option[Int] = None): DataFrame = {
    import Ckpt.CkptOps
    // checkpoint the hash frame: the self-join's two sides would otherwise
    // each re-execute the full upstream lineage — on a real corpus that is
    // DECODING every image twice to save a 24-byte-per-row materialization
    val h = hashes
      .filter(col("ahash_hi").isNotNull && col("ahash_lo").isNotNull)
      .select(col(idCol).as("__pid"), col("ahash_hi").as("__hi"), col("ahash_lo").as("__lo"))
      .lazySerCkpt
    val bandArr = array(
      struct(lit(0).as("band_idx"), col("__lo").bitwiseAND(lit(0xffffL)).as("band_val")),
      struct(lit(1).as("band_idx"), shiftrightunsigned(col("__lo"), 16).as("band_val")),
      struct(lit(2).as("band_idx"), col("__hi").bitwiseAND(lit(0xffffL)).as("band_val")),
      struct(lit(3).as("band_idx"), shiftrightunsigned(col("__hi"), 16).as("band_val")))
    maxBucketSize match {
      case Some(max) =>
        // fp = the full hash as a struct (exact equality, no xxhash
        // collision risk in the star-collapse); sub = fp (see scaladoc).
        // Thin (id, fp, band, bucket, sub) rows ride the guard's shuffles;
        // the 16-byte hashes join back only per surviving pair.
        val banded = h.select(col("__pid").as("id"),
          struct(col("__hi"), col("__lo")).as("fp"),
          struct(col("__hi"), col("__lo")).as("sub"),
          explode(bandArr).as("__b"))
          .select(col("id"), col("fp"), col("__b.band_idx").as("band"),
            col("__b.band_val").as("bucket"), col("sub"))
        Dedup.guardedBandPairs(banded, max).distinct()
          .join(h.select(col("__pid").as("id1"),
            col("__hi").as("__hi1"), col("__lo").as("__lo1")), Seq("id1"))
          .join(h.select(col("__pid").as("id2"),
            col("__hi").as("__hi2"), col("__lo").as("__lo2")), Seq("id2"))
          .withColumn("hamming",
            (Dedup.hamming64(col("__hi1"), col("__hi2")) +
              Dedup.hamming64(col("__lo1"), col("__lo2"))).cast("int"))
          .filter(col("hamming") <= maxHamming)
          .select("id1", "id2", "hamming")
      case None =>
        val banded = h.select(col("__pid"), col("__hi"), col("__lo"),
          explode(bandArr).as("__b"))
        // rename the band key per side: a self-join on the SAME attribute
        // resolves to a trivially-true predicate (Spark's '__b == __b'
        // warning) and the join silently degenerates to a filtered cartesian
        val a = banded.select(col("__pid").as("id1"), col("__hi").as("__hi1"),
          col("__lo").as("__lo1"), col("__b").as("__b1"))
        val b = banded.select(col("__pid").as("id2"), col("__hi").as("__hi2"),
          col("__lo").as("__lo2"), col("__b").as("__b2"))
        a.join(b, col("__b1") === col("__b2") && col("id1") < col("id2"))
          .select("id1", "id2", "__hi1", "__lo1", "__hi2", "__lo2").distinct()
          .withColumn("hamming",
            (Dedup.hamming64(col("__hi1"), col("__hi2")) +
              Dedup.hamming64(col("__lo1"), col("__lo2"))).cast("int"))
          .filter(col("hamming") <= maxHamming)
          .select("id1", "id2", "hamming")
    }
  }

  /** Metadata-only projection — the common fast path: prune the blob column
    * at the scan so a stats query never reads media bytes (column pruning
    * reaches the parquet reader; verify via ReadSchema in `.explain`).
    */
  def mediaStats(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("modality"),
        col("meta.mime").as("mime"), col("meta.width").as("width"),
        col("meta.height").as("height"), col("meta.duration_ms").as("duration_ms"))
      .groupBy("modality", "mime")
      .agg(count(lit(1)).as("n"), avg(col("duration_ms")).as("avg_duration_ms"))
}
