package graft

import graft.multimodal.{MediaCodec, MediaPipeline}
import org.scalatest.funsuite.AnyFunSuite

/** The real codec layer: byte-level container parsers (PNG IHDR, JPEG
  * SOF walk, RIFF/WAVE chunk walk), full JDK decode, and the
  * deterministic encoders — all pure JVM, all total on garbage input. */
class MediaCodecSpec extends AnyFunSuite {

  test("png: encode → sniff + IHDR parse + lossless pixel round trip") {
    val w = 37; val h = 23
    def pix(x: Int, y: Int): Int = (x * 7 + y * 13 + 5) % 256
    val png = MediaCodec.encodePng(w, h, pix)
    assert(MediaCodec.sniff(png) === Some("png"))
    val hdr = MediaCodec.probe(png).get
    assert(hdr.format === "png" && hdr.width === w && hdr.height === h)
    assert(hdr.channels === 1 && hdr.bitDepth === 8)
    val img = MediaCodec.decodeImage(png).get
    assert(img.getWidth === w && img.getHeight === h)
    val lum = MediaCodec.luminance(img)
    for (y <- 0 until h; x <- 0 until w)
      assert(lum(y * w + x) === pix(x, y), s"pixel ($x,$y)")
  }

  test("jpeg: encode → SOF header parse agrees with full decode dims") {
    val w = 41; val h = 17
    val jpg = MediaCodec.encodeJpeg(w, h, (x, y) => (x * 65536 + y * 256 + 128))
    assert(MediaCodec.sniff(jpg) === Some("jpeg"))
    val hdr = MediaCodec.probe(jpg).get
    assert(hdr.format === "jpeg" && hdr.width === w && hdr.height === h)
    assert(hdr.channels === 3 && hdr.bitDepth === 8)
    val img = MediaCodec.decodeImage(jpg).get
    assert(img.getWidth === w && img.getHeight === h)
  }

  test("wav: encode → RIFF parse + exact PCM16 sample round trip") {
    val samples = Array.tabulate(730)(i => ((i * 131) % 2001 - 1000).toShort)
    val wav = MediaCodec.encodeWavPcm16(sampleRate = 11000, channels = 2, samples)
    assert(MediaCodec.sniff(wav) === Some("wav"))
    val hdr = MediaCodec.probe(wav).get
    assert(hdr.format === "wav" && hdr.channels === 2)
    assert(hdr.sampleRate === 11000 && hdr.bitDepth === 16)
    assert(hdr.width === 0 && hdr.height === 0)
    // 730 interleaved samples / 2 channels = 365 frames
    assert(hdr.durationMs === 365L * 1000 / 11000)
    assert(MediaCodec.wavSamples(wav).get.toSeq === samples.toSeq)
  }

  test("wav: chunk walk skips foreign chunks before fmt/data") {
    val samples = Array.tabulate(64)(i => (i * 3).toShort)
    val plain = MediaCodec.encodeWavPcm16(8000, 1, samples)
    // splice a LIST chunk (odd-length, exercising word alignment)
    // between WAVE and fmt
    val junk = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = plain.take(12) ++ junk ++ plain.drop(12)
    val hdr = MediaCodec.probe(spliced).get
    assert(hdr.sampleRate === 8000 && hdr.channels === 1)
    assert(MediaCodec.wavSamples(spliced).get.toSeq === samples.toSeq)
  }

  test("avi: encode → RIFF form parse + exact sampled-frame DIB round trip") {
    val w = 13; val h = 9; val fps = 15; val nF = 7 // w forces stride padding (16)
    def pix(x: Int, y: Int, f: Int): Int = (x * 5 + y * 11 + f * 29) % 256
    val avi = MediaCodec.encodeAviDib(w, h, fps, nF, pix)
    assert(MediaCodec.sniff(avi) === Some("avi"))
    val hdr = MediaCodec.probe(avi).get
    assert(hdr.format === "avi" && hdr.width === w && hdr.height === h)
    assert(hdr.sampleRate === fps && hdr.bitDepth === 8)
    assert(hdr.durationMs === nF * 1000L / fps)
    val offs = MediaCodec.aviFrameOffsets(avi).get
    assert(offs.length === nF)
    for (f <- 0 until nF) {
      val lum = MediaCodec.aviFrameLuma(avi, w, h, offs(f)).get
      for (y <- 0 until h; x <- 0 until w)
        assert(lum(y * w + x) === pix(x, y, f), s"pixel ($x,$y) frame $f")
    }
  }

  test("avi: parser is total on truncation and rejects out-of-range frame reads") {
    val avi = MediaCodec.encodeAviDib(8, 8, 10, 3, (x, y, f) => x + y + f)
    for (cut <- Seq(4, 11, 40, 100, avi.length - 1))
      assert(MediaCodec.aviInfo(avi.take(cut)) === None, s"cut=$cut")
    assert(MediaCodec.aviFrameOffsets(avi.take(60)) === None)
    val offs = MediaCodec.aviFrameOffsets(avi).get
    assert(MediaCodec.aviFrameLuma(avi, 8, 8, avi.length - 10) === None)
    assert(MediaCodec.aviFrameLuma(avi, 8, 8, -1) === None)
    assert(MediaCodec.aviFrameLuma(avi, 8, 8, offs(2)).isDefined)
  }

  test("avi: totality on crafted headers — dim overflow, deep LIST nesting, fps guard") {
    val avi = MediaCodec.encodeAviDib(8, 8, 10, 3, (x, y, f) => x + y + f)
    // Int-wrap attack: stride*h with h=0x40000001 wraps to 4 and would
    // pass an Int bounds guard into an out-of-bounds copy loop
    assert(MediaCodec.aviFrameLuma(avi, 4, 0x40000001, 0) === None)
    assert(MediaCodec.aviFrameLuma(avi, 0x10000, 0x10000, 0) === None)
    // a crafted chain of nested hdrl LISTs must not blow the stack
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    var inner = Array.emptyByteArray
    for (_ <- 0 until 5000)
      inner = "LIST".getBytes ++ le32(inner.length + 4) ++ "hdrl".getBytes ++ inner
    val nested = "RIFF".getBytes ++ le32(inner.length + 4) ++
      "AVI ".getBytes ++ inner
    assert(MediaCodec.aviInfo(nested) === None) // depth-capped, no throw
    // encoder fails fast on nonsense params instead of ArithmeticException
    intercept[IllegalArgumentException] {
      MediaCodec.encodeAviDib(8, 8, fps = 0, nFrames = 3, (_, _, _) => 0)
    }
    intercept[IllegalArgumentException] {
      MediaCodec.encodeAviDib(8, 8, fps = 10, nFrames = 0, (_, _, _) => 0)
    }
  }

  test("parsers are total: garbage, truncation, wrong formats → None") {
    val garbage = Array.tabulate(64)(i => (i * 97).toByte)
    assert(MediaCodec.sniff(garbage) === None)
    assert(MediaCodec.probe(garbage) === None)
    assert(MediaCodec.decodeImage(garbage) === None)
    assert(MediaCodec.wavSamples(garbage) === None)
    assert(MediaCodec.sniff(Array.emptyByteArray) === None)
    assert(MediaCodec.probe("hello world, plain text".getBytes("UTF-8")) === None)
    val png = MediaCodec.encodePng(9, 9, (_, _) => 42)
    for (cut <- Seq(4, 12, 20, 25))
      assert(MediaCodec.pngInfo(png.take(cut)) === None, s"cut=$cut")
    val wav = MediaCodec.encodeWavPcm16(8000, 1, Array.fill(10)(1.toShort))
    assert(MediaCodec.wavInfo(wav.take(30)) === None) // truncated mid-fmt
  }

  test("mediaFp is total: seeded fuzz over random, truncated and bit-flipped containers") {
    // the ingest gate's front line: one thrown codec error in a task
    // kills a stage for one bad row, so mediaFp must return None (or
    // a fingerprint), never throw, on ANY bytes
    val rnd = new scala.util.Random(0xC0FFEE)
    def check(bytes: Array[Byte]): Unit = {
      val r = MediaPipeline.mediaFp(bytes) // must not throw
      r.foreach { case (kind, _) =>
        assert(Set("image", "audio", "video")(kind))
      }
    }
    for (_ <- 0 until 200)
      check(Array.fill(rnd.nextInt(512))(rnd.nextInt().toByte))
    val real = Seq(
      MediaCodec.encodePng(12, 9, (x, y) => (x * 3 + y) % 256),
      MediaCodec.encodeJpeg(16, 12, (x, y) => (x * 9 + y * 4) * 0x010101),
      MediaCodec.encodeWavPcm16(8000, 1,
        Array.tabulate(300)(i => (i * 7 % 800 - 400).toShort)),
      MediaCodec.encodeAviDib(8, 8, 10, 3, (x, y, f) => x + y + f))
    real.foreach { bytes =>
      assert(MediaPipeline.mediaFp(bytes).isDefined, "real media must fingerprint")
      for (cut <- Seq(2, 7, 13, bytes.length / 2, bytes.length - 3))
        check(bytes.take(cut))
      // single-bit corruptions at seeded positions
      for (_ <- 0 until 30) {
        val b = bytes.clone()
        val i = rnd.nextInt(b.length)
        b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
        check(b)
      }
    }
  }

  test("pipeline decode dispatch: real media → real features, text → byte-fold") {
    val meta = MediaPipeline.MediaMeta("png", 10, 10, 1, 0L)
    // a flat 50%-gray image: every pixel in one luminance bin
    val png = MediaCodec.encodePng(10, 10, (_, _) => 128)
    val feat = MediaPipeline.decode(png, meta, 16)
    assert(feat.length === 16)
    assert(feat(128 * 16 / 256) === 1.0f) // all mass in bin 8
    assert(feat.sum === 1.0f)
    // constant-amplitude audio: every band mean |amp| = 500
    val wav = MediaCodec.encodeWavPcm16(8000, 1, Array.fill(1600)(500.toShort))
    val afeat = MediaPipeline.decode(wav, meta.copy(format = "wav"), 16)
    assert(afeat.length === 16 && afeat.forall(_ === 500.0f))
    // opaque text bytes keep the integer-exact byte-fold contract
    val text = "abcdefgh".getBytes("UTF-8")
    val tfeat = MediaPipeline.decode(text, meta, 4)
    assert(tfeat.toSeq === Seq(
      ('a' + 'e') / 256.0f, ('b' + 'f') / 256.0f,
      ('c' + 'g') / 256.0f, ('d' + 'h') / 256.0f))
  }
}
