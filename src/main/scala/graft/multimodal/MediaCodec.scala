package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/**
 * Real media parsing/decoding on the pure JDK — no external codec
 * libraries. Three layers, all over in-memory byte arrays (the shape a
 * `binary` parquet column hands a task):
 *
 *  1. **Header sniffing** (`sniff`, `pngInfo`, `jpegInfo`, `wavInfo`):
 *     byte-level container parsing — PNG IHDR, JPEG SOF marker walk,
 *     RIFF/WAVE chunk walk. This is the cheap metadata pass a 100 TB
 *     pipeline runs FIRST (dimensions / sample-rate / duration without
 *     decompressing anything), so corrupt or out-of-policy media is
 *     dropped before any decode cost is paid.
 *  2. **Full decode** (`decodeImage` via `javax.imageio`,
 *     `wavSamples` as a direct PCM16 parse): actual pixels and
 *     samples, used by the feature/resize stages in
 *     [[MediaPipeline]].
 *  3. **Deterministic encoders** (`encodePng`, `encodeWavPcm16`):
 *     fixture synthesis — the test corpus carries no real media, so
 *     round-trip queries (x59) build genuine PNG/WAV payloads in the
 *     scan stage and verify the parse/decode layers against an
 *     arithmetic oracle.
 *
 * Every parser is total: malformed/truncated/foreign bytes return
 * `None`, never throw — at corpus scale a thrown codec error in a
 * task kills a 10k-partition stage for one bad row.
 */
object MediaCodec {

  // ImageIO wraps every read/write in a FILE-cached image stream by
  // default — one disk temp file created, written, read back and
  // deleted PER encode/decode call. These rasters are bounded
  // in-memory byte arrays; the memory-cached stream produces
  // byte-identical output (the cache is transport, not encoding) and
  // removes a filesystem round trip from every x59/x98/x116 row
  // (guide §1.2: fix per-task work once the shape is right).
  // NB: setUseCache mutates PROCESS-GLOBAL ImageIO state, first
  // applied when this object initializes — any other ImageIO user in
  // the executor JVM also gets memory-cached streams (output stays
  // byte-identical either way; only peak memory vs temp-file I/O
  // differ). Scoped per-call wrappers (MemoryCacheImageInputStream)
  // would avoid the global toggle at the cost of one wrapper
  // allocation per row; the engine owns its executors, so the global
  // form is the deliberate choice.
  ImageIO.setUseCache(false)

  /** Unified media header: images fill width/height/bitDepth/channels,
    * audio fills channels/sampleRate/bitsPerSample/durationMs. */
  final case class MediaHeader(
      format: String,      // "png" | "jpeg" | "wav"
      width: Int,          // 0 for audio
      height: Int,         // 0 for audio
      channels: Int,
      bitDepth: Int,       // per sample/channel
      sampleRate: Int,     // 0 for images
      durationMs: Long)    // 0 for images

  // ------------------------------------------------------------------
  // byte helpers (bounds-checked; parsers stay total)
  // ------------------------------------------------------------------

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    new String(b, i, n, "US-ASCII")

  /** RIFF LIST nesting cap (real AVIs nest 2 deep: hdrl→strl). */
  private val MaxListDepth = 16
  /** Frame-raster allocation cap: 64M pixels (256 MB as Array[Int]) —
    * header-declared dimensions are untrusted corpus bytes. */
  private val MaxFramePixels = 1L << 26

  // ------------------------------------------------------------------
  // format sniffing
  // ------------------------------------------------------------------

  private val PngMagic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Identify the container from magic bytes alone. */
  def sniff(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 8 && PngMagic.indices.forall(i => u8(bytes, i) == PngMagic(i)))
      Some("png")
    else if (bytes.length >= 3 && u8(bytes, 0) == 0xff && u8(bytes, 1) == 0xd8 &&
      u8(bytes, 2) == 0xff)
      Some("jpeg")
    else if (bytes.length >= 12 && ascii(bytes, 0, 4) == "RIFF" &&
      ascii(bytes, 8, 4) == "WAVE")
      Some("wav")
    else if (bytes.length >= 12 && ascii(bytes, 0, 4) == "RIFF" &&
      ascii(bytes, 8, 4) == "AVI ")
      Some("avi")
    else None

  // ------------------------------------------------------------------
  // PNG: signature + IHDR (always the first chunk, fixed layout)
  // ------------------------------------------------------------------

  /** PNG IHDR parse: width/height (BE32), bit depth, color type. */
  def pngInfo(bytes: Array[Byte]): Option[MediaHeader] = {
    if (!sniff(bytes).contains("png") || bytes.length < 26) return None
    if (ascii(bytes, 12, 4) != "IHDR") return None
    val w = be32(bytes, 16)
    val h = be32(bytes, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
    val bitDepth = u8(bytes, 24)
    val channels = u8(bytes, 25) match { // color type → sample count
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette-indexed
      case 4 => 2 // gray + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return None
    }
    Some(MediaHeader("png", w.toInt, h.toInt, channels, bitDepth, 0, 0L))
  }

  // ------------------------------------------------------------------
  // JPEG: walk marker segments to the first SOFn frame header
  // ------------------------------------------------------------------

  /** JPEG dimension parse: scan FF-marker segments for SOF0–SOF15
    * (excluding DHT/JPG/DAC which share the C0–CF range), then read
    * precision/height/width/components from the frame header. */
  def jpegInfo(bytes: Array[Byte]): Option[MediaHeader] = {
    if (!sniff(bytes).contains("jpeg")) return None
    var i = 2
    while (i + 3 < bytes.length) {
      if (u8(bytes, i) != 0xff) return None // lost sync
      var marker = u8(bytes, i + 1)
      var j = i + 1
      while (marker == 0xff && j + 1 < bytes.length) { // fill bytes
        j += 1; marker = u8(bytes, j)
      }
      i = j + 1
      marker match {
        case 0xd8 => () // SOI (shouldn't recur) — no payload
        case m if m >= 0xd0 && m <= 0xd9 => () // RST/EOI — no payload
        case m if (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          // SOFn: len(2) precision(1) height(2) width(2) ncomp(1)
          if (i + 7 >= bytes.length) return None
          val precision = u8(bytes, i + 2)
          val h = be16(bytes, i + 3)
          val w = be16(bytes, i + 5)
          val ncomp = u8(bytes, i + 7)
          if (w <= 0 || h <= 0 || ncomp <= 0) return None
          return Some(MediaHeader("jpeg", w, h, ncomp, precision, 0, 0L))
        case 0xda => return None // SOS before any SOF: no frame header
        case _ =>
          if (i + 1 >= bytes.length) return None
          i += be16(bytes, i) // skip segment (length includes itself)
      }
    }
    None
  }

  // ------------------------------------------------------------------
  // WAV: RIFF chunk walk (fmt + data)
  // ------------------------------------------------------------------

  /** WAV header parse: walks RIFF sub-chunks for `fmt ` (channels,
    * sample rate, bits/sample) and `data` (frame count → duration). */
  def wavInfo(bytes: Array[Byte]): Option[MediaHeader] = {
    if (!sniff(bytes).contains("wav")) return None
    var channels = 0; var sampleRate = 0; var bits = 0; var blockAlign = 0
    var dataLen = -1L
    var i = 12
    while (i + 8 <= bytes.length) {
      val id = ascii(bytes, i, 4)
      val len = le32(bytes, i + 4)
      if (len < 0 || i + 8 + len > bytes.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          channels = le16(bytes, i + 10)
          sampleRate = le32(bytes, i + 12).toInt
          blockAlign = le16(bytes, i + 20)
          bits = le16(bytes, i + 22)
        case "data" => dataLen = len
        case _ => () // LIST/INFO/fact… — skip
      }
      i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (channels <= 0 || sampleRate <= 0 || blockAlign <= 0 || dataLen < 0) None
    else {
      val frames = dataLen / blockAlign
      Some(MediaHeader("wav", 0, 0, channels, bits, sampleRate,
        frames * 1000L / sampleRate))
    }
  }

  // ------------------------------------------------------------------
  // AVI: RIFF form walk (LIST hdrl → avih/strh/strf, LIST movi)
  // ------------------------------------------------------------------

  /** AVI header parse: walks the RIFF form for `LIST hdrl`, reads the
    * main header (`avih`: width/height) and the first video stream's
    * `strh` (dwScale/dwRate/dwLength → frame rate and duration) and
    * `strf` BITMAPINFOHEADER (biBitCount). `sampleRate` carries the
    * integer frame rate (dwRate/dwScale), `durationMs` is
    * dwLength·1000·dwScale/dwRate — both from the STREAM header, which
    * is exact where avih's dwMicroSecPerFrame is a rounded
    * reciprocal. */
  def aviInfo(bytes: Array[Byte]): Option[MediaHeader] = {
    if (!sniff(bytes).contains("avi")) return None
    var w = 0; var h = 0; var bits = 0
    var scale = 0L; var rate = 0L; var length = 0L
    var sawVids = false
    // depth-capped: a real AVI nests RIFF→hdrl→strl (2 levels); a
    // crafted chain of nested 12-byte LISTs would otherwise recurse
    // O(bytes.length/12) deep and blow the stack — a throw this layer
    // promises never to make
    def walk(from: Int, to: Int, depth: Int): Boolean = { // false = malformed
      if (depth > MaxListDepth) return false
      var i = from
      while (i + 8 <= to) {
        val id = ascii(bytes, i, 4)
        val len = le32(bytes, i + 4)
        if (len < 0 || i + 8 + len > to) return false
        id match {
          case "LIST" if len >= 4 =>
            val kind = ascii(bytes, i + 8, 4)
            if (kind == "hdrl" || kind == "strl") {
              if (!walk(i + 12, i + 8 + len.toInt, depth + 1)) return false
            } // movi/INFO lists are skipped at header-parse time
          case "avih" if len >= 40 =>
            w = le32(bytes, i + 8 + 32).toInt
            h = le32(bytes, i + 8 + 36).toInt
          case "strh" if len >= 40 =>
            if (ascii(bytes, i + 8, 4) == "vids" && !sawVids) {
              sawVids = true
              scale = le32(bytes, i + 8 + 20)
              rate = le32(bytes, i + 8 + 24)
              length = le32(bytes, i + 8 + 32)
            }
          case "strf" if len >= 16 && sawVids && bits == 0 =>
            bits = le16(bytes, i + 8 + 14) // biBitCount
          case _ => ()
        }
        i += 8 + len.toInt + (len.toInt & 1)
      }
      true
    }
    if (!walk(12, bytes.length, 0)) return None
    if (w <= 0 || h <= 0 || !sawVids || scale <= 0 || rate <= 0) None
    else Some(MediaHeader("avi", w, h, 1, bits, (rate / scale).toInt,
      length * 1000L * scale / rate))
  }

  /** Byte offsets of each video frame's pixel data inside `LIST movi`
    * (`00db`/`00dc` chunks, in stream order) — the seek index a frame
    * SAMPLER uses so only sampled frames ever decode. */
  def aviFrameOffsets(bytes: Array[Byte]): Option[Array[Int]] = {
    if (!sniff(bytes).contains("avi")) return None
    val out = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 12
    while (i + 8 <= bytes.length) {
      val id = ascii(bytes, i, 4)
      val len = le32(bytes, i + 4)
      if (len < 0 || i + 8 + len > bytes.length) return None
      if (id == "LIST" && len >= 4 && ascii(bytes, i + 8, 4) == "movi") {
        var j = i + 12
        val end = i + 8 + len.toInt
        while (j + 8 <= end) {
          val cid = ascii(bytes, j, 4)
          val clen = le32(bytes, j + 4)
          if (clen < 0 || j + 8 + clen > end) return None
          if (cid == "00db" || cid == "00dc") out += j + 8
          j += 8 + clen.toInt + (clen.toInt & 1)
        }
      }
      i += 8 + len.toInt + (len.toInt & 1)
    }
    if (out.isEmpty) None else Some(out.toArray)
  }

  /** Decode ONE 8-bit uncompressed-DIB frame at a movi data offset
    * (from [[aviFrameOffsets]]) into row-major top-down luminance.
    * DIB rows are stored bottom-up with 4-byte-aligned stride; the
    * grayscale palette maps index i → gray i, so the byte IS the
    * luminance. */
  def aviFrameLuma(bytes: Array[Byte], w: Int, h: Int,
      dataOff: Int): Option[Array[Int]] = {
    if (w <= 0 || h <= 0) return None
    val stride = (w + 3) & ~3
    // Long arithmetic: header-supplied w/h are untrusted, and an Int
    // stride*h wraps (e.g. h=0x40000001 → stride*h=4) past the bounds
    // guard into an out-of-bounds copy-loop throw
    if (w.toLong * h > MaxFramePixels) return None
    if (dataOff < 0 || dataOff.toLong + stride.toLong * h > bytes.length)
      return None
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val src = dataOff + (h - 1 - y) * stride // bottom-up storage
      var x = 0
      while (x < w) { out(y * w + x) = u8(bytes, src + x); x += 1 }
      y += 1
    }
    Some(out)
  }

  /** Parse any recognized container's header. */
  def probe(bytes: Array[Byte]): Option[MediaHeader] = sniff(bytes) match {
    case Some("png") => pngInfo(bytes)
    case Some("jpeg") => jpegInfo(bytes)
    case Some("wav") => wavInfo(bytes)
    case Some("avi") => aviInfo(bytes)
    case _ => None
  }

  // ------------------------------------------------------------------
  // full decode (JDK codecs)
  // ------------------------------------------------------------------

  /** Full raster decode via `javax.imageio` (JDK-bundled PNG/JPEG/GIF/
    * BMP readers). Returns None for undecodable bytes. */
  def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Throwable => None }

  /** Integer luminance (0–255) per pixel, row-major. Single-band
    * (grayscale) rasters are read as RAW samples — `getRGB` on
    * TYPE_BYTE_GRAY applies a linear-gray→sRGB colorspace conversion
    * that would destroy the lossless round trip — while multi-band
    * images use ITU-R BT.601 weights in integer arithmetic so the
    * result is platform-exact. */
  def luminance(img: BufferedImage): Array[Int] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Int](w * h)
    if (img.getRaster.getNumBands == 1) {
      img.getRaster.getSamples(0, 0, w, h, 0, out)
      return out
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        out(y * w + x) = (r * 299 + g * 587 + b * 114) / 1000
        x += 1
      }
      y += 1
    }
    out
  }

  /** PCM16 sample extraction from a WAV `data` chunk (little-endian,
    * interleaved channels, in storage order). Only uncompressed PCM16
    * (format tag 1, 16 bits) is handled — other encodings return None. */
  def wavSamples(bytes: Array[Byte]): Option[Array[Short]] = {
    if (!sniff(bytes).contains("wav")) return None
    var fmtTag = -1; var bits = -1
    var i = 12
    var out: Option[Array[Short]] = None
    while (i + 8 <= bytes.length) {
      val id = ascii(bytes, i, 4)
      val len = le32(bytes, i + 4)
      if (len < 0 || i + 8 + len > bytes.length) return None
      id match {
        case "fmt " if len >= 16 =>
          fmtTag = le16(bytes, i + 8)
          bits = le16(bytes, i + 22)
        case "data" =>
          if (fmtTag != 1 || bits != 16) return None
          val n = (len / 2).toInt
          val arr = new Array[Short](n)
          var k = 0
          while (k < n) {
            arr(k) = le16(bytes, i + 8 + 2 * k).toShort
            k += 1
          }
          out = Some(arr)
        case _ => ()
      }
      i += 8 + len.toInt + (len.toInt & 1)
    }
    out
  }

  // ------------------------------------------------------------------
  // deterministic encoders (fixture synthesis for round-trip tests)
  // ------------------------------------------------------------------

  /** Encode a grayscale image as real PNG bytes (lossless, so decode
    * recovers `pixel(x, y) & 0xff` exactly). */
  def encodePng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, pixel(x, y) & 0xff); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode an RGB image as real JPEG bytes (JDK encoder; lossy — use
    * for header/shape tests, not pixel-exact round trips). */
  def encodeJpeg(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y) & 0xffffff); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Encode interleaved PCM16 samples as a canonical 44-byte-header
    * WAV file (manual RIFF writer — bit-for-bit deterministic). */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putAscii(i: Int, s: String): Unit = {
      var k = 0; while (k < s.length) { out(i + k) = s.charAt(k).toByte; k += 1 }
    }
    def putLe16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def putLe32(i: Int, v: Long): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte; out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    putAscii(0, "RIFF"); putLe32(4, 36L + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); putLe32(16, 16L)
    putLe16(20, 1) // PCM
    putLe16(22, channels)
    putLe32(24, sampleRate.toLong)
    putLe32(28, sampleRate.toLong * channels * 2) // byte rate
    putLe16(32, channels * 2) // block align
    putLe16(34, 16) // bits per sample
    putAscii(36, "data"); putLe32(40, dataLen.toLong)
    var k = 0
    while (k < samples.length) {
      out(44 + 2 * k) = (samples(k) & 0xff).toByte
      out(44 + 2 * k + 1) = ((samples(k) >> 8) & 0xff).toByte
      k += 1
    }
    out
  }

  /** Encode grayscale frames as a real uncompressed-DIB AVI
    * (manual RIFF writer — canonical `hdrl(avih, strl(strh,strf))` +
    * `movi` layout, 8-bit frames with the 256-entry gray palette in
    * strf, bottom-up 4-byte-aligned rows, one `00db` chunk per
    * frame). Deterministic bit-for-bit; `fps` rides strh as
    * dwRate/dwScale = fps/1 so the rate survives the round trip
    * exactly (avih's dwMicroSecPerFrame is the rounded reciprocal
    * real muxers write). */
  def encodeAviDib(width: Int, height: Int, fps: Int, nFrames: Int,
      pixel: (Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && nFrames > 0,
      s"encodeAviDib needs positive dims/fps/frames: " +
        s"w=$width h=$height fps=$fps n=$nFrames")
    val stride = (width + 3) & ~3
    val frameLen = stride * height
    val strfLen = 40 + 256 * 4
    val strlLen = 4 + 8 + 56 + 8 + strfLen        // "strl" + strh + strf
    val hdrlLen = 4 + 8 + 56 + 8 + strlLen        // "hdrl" + avih + LIST strl
    val moviLen = 4 + nFrames * (8 + frameLen)    // frameLen is stride-even
    val riffLen = 4 + 8 + hdrlLen + 8 + moviLen   // "AVI " + LIST hdrl + LIST movi
    val out = new Array[Byte](8 + riffLen)
    var p = 0
    def putAscii(s: String): Unit = {
      var k = 0; while (k < s.length) { out(p + k) = s.charAt(k).toByte; k += 1 }
      p += s.length
    }
    def putLe16(v: Int): Unit = {
      out(p) = (v & 0xff).toByte; out(p + 1) = ((v >> 8) & 0xff).toByte; p += 2
    }
    def putLe32(v: Long): Unit = {
      out(p) = (v & 0xff).toByte; out(p + 1) = ((v >> 8) & 0xff).toByte
      out(p + 2) = ((v >> 16) & 0xff).toByte; out(p + 3) = ((v >> 24) & 0xff).toByte
      p += 4
    }
    putAscii("RIFF"); putLe32(riffLen.toLong); putAscii("AVI ")
    putAscii("LIST"); putLe32(hdrlLen.toLong); putAscii("hdrl")
    putAscii("avih"); putLe32(56L)
    putLe32(1000000L / fps)                  // dwMicroSecPerFrame (rounded)
    putLe32(frameLen.toLong * fps)           // dwMaxBytesPerSec
    putLe32(0L)                              // dwPaddingGranularity
    putLe32(0L)                              // dwFlags (no idx1 → AVIF_HASINDEX off)
    putLe32(nFrames.toLong)                  // dwTotalFrames
    putLe32(0L)                              // dwInitialFrames
    putLe32(1L)                              // dwStreams
    putLe32(frameLen.toLong)                 // dwSuggestedBufferSize
    putLe32(width.toLong)                    // dwWidth
    putLe32(height.toLong)                   // dwHeight
    putLe32(0L); putLe32(0L); putLe32(0L); putLe32(0L) // dwReserved[4]
    putAscii("LIST"); putLe32(strlLen.toLong); putAscii("strl")
    putAscii("strh"); putLe32(56L)
    putAscii("vids"); putAscii("DIB ")       // fccType, fccHandler
    putLe32(0L)                              // dwFlags
    putLe16(0); putLe16(0)                   // wPriority, wLanguage
    putLe32(0L)                              // dwInitialFrames
    putLe32(1L)                              // dwScale
    putLe32(fps.toLong)                      // dwRate → fps = rate/scale
    putLe32(0L)                              // dwStart
    putLe32(nFrames.toLong)                  // dwLength (frames)
    putLe32(frameLen.toLong)                 // dwSuggestedBufferSize
    putLe32(0xffffffffL)                     // dwQuality (-1 default)
    putLe32(0L)                              // dwSampleSize (0: one sample = one frame)
    putLe16(0); putLe16(0); putLe16(width); putLe16(height) // rcFrame
    putAscii("strf"); putLe32(strfLen.toLong)
    putLe32(40L)                             // biSize
    putLe32(width.toLong)                    // biWidth
    putLe32(height.toLong)                   // biHeight (positive: bottom-up)
    putLe16(1)                               // biPlanes
    putLe16(8)                               // biBitCount
    putLe32(0L)                              // biCompression = BI_RGB
    putLe32(frameLen.toLong)                 // biSizeImage
    putLe32(0L); putLe32(0L)                 // biXPelsPerMeter, biYPelsPerMeter
    putLe32(256L)                            // biClrUsed
    putLe32(0L)                              // biClrImportant
    var i = 0
    while (i < 256) { // grayscale palette: RGBQUAD (b,g,r,0)
      out(p) = i.toByte; out(p + 1) = i.toByte; out(p + 2) = i.toByte
      out(p + 3) = 0; p += 4; i += 1
    }
    putAscii("LIST"); putLe32(moviLen.toLong); putAscii("movi")
    var f = 0
    while (f < nFrames) {
      putAscii("00db"); putLe32(frameLen.toLong)
      var y = height - 1 // bottom-up rows
      while (y >= 0) {
        var x = 0
        while (x < width) { out(p + x) = (pixel(x, y, f) & 0xff).toByte; x += 1 }
        p += stride // alignment padding bytes stay zero
        y -= 1
      }
      f += 1
    }
    require(p == out.length, s"AVI writer layout drift: $p != ${out.length}")
    out
  }
}
