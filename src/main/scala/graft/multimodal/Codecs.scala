package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM decoders for the two self-describing formats a zero-dep
  * container can genuinely parse — RIFF/WAVE PCM audio and binary PNM
  * (P5 gray / P6 RGB) images — plus deterministic feature extractors
  * over the decoded samples. These make the multimodal path REAL end
  * to end: bytes → codec → typed samples → fixed-dim features → the
  * graft.operators.Similarity ANN path. Formats the container cannot
  * decode (JPEG/MP3/H.264 need native libs) still flow through the
  * documented stride-hash fallback in [[Multimodal.extractFeatures]].
  *
  * Everything here is row-local integer/IEEE arithmetic — map-side,
  * no state, embarrassingly parallel at 100 TB.
  */
object Codecs {

  /** Decoded PCM audio: interleaved samples, signed, channel-major
    * order as stored. */
  final case class WavAudio(channels: Int, sampleRate: Int,
                            bitsPerSample: Int, samples: Array[Int])

  /** Decoded raster reduced to integer luma (BT.601 integer weights
    * for P6; raw sample for P5). */
  final case class RasterImage(width: Int, height: Int, maxVal: Int,
                               gray: Array[Int])

  /** RIFF/WAVE parser: canonical chunked layout, PCM (format 1) at 8
    * or 16 bits. Returns None on anything that is not a well-formed
    * PCM WAV — callers treat that as "not this format", never an
    * error. 8-bit WAV is unsigned (centered at 128); 16-bit is signed
    * little-endian, per the format spec.
    */
  def decodeWav(bytes: Array[Byte]): Option[WavAudio] = {
    if (bytes == null || bytes.length < 44) return None
    def str4(off: Int) = new String(bytes, off, 4, US_ASCII)
    if (str4(0) != "RIFF" || str4(8) != "WAVE") return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = str4(pos)
      val size = bb.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      id match {
        case "fmt " if size >= 16 =>
          fmt = Some((bb.getShort(pos + 8) & 0xffff,
            bb.getShort(pos + 10) & 0xffff,
            bb.getInt(pos + 12),
            bb.getShort(pos + 22) & 0xffff))
        case "data" => data = Some((pos + 8, size))
        case _      => // skip unknown chunks (LIST, fact, ...)
      }
      pos += 8 + size + (size & 1) // chunks are 16-bit aligned
    }
    for {
      (audioFmt, ch, rate, bits) <- fmt
      (off, sz) <- data
      if audioFmt == 1 && ch >= 1 && (bits == 8 || bits == 16)
    } yield {
      val n = sz / (bits / 8)
      val samples = new Array[Int](n)
      var i = 0
      if (bits == 8) while (i < n) {
        samples(i) = (bytes(off + i) & 0xff) - 128; i += 1
      } else while (i < n) {
        samples(i) = bb.getShort(off + 2 * i).toInt; i += 1
      }
      WavAudio(ch, rate, bits, samples)
    }
  }

  /** Binary PNM parser (P5 grayscale / P6 RGB, maxval < 256): ASCII
    * header with `#` comments, single whitespace, then the raster.
    * P6 pixels reduce to integer luma (299r + 587g + 114b) / 1000 —
    * exact integer arithmetic, reproducible anywhere.
    */
  def decodePnm(bytes: Array[Byte]): Option[RasterImage] = {
    if (bytes == null || bytes.length < 2) return None
    val magic = new String(bytes, 0, 2, US_ASCII)
    if (magic != "P5" && magic != "P6") return None
    var pos = 2
    def nextInt(): Option[Int] = {
      // skip whitespace and '#'-to-newline comments
      var done = false
      while (!done && pos < bytes.length) {
        val c = bytes(pos)
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pos += 1
        else done = true
      }
      var v = -1
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = (if (v < 0) 0 else v) * 10 + (bytes(pos) - '0'); pos += 1
      }
      if (v < 0) None else Some(v)
    }
    for {
      w <- nextInt()
      h <- nextInt()
      mx <- nextInt()
      if w > 0 && h > 0 && mx > 0 && mx < 256 &&
        pos < bytes.length && {
          pos += 1 // exactly ONE whitespace byte after maxval
          val ch = if (magic == "P6") 3 else 1
          pos + w * h * ch <= bytes.length
        }
    } yield {
      val gray = new Array[Int](w * h)
      if (magic == "P5") {
        var i = 0
        while (i < gray.length) { gray(i) = bytes(pos + i) & 0xff; i += 1 }
      } else {
        var i = 0
        while (i < gray.length) {
          val r = bytes(pos + 3 * i) & 0xff
          val g = bytes(pos + 3 * i + 1) & 0xff
          val b = bytes(pos + 3 * i + 2) & 0xff
          gray(i) = (299 * r + 587 * g + 114 * b) / 1000
          i += 1
        }
      }
      RasterImage(w, h, mx, gray)
    }
  }

  /** Audio features: first half = per-bucket RMS (full-scale
    * normalized), second half = per-bucket zero-crossing rate — the
    * classic cheap timbre/pitch pair; ZCR separates frequencies that
    * identical RMS envelopes cannot.
    */
  def audioFeatures(a: WavAudio, dim: Int): Array[Float] = {
    require(dim >= 2, s"audio features need dim >= 2, got $dim")
    val out = new Array[Float](dim)
    val n = a.samples.length
    if (n == 0) return out
    val full = if (a.bitsPerSample == 8) 128.0 else 32768.0
    val half = dim / 2
    var b = 0
    while (b < half) {
      val lo = (n.toLong * b / half).toInt
      val hi = (n.toLong * (b + 1) / half).toInt
      if (hi > lo) {
        var ss = 0.0
        var zc = 0
        var i = lo
        while (i < hi) {
          val v = a.samples(i).toDouble
          ss += v * v
          if (i > lo &&
              (a.samples(i) >= 0) != (a.samples(i - 1) >= 0)) zc += 1
          i += 1
        }
        out(b) = (math.sqrt(ss / (hi - lo)) / full).toFloat
        out(half + b) = zc.toFloat / (hi - lo)
      }
      b += 1
    }
    out
  }

  /** Image features: mean luma (maxval-normalized) over `dim`
    * contiguous row-major cells — a deterministic thumbnail
    * signature. */
  def imageFeatures(img: RasterImage, dim: Int): Array[Float] = {
    require(dim >= 1)
    val out = new Array[Float](dim)
    val n = img.gray.length
    if (n == 0) return out
    var b = 0
    while (b < dim) {
      val lo = (n.toLong * b / dim).toInt
      val hi = (n.toLong * (b + 1) / dim).toInt
      if (hi > lo) {
        var s = 0L
        var i = lo
        while (i < hi) { s += img.gray(i); i += 1 }
        out(b) = (s.toDouble / (hi - lo) / img.maxVal).toFloat
      }
      b += 1
    }
    out
  }
}
