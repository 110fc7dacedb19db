package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata (the 100 TB training-data layout — one
  * row per asset, media bytes inline or as object-store pointers).
  *
  * Feature extraction decodes REAL formats where a zero-dep JVM can
  * ([[Codecs]]: RIFF/WAVE PCM audio, binary PNM images — sniffed by
  * magic bytes, never by the `kind` column), falling back to a
  * deterministic stride-hash signature for formats that need native
  * codecs (JPEG/MP3/H.264). Swap/extend the dispatcher in
  * [[decodeFeatures]] for a JNI/ONNX decoder without touching any
  * plumbing.
  *
  * Scala's `mapPartitions` is the JVM analog of PySpark's
  * `mapInPandas`: one iterator per partition, so per-partition codec
  * setup happens once and rows stream through without materializing
  * the partition.
  */
object Multimodal {

  final case class MediaRow(asset_id: Long, kind: String, bytes: Array[Byte],
                            width: Int, height: Int)
  final case class MediaFeatures(asset_id: Long, kind: String,
                                 features: Array[Float])
  final case class Frame(asset_id: Long, frame_no: Int, offset: Long,
                         frame_bytes: Array[Byte])
  final case class SignalWindow(asset_id: Long, win_no: Int, start: Long,
                                sum_sq: Long)

  /** Fallback signature for formats without a JVM decoder: byte
    * strides folded into a fixed-dim float vector. Deterministic in
    * the bytes, so tests and retries are stable — but it is a
    * SIGNATURE, not perception; decodable formats take the real
    * codec paths above it in [[decodeFeatures]].
    */
  private[multimodal] def strideSignature(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) {
        val b = out.length
        out(i % b) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
    }
    out
  }

  /** Codec dispatch by content sniffing: real WAV/PNM decode
    * ([[Codecs]]) with perceptual features (RMS + zero-crossing rate
    * for audio, luma thumbnail for images); stride-hash signature for
    * everything else.
    */
  private[multimodal] def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] =
    Codecs.decodeWav(bytes).map(Codecs.audioFeatures(_, dim))
      .orElse(Codecs.decodePnm(bytes).map(Codecs.imageFeatures(_, dim)))
      .getOrElse(strideSignature(bytes, dim))

  /** Feature extraction over media bytes: one codec init per
    * partition, streaming rows through. Output is a fixed-dim
    * `Array[Float]` column ready for the graft.operators.Similarity
    * path.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 32): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec setup would happen here (once, not per row)
      rows.map(r => MediaFeatures(r.asset_id, r.kind, decodeFeatures(r.bytes, dim)))
    }
  }

  /** Frame sampling: emits every `stride`-th fixed-size slice of the
    * payload (stand-in for video keyframe extraction). Generator-shaped
    * (0..n rows out per row in) — flatMap keeps it streaming.
    */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int = 256,
                   stride: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n = if (r.bytes == null) 0 else r.bytes.length / frameSize
      (0 until n by stride).map { f =>
        Frame(r.asset_id, f, f.toLong * frameSize,
          java.util.Arrays.copyOfRange(r.bytes, f * frameSize,
            (f + 1) * frameSize))
      }
    }
  }

  /** Audio-style signal windowing: overlapping `winSize`-sample
    * windows every `hop` samples (50% overlap at hop = winSize/2 —
    * the standard STFT framing), with per-window energy as the exact
    * integer sum of squared unsigned samples. Only full windows emit.
    * Like [[resize]] this is NOT a stub for raw PCM-8 buffers; for
    * encoded audio swap the byte read for a decoder. Generator-shaped
    * flatMap — streaming, no partition materialization, and the
    * window loop is row-local so the operator is embarrassingly
    * parallel at 100 TB.
    */
  def windowSignal(media: Dataset[MediaRow], winSize: Int,
                   hop: Int): Dataset[SignalWindow] = {
    require(winSize > 0 && hop > 0, s"winSize=$winSize hop=$hop")
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = if (r.bytes == null) 0 else r.bytes.length
      val nWin = if (len < winSize) 0 else (len - winSize) / hop + 1
      (0 until nWin).iterator.map { w =>
        val off = w * hop
        var s = 0L
        var j = 0
        while (j < winSize) {
          val v = (r.bytes(off + j) & 0xff).toLong
          s += v * v
          j += 1
        }
        SignalWindow(r.asset_id, w, off.toLong, s)
      }
    }
  }

  /** Nearest-neighbor resize over row-major single-channel byte
    * images (width×height == bytes.length). This one is NOT a stub —
    * for raw grayscale buffers it is the real operation; for encoded
    * formats swap the sampling loop for a decoder the same way as
    * [[decodeStub]]. Rows whose dimensions don't match their payload
    * pass through unchanged (documented as upstream corruption —
    * filter on `width * height == length(bytes)` to quarantine).
    */
  def resize(media: Dataset[MediaRow], targetW: Int,
             targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.bytes == null || r.width * r.height != r.bytes.length ||
            r.width <= 0 || r.height <= 0) r
        else {
          val out = new Array[Byte](targetW * targetH)
          var y = 0
          while (y < targetH) {
            val sy = y * r.height / targetH
            var x = 0
            while (x < targetW) {
              out(y * targetW + x) = r.bytes(sy * r.width + x * r.width / targetW)
              x += 1
            }
            y += 1
          }
          MediaRow(r.asset_id, r.kind, out, targetW, targetH)
        }
      }
    }
  }

  /** Average-hash perceptual fingerprint (aHash) of a grayscale
    * image: bit i is set iff pixel i is strictly brighter than the
    * image mean. Near-duplicate images differ in a few bits (compare
    * with hamming distance ≤ t), so image dedup becomes the same
    * banded equi-join shape as SimHash — never an all-pairs compare.
    * The mean test is kept in exact integers (`n·pᵢ > Σp`) and the
    * hash is emitted as a bit string, so it is engine-portable.
    * Rows whose bytes aren't a w×h raster pass through as null.
    */
  def aHash(media: Dataset[MediaRow]): Dataset[(Long, String)] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.bytes == null || r.width * r.height != r.bytes.length ||
            r.bytes.length == 0) (r.asset_id, null: String)
        else {
          val n = r.bytes.length
          var sum = 0L
          var i = 0
          while (i < n) { sum += (r.bytes(i) & 0xff); i += 1 }
          val sb = new java.lang.StringBuilder(n)
          i = 0
          while (i < n) {
            sb.append(if (n.toLong * (r.bytes(i) & 0xff) > sum) '1' else '0')
            i += 1
          }
          (r.asset_id, sb.toString)
        }
      }
    }
  }

  /** Byte-level metadata pass (pure column ops — no UDF): payload
    * size, magic-byte sniff, sha-style fingerprint for dedup.
    */
  def describe(media: DataFrame, bytesCol: String = "bytes"): DataFrame =
    media
      .withColumn("n_bytes", length(col(bytesCol)))
      .withColumn("magic", hex(substring(col(bytesCol), 1, 4)))
      .withColumn("content_fp", md5(col(bytesCol)))
}
