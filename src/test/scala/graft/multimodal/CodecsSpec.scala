package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Codecs._
import graft.multimodal.Multimodal._

/** Real encoded bytes through the real decoders: WAV clips and PNM
  * images are synthesized in canonical binary form, decoded by the
  * zero-dep parsers, and composed end-to-end into the ANN similarity
  * path — the full multimodal story with no stand-in on the decode
  * step.
  */
class CodecsSpec extends SparkSpec {
  import spark.implicits._

  /** Canonical 44-byte-header mono PCM-16 WAV of a sine tone. */
  private def wavBytes(freq: Double, rate: Int, n: Int,
                       amp: Double): Array[Byte] = {
    val out = ByteBuffer.allocate(44 + n * 2).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(US_ASCII)).putInt(36 + n * 2)
      .put("WAVE".getBytes(US_ASCII))
    out.put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
    out.put("data".getBytes(US_ASCII)).putInt(n * 2)
    (0 until n).foreach { i =>
      out.putShort((amp * 32767 *
        math.sin(2 * math.Pi * freq * i / rate)).toShort)
    }
    out.array()
  }

  /** Binary P6 PPM with a header comment. */
  private def ppmBytes(w: Int, h: Int)(rgb: Int => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n# synthesized fixture\n$w $h\n255\n".getBytes(US_ASCII)
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    (0 until w * h).foreach { i =>
      val (r, g, b) = rgb(i)
      out(header.length + 3 * i) = r.toByte
      out(header.length + 3 * i + 1) = g.toByte
      out(header.length + 3 * i + 2) = b.toByte
    }
    out
  }

  test("decodeWav parses a canonical PCM-16 WAV exactly") {
    val n = 4000
    val a = decodeWav(wavBytes(440, 8000, n, 0.8)).get
    assert(a.channels === 1 && a.sampleRate === 8000 &&
      a.bitsPerSample === 16 && a.samples.length === n)
    val want = (0 until n).map(i =>
      (0.8 * 32767 * math.sin(2 * math.Pi * 440 * i / 8000)).toShort.toInt)
    assert(a.samples.toSeq === want)
  }

  test("decodeWav skips unknown chunks and rejects non-WAV payloads") {
    // insert a LIST chunk between fmt and data
    val base = wavBytes(440, 8000, 100, 0.5)
    val listChunk = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes(US_ASCII)).putInt(4)
      .put("INFO".getBytes(US_ASCII)).array()
    val withList = base.take(36) ++ listChunk ++ base.drop(36)
    // patch the RIFF size field
    ByteBuffer.wrap(withList).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, withList.length - 8)
    assert(decodeWav(withList).get.samples.length === 100)

    assert(decodeWav(null).isEmpty)
    assert(decodeWav(Array.fill[Byte](100)(7)).isEmpty)
    assert(decodeWav(base.take(50)).isEmpty) // truncated data chunk
  }

  test("decodePnm parses P6 with comments via exact integer luma, " +
       "and P5 raw") {
    val img = decodePnm(ppmBytes(4, 2)(i => (i * 10, i * 20, i * 5))).get
    assert(img.width === 4 && img.height === 2 && img.maxVal === 255)
    val want = (0 until 8).map(i =>
      (299 * i * 10 + 587 * i * 20 + 114 * i * 5) / 1000)
    assert(img.gray.toSeq === want)

    val p5 = ("P5\n3 1\n255\n".getBytes(US_ASCII) ++
      Array[Byte](0, 100, -56)) // -56 = 200 unsigned
    assert(decodePnm(p5).get.gray.toSeq === Seq(0, 100, 200))

    assert(decodePnm("P6\n4 4\n255\n".getBytes(US_ASCII)).isEmpty) // no raster
    assert(decodePnm(Array[Byte]('P', '4')).isEmpty) // bitmap unsupported
  }

  test("zero-crossing features separate pitches that share an RMS " +
       "envelope") {
    val lo = audioFeatures(decodeWav(wavBytes(440, 8000, 8000, 0.8)).get, 16)
    val hi = audioFeatures(decodeWav(wavBytes(1760, 8000, 8000, 0.8)).get, 16)
    // same RMS half (same amplitude)…
    (0 until 8).foreach(i => assert(math.abs(lo(i) - hi(i)) < 0.01))
    // …but ~4x the zero crossings in the ZCR half
    (8 until 16).foreach { i =>
      assert(hi(i) > 3.0f * lo(i), s"slot $i: lo=${lo(i)} hi=${hi(i)}")
    }
  }

  test("extractFeatures sniffs real formats by magic, not by the kind " +
       "column, and matches the direct codec output") {
    val wav = wavBytes(440, 8000, 2000, 0.7)
    val ppm = ppmBytes(8, 8)(i => (i * 3, 255 - i * 3, 128))
    val junk = Array.tabulate[Byte](500)(i => (i * 37 % 251).toByte)
    val media = spark.createDataset(Seq(
      MediaRow(1L, "mislabeled-as-image", wav, 0, 0),
      MediaRow(2L, "mislabeled-as-audio", ppm, 8, 8),
      MediaRow(3L, "unknown", junk, 0, 0)))
    val got = extractFeatures(media, dim = 16).collect()
      .map(f => f.asset_id -> f.features).toMap
    assert(got(1L).toSeq ===
      Codecs.audioFeatures(decodeWav(wav).get, 16).toSeq)
    assert(got(2L).toSeq ===
      Codecs.imageFeatures(decodePnm(ppm).get, 16).toSeq)
    assert(got(3L).toSeq === strideSignature(junk, 16).toSeq)
  }

  test("real encoded media composes into the ANN path: same pitch is " +
       "nearest, different pitch is not") {
    val media = spark.createDataset(Seq(
      MediaRow(0L, "audio", wavBytes(440, 8000, 8000, 0.5), 0, 0),
      MediaRow(1L, "audio", wavBytes(440, 8000, 8000, 0.6), 0, 0),
      MediaRow(2L, "audio", wavBytes(1760, 8000, 8000, 0.7), 0, 0),
      MediaRow(3L, "audio", wavBytes(880, 8000, 8000, 0.7), 0, 0)))
    val feats = extractFeatures(media, dim = 16).toDF()
      .select($"asset_id".as("vec_id"), $"features".as("embedding"),
        lit(0).as("label"))
    val prepped = graft.operators.Similarity.prep(
      feats, "vec_id", "embedding", None)
    val nearest = graft.operators.Similarity
      .cosineTopK(prepped.where($"id" === 0), prepped, 1)
      .select("vec_id").as[Long].head()
    assert(nearest === 1L,
      "the other 440Hz clip must be the nearest neighbor")
  }
}
