package graft.multimodal

import org.apache.spark.sql.functions.lit

import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(n: Int) = spark.createDataset(
    (0 until n).map { i =>
      MediaRow(i.toLong, if (i % 2 == 0) "image" else "audio",
        Array.tabulate(1024 + i)(j => ((i * 31 + j) % 251).toByte), 64, 64)
    })

  test("extractFeatures: fixed-dim, deterministic, one row per asset") {
    val m = media(10)
    val a = extractFeatures(m, dim = 32).collect().sortBy(_.asset_id)
    val b = extractFeatures(m, dim = 32).collect().sortBy(_.asset_id)
    assert(a.length === 10)
    assert(a.forall(_.features.length === 32))
    assert(a.zip(b).forall { case (x, y) => x.features.sameElements(y.features) })
    assert(a.exists(_.features.exists(_ != 0f)))
  }

  test("sampleFrames: strided fixed-size slices with correct offsets") {
    val one = spark.createDataset(Seq(
      MediaRow(1L, "video", Array.tabulate(2048)(_.toByte), 0, 0)))
    val frames = sampleFrames(one, frameSize = 256, stride = 4)
      .collect().sortBy(_.frame_no)
    assert(frames.map(f => (f.frame_no, f.offset)).toSeq ===
      Seq((0, 0L), (4, 1024L)))
    assert(frames.forall(_.frame_bytes.length === 256))
  }

  test("resize: nearest-neighbor over row-major grayscale bytes") {
    val img = spark.createDataset(Seq(
      // 4x4 image with distinct corner values
      MediaRow(1L, "image",
        Array.tabulate(16)(i => (i * 10).toByte), 4, 4)))
    val out = resize(img, 2, 2).collect().head
    assert(out.width === 2 && out.height === 2 && out.bytes.length === 4)
    // nearest-neighbor picks (0,0) (0,2) (2,0) (2,2) => 0, 20, 80, 100
    assert(out.bytes.toSeq === Seq(0, 20, 80, 100).map(_.toByte))
    // mismatched dims pass through untouched
    val bad = spark.createDataset(Seq(
      MediaRow(2L, "image", Array.tabulate(10)(_.toByte), 4, 4)))
    assert(resize(bad, 2, 2).collect().head.bytes.length === 10)
  }

  test("media features flow end-to-end into the ANN similarity path") {
    val m = media(12)
    // scale raw features to unit range before the quantized-cosine
    // path (exactly what a real pipeline does pre-similarity)
    val feats = extractFeatures(m, dim = 16).toDF()
      .select($"asset_id".as("vec_id"),
        org.apache.spark.sql.functions.transform($"features",
          x => x / lit(256.0f)).as("embedding"),
        lit(0).as("label"))
    val prepped = graft.operators.Similarity.prep(
      feats, "vec_id", "embedding", None)
    val top = graft.operators.Similarity.cosineTopK(
      prepped.filter($"id" < 2), prepped, 3).collect()
    assert(top.length === 2 * 3)
    assert(top.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("vec_id")))
  }

  test("aHash: brighter-than-mean bits, flat image all zeros, " +
       "near-dup differs in few bits, bad raster -> null") {
    val flat = MediaRow(1L, "img", Array.fill(16)(100.toByte), 4, 4)
    val grad = MediaRow(2L, "img", Array.tabulate(16)(_.toByte), 4, 4)
    val near = MediaRow(3L, "img",
      Array.tabulate(16)(i => (if (i == 0) 1 else i).toByte), 4, 4)
    val bad = MediaRow(4L, "img", Array.fill(7)(1.toByte), 4, 4)
    val h = aHash(spark.createDataset(Seq(flat, grad, near, bad)))
      .collect().toMap
    // strictly-greater test: a constant image has NO bit set
    assert(h(1L) === "0" * 16)
    // gradient: exactly the pixels above the mean are set
    assert(h(2L) === Array.tabulate(16)(i => if (16 * i > 120) '1' else '0')
      .mkString)
    // 1-pixel edit flips at most 1 bit (means differ negligibly)
    assert(h(2L).zip(h(3L)).count { case (a, b) => a != b } <= 1)
    assert(h(4L) === null)
  }

  test("describe: byte-level metadata via pure column ops") {
    val df = describe(media(3).toDF())
    val r = df.filter($"asset_id" === 0)
      .select("n_bytes", "content_fp").as[(Int, String)].head()
    assert(r._1 === 1024)
    assert(r._2.length === 32)
  }
}
