package graft.multimodal

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

  test("describe: byte-level metadata via pure column ops") {
    val df = describe(media(3).toDF())
    val r = df.filter($"asset_id" === 0)
      .select("n_bytes", "content_fp").as[(Int, String)].head()
    assert(r._1 === 1024)
    assert(r._2.length === 32)
  }
}
