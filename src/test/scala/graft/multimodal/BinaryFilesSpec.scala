package graft.multimodal

import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** M5: distributed media ingest over a DIRECTORY of image files via
  * Spark's `binaryFile` source — the missing front door to the
  * multimodal pipeline (media_* queries start from an already-staged
  * bytes column; real corpora start as object-store files). Verifies
  * the source's schema contract, glob pruning of non-media files, and
  * that the per-file bytes decode through the real Codecs PNM parser
  * with executor-side (mapPartitions) decoding — no driver loop.
  */
class BinaryFilesSpec extends SparkSpec {

  private def pgm(w: Int, h: Int, seed: Int): Array[Byte] = {
    val header = s"P5\n$w $h\n255\n".getBytes(US_ASCII)
    val px = Array.tabulate(w * h)(i => ((i * 7 + seed * 13) % 256).toByte)
    header ++ px
  }

  private def withMediaDir(body: Path => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-media-")
    try body(dir)
    finally {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  test("a directory of PGM files ingests via binaryFile, glob-prunes " +
       "junk, and decodes executor-side through Codecs") {
    withMediaDir { dir =>
      val n = 12
      (0 until n).foreach { i =>
        Files.write(dir.resolve(f"img_$i%03d.pgm"), pgm(8, 6, i))
      }
      Files.write(dir.resolve("README.txt"),
        "not an image".getBytes(US_ASCII))

      val df = spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pgm")
        .load(dir.toString)

      // schema contract of the source
      assert(df.columns.toSet ===
        Set("path", "modificationTime", "length", "content"))
      assert(df.count() === n, "glob filter must exclude the txt decoy")

      // executor-side decode: bytes -> RasterImage -> per-file stats
      import spark.implicits._
      val decoded = df
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])]
        .mapPartitions(_.map { case (path, bytes) =>
          val img = Codecs.decodePnm(bytes).getOrElse(
            sys.error(s"undecodable: $path"))
          val name = path.split('/').last
          (name, img.width, img.height, img.gray.map(_.toLong).sum)
        })
        .collect()
        .sortBy(_._1)

      assert(decoded.length === n)
      decoded.zipWithIndex.foreach { case ((name, w, h, pxSum), i) =>
        assert(name === f"img_$i%03d.pgm")
        assert(w === 8 && h === 6)
        val want = (0 until 48).map(j => (j * 7 + i * 13) % 256).sum.toLong
        assert(pxSum === want, s"pixel checksum drift in $name")
      }
    }
  }

  test("length-based pushdown prunes oversized assets at the scan") {
    withMediaDir { dir =>
      (0 until 3).foreach { i =>
        Files.write(dir.resolve(s"small_$i.pgm"), pgm(4, 4, i))
      }
      Files.write(dir.resolve("huge.pgm"), pgm(64, 64, 9))
      val small = spark.read.format("binaryFile")
        .load(dir.toString)
        .where(col("length") < 1000)
      // binaryFile supports length/mtime filter pushdown: the huge
      // asset's CONTENT is never materialized, which is what makes
      // "skip the 4 GB video" free at scan time on a real corpus
      assert(small.count() === 3)
      val plan = small.queryExecution.executedPlan.toString
      assert(plan.contains("LessThan(length,1000)") ||
             plan.contains("length"), s"length filter must reach the scan:\n$plan")
    }
  }
}
